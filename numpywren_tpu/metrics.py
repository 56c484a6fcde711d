"""Metrics / tracing (SURVEY §5): the rebuild's analog of the reference's
per-instruction flop/byte/time counters kept in Redis
(numpywren/lambdapack.py RemoteInstruction counters, job_runner aggregation).

Per-node counters live on TiledProgram.profile; this module turns them into
the structured per-step log lines the SURVEY prescribes (step, kernel mix,
achieved TFLOP/s) and provides a wall-clock + flop meter for fused runs
(which execute as ONE device program and have no per-node timings)."""

from __future__ import annotations

import json
import logging
import time
from typing import Dict, List, Optional

logger = logging.getLogger("numpywren_tpu")


def level_report(program) -> List[Dict]:
    """One structured record per wavefront level from node profiles."""
    out = []
    for lv, nodes in enumerate(program.levels):
        ops: Dict[str, int] = {}
        flops = 0
        starts, ends = [], []
        for nid in nodes:
            n = program.node(nid)
            ops[n.op] = ops.get(n.op, 0) + 1
            p = program.profile[nid]
            flops += p.get("flops", 0)
            if "start" in p:
                starts.append(p["start"])
            if "end" in p:
                ends.append(p["end"])
        rec = {"level": lv, "nodes": len(nodes), "ops": ops, "flops": flops}
        if starts and ends:
            wall = max(ends) - min(starts)
            rec["wall_s"] = wall
            rec["tflops_per_s"] = flops / max(wall, 1e-9) / 1e12
        out.append(rec)
    return out


def log_program(program, logger_=None):
    lg = logger_ or logger
    for rec in level_report(program):
        lg.info("npw-step %s", json.dumps(rec))


import contextlib


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace around a region (SURVEY §5: the rebuild's external
    tracer; the reference had only its Redis counters). No-op when no
    log_dir is given or the profiler is unavailable."""
    if not log_dir:
        yield
        return
    import jax

    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception:
        logger.warning("jax.profiler.trace unavailable; running untraced")
        yield


class FlopMeter:
    """Wall-clock + known-flops meter for fused single-program runs.

    with FlopMeter(flops=n**3/3, label="cholesky") as m: ...
    m.tflops after the block (logged at INFO)."""

    def __init__(self, flops: float, label: str = "", logger_=None):
        self.flops = flops
        self.label = label
        self.logger = logger_ or logger
        self.wall_s: Optional[float] = None
        self.tflops: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.wall_s = time.perf_counter() - self._t0
        self.tflops = self.flops / self.wall_s / 1e12
        self.logger.info(
            "npw-meter %s",
            json.dumps({"label": self.label, "wall_s": self.wall_s,
                        "flops": self.flops, "tflops_per_s": self.tflops}),
        )
        return False
