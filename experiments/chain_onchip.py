"""Round-5 on-chip A/B for the one-launch Pallas CholeskyQR2 chain
(VERDICT r4 #5: "build the one untried lever — a single Mosaic/Pallas
kernel executing the whole panel factor chain (potrf + small-inv + apply
in one launch)"). Stages:

  peak   matmul speed-of-light (session denominator)
  micro  per-panel latency of the pass-1-2 fold path (Gram + factor +
         inverse + analytic pass 2 + folded apply), XLA custom calls vs
         the Pallas chain kernel, slope-timed inside one jit
         (_cholqr_adaptive max_passes=2 under NPW_PALLAS_CHAIN=0/1)
  e2e    fused bdfac 8192/512 wall + TF under both flags (the bar VERDICT
         r4 #5 names: >= 60% of same-session peak, floor analysis says
         ~51% is the custom-call sequential-depth floor)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/chain_onchip.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "results", "chain_onchip_r05.jsonl")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def log_result(stage, **kv):
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    rec = {"stage": stage, "t": time.time(), **kv}
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def stage_micro(m, b, reps=(2, 12)):
    import bench
    import jax
    import jax.numpy as jnp
    from jax import lax

    import numpywren_tpu.compiler.lower as L

    p0 = jax.jit(lambda: 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (m, b), jnp.float32))()
    bench.fetch_scalar(p0[0, 0])

    out = {}
    for flag in ("0", "1"):
        os.environ["NPW_PALLAS_CHAIN"] = flag

        @jax.jit
        def unit_k(p, k):
            def body(_, q):
                return L._cholqr_adaptive(q, lax.Precision.HIGH,
                                          max_passes=2)[0]
            return lax.fori_loop(0, k, body, p)

        def chain(k):
            bench.fetch_scalar(unit_k(p0, k)[0, 0])

        chain(1)  # compile both trip counts' shared jit
        per = bench.slope_time(chain, *reps)
        out[flag] = per
        log_result("micro", m=m, b=b, pallas_chain=flag,
                   per_panel_ms=round(per * 1e3, 3))
    log_result("micro_ratio", m=m, b=b,
               pallas_over_xla=round(out["1"] / out["0"], 3))
    return out


def stage_e2e(n, tile, peak):
    import bench
    import jax
    import numpy as np

    out = {}
    for flag in ("0", "1"):
        os.environ["NPW_PALLAS_CHAIN"] = flag
        tf, per, _ = bench.bench_bdfac(n, tile, np.float32,
                                       jax.lax.Precision.HIGH, 3)
        out[flag] = tf
        log_result("e2e_bdfac", n=n, tile=tile, pallas_chain=flag,
                   tflops=round(tf, 1), per_s=round(per, 4),
                   frac_peak=round(tf / peak, 3) if peak else None)
    log_result("e2e_ratio", n=n, tile=tile,
               pallas_over_xla=round(out["1"] / out["0"], 3))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=8192)
    p.add_argument("--b", type=int, default=512)
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--tile", type=int, default=512)
    p.add_argument("--only", nargs="*", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    stages = args.only or ["peak", "micro", "e2e"]

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    dev = jax.devices()[0]
    log_result("session", device=str(dev.device_kind), platform=dev.platform)

    peak = None
    for st in stages:
        t0 = time.time()
        if st == "peak":
            import bench

            peak = bench.measure_matmul_peak(jax.numpy.float32,
                                             jax.lax.Precision.HIGH)
            log_result("peak", tflops=round(peak, 1))
        elif st == "micro":
            stage_micro(args.m, args.b)
        elif st == "e2e":
            stage_e2e(args.n, args.tile, peak)
        else:
            raise SystemExit(f"unknown stage {st}")
        log_result(f"{st}_done", stage_s=round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
