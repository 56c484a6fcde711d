"""bench.py kill-robustness (VERDICT r4 #1).

Rounds 3 and 4 both recorded nothing in the driver's BENCH_r*.json: an
external SIGKILL (the driver's timeout) leaves no exception path, so
bench.py must have a parseable JSON line on stdout from second zero and
must exit 0 on its own global budget. These tests drive bench.py as a real
subprocess the way the driver does.
"""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")

FAKE_LASTGOOD = {
    "metric": "cholesky_n65536_float32_high_tflops",
    "value": 56.4, "unit": "TFLOP/s", "vs_baseline": 1.266,
    "device": "TPU v5 lite",
}


def _env(tmp_path, **extra):
    lg = tmp_path / "lastgood.json"
    lg.write_text(json.dumps(FAKE_LASTGOOD))
    env = dict(os.environ)
    env.update({
        "NPW_BENCH_LASTGOOD": str(lg),
        "NPW_BENCH_FORCE_CPU": "1",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })
    env.update(extra)
    return env


def _read_json_lines(text):
    out = []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            out.append(json.loads(line))
    return out


def test_sigkill_leaves_parseable_line(tmp_path):
    """SIGKILL bench.py the moment it starts (before any measurement): the
    provisional last-good line must already be flushed and parseable —
    exactly the r4 failure mode (driver timeout, parsed: null)."""
    p = subprocess.Popen(
        [sys.executable, BENCH, "--alg", "cholesky", "--n", "1024"],
        env=_env(tmp_path), cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    try:
        # wait for the provisional line (flushed before jax import), then
        # kill hard — no cleanup, no exception path, like the driver
        deadline = time.time() + 60
        first = None
        while time.time() < deadline:
            line = p.stdout.readline()
            if line.strip().startswith("{"):
                first = line
                break
        assert first is not None, "no JSON line before deadline"
        os.kill(p.pid, signal.SIGKILL)
        rest = p.stdout.read()
    finally:
        if p.poll() is None:
            p.kill()
        p.wait()
    recs = _read_json_lines(first + rest)
    assert recs, "nothing parseable on stdout after SIGKILL"
    prov = recs[0]
    assert prov["stale"] is True and prov["provisional"] is True
    assert prov["value"] == 56.4
    assert prov["metric"].startswith("cholesky_")


def test_budget_exhaustion_exits_zero(tmp_path):
    """With a tiny global budget the watchdog must exit 0 with the
    last-good line on stdout instead of running to the driver's knife."""
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, BENCH, "--alg", "cholesky", "--n", "4096"],
        env=_env(tmp_path, NPW_BENCH_BUDGET_S="3"), cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        timeout=240,
    )
    took = time.time() - t0
    assert p.returncode == 0, p.stdout[-2000:]
    recs = _read_json_lines(p.stdout)
    assert recs, "no JSON line on budget exhaustion"
    last = recs[-1]
    assert last["value"] == 56.4 and last.get("stale") is True
    # must not have run the full n=4096 CPU cholesky (minutes): the
    # watchdog wakes within ~30s of the budget
    assert took < 180, f"watchdog did not bound the run ({took:.0f}s)"


def test_full_run_supersedes_provisional(tmp_path):
    """A healthy run prints provisional first, then the real measurement —
    the driver takes the last line, so the real one wins."""
    p = subprocess.run(
        [sys.executable, BENCH, "--alg", "gemm", "--n", "256",
         "--tile", "64"],
        env=_env(tmp_path), cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        timeout=300,
    )
    assert p.returncode == 0, p.stdout[-2000:]
    recs = _read_json_lines(p.stdout)
    # gemm has no gemm_* lastgood in the fake file -> no provisional line
    assert len(recs) == 1
    real = recs[-1]
    assert real["metric"].startswith("gemm_n256")
    assert "stale" not in real and real["value"] > 0
