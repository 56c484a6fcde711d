"""Round-4 on-chip measurement session: every TPU-gated item in ONE
process (the remote compile cache is per-process — TODO.md env facts), with
a JSON results log flushed after every stage so a tunnel flap mid-session
loses nothing.

Stages (each skippable via --skip, resumable via the log):
  peak        measured matmul speed-of-light (the session's denominator)
  d2h         tunnel D2H/H2D bandwidth (gates the out-of-core N choice)
  bdfac       bdfac 8192/512 baseline (the VERDICT #1 bar: >= 0.60 x peak)
  band        band_reduce timing at n=8192 d=1024/512 (SVD stage 1.5)
  qdwh        qdwh-svd sigma+vectors timing at 2048/4096(/8192 if fast)
  sigma_e2e   singular_values(n=8192) end-to-end wall (the <1 min target)
  numerics    the bench.py numerics gate (kappa ladder + bdfac rungs)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/onchip_r04.py
       [--only STAGE ...] [--fast]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "results", "onchip_r04.jsonl")


def log_result(stage, **kv):
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    rec = {"stage": stage, "t": time.time(), **kv}
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def fetch_scalar(x):
    import jax.numpy as jnp
    import numpy as np

    return float(np.asarray(x.astype(jnp.float32)))


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def stage_peak(fast):
    import bench
    import jax

    peak = bench.measure_matmul_peak(jax.numpy.float32, jax.lax.Precision.HIGH)
    log_result("peak", tflops=round(peak, 1))
    return peak


def stage_d2h(fast):
    import jax
    import jax.numpy as jnp
    import numpy as np

    x = jnp.ones((2048, 2048), jnp.float32)  # 16 MB
    fetch_scalar(x[0, 0])
    t0 = time.perf_counter()
    h = np.asarray(x)
    d2h = x.nbytes / (time.perf_counter() - t0) / 1e6
    t0 = time.perf_counter()
    y = jax.device_put(h)
    fetch_scalar(y[0, 0])
    h2d = x.nbytes / (time.perf_counter() - t0) / 1e6
    log_result("d2h", d2h_mb_s=round(d2h, 1), h2d_mb_s=round(h2d, 1))
    return d2h


def stage_bdfac(fast):
    import bench
    import jax
    import jax.numpy as jnp

    n = 4096 if fast else 8192
    tflops, per, extra = bench.bench_bdfac(n, 512, jnp.float32,
                                           jax.lax.Precision.HIGH, 3)
    log_result("bdfac", n=n, tile=512, tflops=round(tflops, 1),
               seconds=round(per, 4))
    return tflops


def stage_band(fast):
    import numpy as np

    from numpywren_tpu.models.band_reduce import band_reduce

    rng = np.random.default_rng(0)
    n = 4096 if fast else 8192
    for d, w in [(512, 32), (1024, 32), (1024, 64)]:
        a = np.triu(rng.standard_normal((n, n)).astype(np.float32))
        a = a - np.triu(a, d + 1)
        t0 = time.perf_counter()
        red, ku2 = band_reduce(a, ku=d, w=w)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        red, ku2 = band_reduce(a, ku=d, w=w)
        warm = time.perf_counter() - t0
        leak = max(float(np.abs(np.tril(red, -1)).max()),
                   float(np.abs(np.triu(red, ku2 + 1)).max()))
        log_result("band", n=n, d=d, w=w, ku2=ku2, cold_s=round(cold, 2),
                   warm_s=round(warm, 2), leak=leak)


def stage_qdwh(fast):
    import numpy as np

    from numpywren_tpu.models.svd import _qdwh_svd

    rng = np.random.default_rng(1)
    sizes = [1024, 2048] if fast else [2048, 4096, 8192]
    for n in sizes:
        a = rng.standard_normal((n, n)).astype(np.float32)
        for uv in (False, True):
            t0 = time.perf_counter()
            out = _qdwh_svd(a, compute_uv=uv)
            s = np.asarray(out[1] if uv else out)
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = _qdwh_svd(a, compute_uv=uv)
            s = np.asarray(out[1] if uv else out)
            warm = time.perf_counter() - t0
            s_ref = np.linalg.svd(a.astype(np.float64), compute_uv=False) \
                if n <= 4096 else None
            err = (float(np.max(np.abs(np.sort(s)[::-1] - s_ref)) / s_ref[0])
                   if s_ref is not None else None)
            log_result("qdwh", n=n, compute_uv=uv, cold_s=round(cold, 2),
                       warm_s=round(warm, 2), sigma_err=err)


def stage_sigma_e2e(fast):
    import numpy as np

    from numpywren_tpu import models

    rng = np.random.default_rng(2)
    n = 4096 if fast else 8192
    x = rng.standard_normal((n, n)).astype(np.float32)
    t0 = time.perf_counter()
    s = models.singular_values(x)  # default tile (512 + band reducer)
    wall = time.perf_counter() - t0
    ok = bool(np.isfinite(s).all()) and s[0] > 0
    log_result("sigma_e2e", n=n, wall_s=round(wall, 1), ok=ok,
               s0=float(s[0]), s_last=float(s[-1]))


def stage_numerics(fast):
    # IN-PROCESS (a bench.py subprocess would be a second TPU process —
    # the tunnel wedges under two; TODO.md env facts)
    import bench

    if fast:
        os.environ["NPW_BENCH_FAST"] = "1"
    rc = bench.bench_numerics()
    log_result("numerics", rc=rc)


STAGES = {
    "peak": stage_peak, "d2h": stage_d2h, "bdfac": stage_bdfac,
    "band": stage_band, "qdwh": stage_qdwh, "sigma_e2e": stage_sigma_e2e,
    "numerics": stage_numerics,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", nargs="*", default=None, choices=list(STAGES))
    p.add_argument("--skip", nargs="*", default=[], choices=list(STAGES))
    p.add_argument("--fast", action="store_true")
    args = p.parse_args()

    import jax

    if os.environ.get("NPW_FORCE_CPU"):
        # JAX_PLATFORMS in the env does NOT work here (sitecustomize
        # pre-imports jax with the axon plugin); the config call does
        jax.config.update("jax_platforms", "cpu")
    dev = jax.devices()[0]
    log_result("session", device=dev.device_kind, platform=dev.platform)
    todo = args.only if args.only else [s for s in STAGES if s not in args.skip]
    for name in todo:
        try:
            STAGES[name](args.fast)
        except Exception as e:  # noqa: BLE001 — keep the session going
            import traceback

            traceback.print_exc()
            log_result(name, error=f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
