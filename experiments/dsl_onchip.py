"""Round-5 on-chip measurement: the GENERIC DSL executor at flagship size
(VERDICT r4 #7 — the executor stack above the fused paths had no measured
on-chip number; upstream job_runner.py is the reference's *production*
path, not a test harness).

One process (remote compile cache is per-process), JSONL flushed per
stage:

  peak         matmul speed-of-light (session denominator)
  fused        bench.bench_cholesky_trapezoid at --n (same-session fused
               number the DSL gap is measured against)
  dsl_cholesky DSL-compiled cholesky program (frontend/parser ->
               ScheduledDAG -> JaxTaskExecutor, lookahead policy, ONE jit
               for the whole schedule) at --n/--tile: cold (trace+compile)
               + warm walls, TF, device-side residual vs A
  dsl_gemm     DSL gemm program at --gemm-n: warm TF vs peak

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python experiments/dsl_onchip.py \
      [--n 16384] [--tile 1024] [--gemm-n 8192] [--only STAGE ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "results", "dsl_onchip_r05.jsonl")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


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


def _device_spd(n, seed=0):
    """SPD operand built entirely on device (never crosses the tunnel):
    A = G G^T / n + 2I, G ~ N(0,1)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def build():
        g = jax.random.normal(jax.random.PRNGKey(seed), (n, n), jnp.float32)
        a = jnp.matmul(g, g.T, precision=jax.lax.Precision.HIGH) / n
        return a + 2.0 * jnp.eye(n, dtype=jnp.float32)

    a = build()
    fetch_scalar(a[0, 0])
    return a


def _wrap_hbm(arr, key, tile):
    from numpywren_tpu.tiled import TiledMatrix

    m = TiledMatrix(key=key, shape=tuple(arr.shape), tile=(tile, tile),
                    dtype="float32", storage="hbm")
    m.replace_array(arr)
    return m


def stage_peak():
    import bench
    import jax

    peak = bench.measure_matmul_peak(jax.numpy.float32,
                                     jax.lax.Precision.HIGH)
    log_result("peak", tflops=round(peak, 1))
    return peak


def stage_fused(n, tile, peak):
    import bench
    import jax
    import numpy as np

    tf, per, extra = bench.bench_cholesky_trapezoid(
        n, tile, np.float32, jax.lax.Precision.HIGH, 3)
    log_result("fused", n=n, tile=tile, tflops=round(tf, 1),
               per_s=round(per, 3),
               frac_peak=round(tf / peak, 3) if peak else None,
               residual=extra.get("residual_fro",
                                  extra.get("residual_fro_sampled_cols")))
    return tf


def stage_dsl_cholesky(n, tile, peak, fused_tf, warm_reps=2):
    import jax
    import jax.numpy as jnp

    from numpywren_tpu import alg_wrappers
    from numpywren_tpu.runtime.executor import PS, JaxTaskExecutor

    a = _device_spd(n)
    x_t = _wrap_hbm(a, "dslchol_X", tile)
    t0 = time.perf_counter()
    prog, l_mat, meta = alg_wrappers.cholesky(x_t, tile=(tile, tile),
                                              storage="hbm")
    build_s = time.perf_counter() - t0
    g = meta["grid"]
    n_nodes = len(prog.dag.nodes)

    ex = JaxTaskExecutor(prog, schedule_policy="lookahead", donate=False)
    t0 = time.perf_counter()
    assert ex.run() == PS.SUCCESS
    fetch_scalar(l_mat.array[0, 0])
    cold_s = time.perf_counter() - t0

    # residual from the COLD run's L (warm reps overwrite S with garbage)
    hp = jax.lax.Precision.HIGHEST

    @jax.jit
    def resid(a, l):
        l = jnp.tril(l)
        d = a - jnp.matmul(l, l.T, precision=hp)
        return jnp.linalg.norm(d), jnp.linalg.norm(a)

    num, den = resid(a, l_mat.array)
    residual = fetch_scalar(num) / fetch_scalar(den)

    walls = []
    for _ in range(warm_reps):
        t0 = time.perf_counter()
        assert ex.run() == PS.SUCCESS
        fetch_scalar(l_mat.array[0, 0])
        walls.append(time.perf_counter() - t0)
    warm = min(walls)
    flops = n ** 3 / 3
    tf = flops / warm / 1e12
    log_result("dsl_cholesky", n=n, tile=tile, grid=g, nodes=n_nodes,
               build_s=round(build_s, 2), cold_s=round(cold_s, 1),
               warm_s=round(warm, 3), tflops=round(tf, 1),
               frac_peak=round(tf / peak, 3) if peak else None,
               vs_fused=round(tf / fused_tf, 3) if fused_tf else None,
               residual=residual)


def stage_dsl_gemm(n, tile, peak, warm_reps=2):
    import jax

    from numpywren_tpu import alg_wrappers
    from numpywren_tpu.runtime.executor import PS, JaxTaskExecutor

    key = jax.random.PRNGKey(1)
    a = jax.jit(lambda: jax.random.normal(key, (n, n), "float32"))()
    b = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(2), (n, n), "float32"))()
    fetch_scalar(a[0, 0])
    a_t = _wrap_hbm(a, "dslgemm_A", tile)
    b_t = _wrap_hbm(b, "dslgemm_B", tile)
    prog, c_mat, meta = alg_wrappers.gemm(a_t, b_t, tile=(tile, tile),
                                          storage="hbm")
    n_nodes = len(prog.dag.nodes)
    ex = JaxTaskExecutor(prog, schedule_policy="lookahead", donate=False)
    t0 = time.perf_counter()
    assert ex.run() == PS.SUCCESS
    fetch_scalar(c_mat.array[0, 0])
    cold_s = time.perf_counter() - t0
    walls = []
    for _ in range(warm_reps):
        t0 = time.perf_counter()
        assert ex.run() == PS.SUCCESS
        fetch_scalar(c_mat.array[0, 0])
        walls.append(time.perf_counter() - t0)
    warm = min(walls)
    tf = 2 * n ** 3 / warm / 1e12
    log_result("dsl_gemm", n=n, tile=tile, nodes=n_nodes,
               cold_s=round(cold_s, 1), warm_s=round(warm, 3),
               tflops=round(tf, 1),
               frac_peak=round(tf / peak, 3) if peak else None)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--tile", type=int, default=1024)
    p.add_argument("--gemm-n", type=int, default=8192)
    p.add_argument("--only", nargs="*", default=None)
    p.add_argument("--cpu", action="store_true",
                   help="CPU smoke test (config update beats backend init; "
                        "the JAX_PLATFORMS env var is too late here)")
    args = p.parse_args()
    stages = args.only or ["peak", "fused", "dsl_cholesky", "dsl_gemm"]

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    dev = jax.devices()[0]
    log_result("session", device=str(dev.device_kind),
               platform=dev.platform, n=args.n, tile=args.tile)

    peak = fused_tf = None
    t0 = time.time()
    if "peak" in stages:
        peak = stage_peak()
        log_result("peak_done", stage_s=round(time.time() - t0, 1))
    for st in stages:
        t0 = time.time()
        if st == "fused":
            fused_tf = stage_fused(args.n, args.tile, peak)
        elif st == "dsl_cholesky":
            stage_dsl_cholesky(args.n, args.tile, peak, fused_tf)
        elif st == "dsl_gemm":
            stage_dsl_gemm(args.gemm_n, args.tile, peak)
        elif st == "peak":
            continue
        else:
            raise SystemExit(f"unknown stage {st}")
        log_result(f"{st}_done", stage_s=round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
