"""Round-4 on-chip session B: the stages the worker crash killed in
session A (experiments/onchip_r04.py — the d=1024 band_reduce config
crashed the TPU worker process, taking qdwh/sigma_e2e/numerics with it),
plus the BDFAC panel-latency microbenchmark and ablation that VERDICT r3
item #1 needs before any fused-kernel work.

Stage order is safe-first: micro/ablate/numerics are known-good program
shapes; the big QDWH programs and the (previously crashing) band configs
run LAST so a repeat crash loses nothing.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/onchip_r04b.py
       [--only STAGE ...] [--fast]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "results", "onchip_r04b.jsonl")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def log_result(stage, **kv):
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    rec = {"stage": stage, "t": time.time(), **kv}
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def stage_peak(fast):
    import bench
    import jax

    peak = bench.measure_matmul_peak(jax.numpy.float32, jax.lax.Precision.HIGH)
    log_result("peak", tflops=round(peak, 1))
    return peak


# ---------------------------------------------------------------------------
# micro: per-op latency of the small-factor ops INSIDE one fused program
# (unrolled dependent chains — the context bdfac's panel chain sees), via
# bench.slope_time between two chain lengths so fetch/dispatch cancels.
# ---------------------------------------------------------------------------

def _chain_timer(make_step, init, k1=8, k2=40):
    import functools

    import bench
    import jax

    @functools.lru_cache(maxsize=8)
    def chain_fn(k):
        def run(x):
            for i in range(k):
                x = make_step(x, i)
            return x

        return jax.jit(run)

    def run_chain(k):
        out = chain_fn(k)(init)
        leaf = out[0] if isinstance(out, tuple) else out
        bench.fetch_scalar(leaf.ravel()[0])

    # CRITICAL: warm BOTH chain lengths before timing. chain_fn(k) is a
    # distinct jit per k, so without this slope_time's legs include the
    # remote compile of chain_fn(k1)/chain_fn(k2) — measured minutes and
    # sign-flipping noise over the tunnel (session-B micro was garbage
    # for exactly this reason).
    run_chain(k1)
    run_chain(k2)
    return bench.slope_time(run_chain, k1, k2)


def stage_micro(fast):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    hp = lax.Precision.HIGHEST
    hi = lax.Precision.HIGH
    rng = np.random.default_rng(0)
    b = 128 if fast else 512
    p = rng.standard_normal((8 * b, b)).astype(np.float32)
    g0 = (p.T @ p).astype(np.float32)
    g0 = jnp.asarray(g0 + b * np.eye(b, dtype=np.float32))
    eye = jnp.eye(b, dtype=jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((b, b)).astype(np.float32))
    res = {}
    if fast:
        _timer = functools.partial(_chain_timer, k1=2, k2=6)
    else:
        _timer = _chain_timer

    # pure VPU op: the dependency-glue baseline to subtract
    res["add512"] = _timer(lambda x, i: x + 1e-20 * (x + float(i)), g0)

    # one 512^3 GEMM (HIGH and HIGHEST)
    res["gemm512_high"] = _timer(
        lambda x, i: jnp.matmul(x, x0, precision=hi) * 1e-3, g0)
    res["gemm512_highest"] = _timer(
        lambda x, i: jnp.matmul(x, x0, precision=hp) * 1e-3, g0)

    # cholesky custom call, 512 and 128, batched 4x128
    res["chol512"] = _timer(
        lambda x, i: lax.linalg.cholesky(g0 + 1e-24 * x,
                                         symmetrize_input=True), g0)
    g128 = g0[:128, :128] + 128 * jnp.eye(128)
    res["chol128"] = _timer(
        lambda x, i: lax.linalg.cholesky(g128 + 1e-24 * x,
                                         symmetrize_input=True), g128)
    gb = jnp.stack([g128 + k * jnp.eye(128) for k in range(4)])
    res["chol128_batch4"] = _timer(
        lambda x, i: lax.linalg.cholesky(gb + 1e-24 * x,
                                         symmetrize_input=True), gb)

    # triangular solve (the linv form: eye RHS), 512 and batched 4x128
    l512 = lax.linalg.cholesky(g0, symmetrize_input=True)
    res["trisolve512_eye"] = _timer(
        lambda x, i: lax.linalg.triangular_solve(
            l512 + 1e-24 * x, eye, left_side=True, lower=True), l512)
    l128b = lax.linalg.cholesky(gb, symmetrize_input=True)
    eye128b = jnp.broadcast_to(jnp.eye(128, dtype=jnp.float32), (4, 128, 128))
    res["trisolve128_batch4"] = _timer(
        lambda x, i: lax.linalg.triangular_solve(
            l128b + 1e-24 * x, eye128b, left_side=True, lower=True), l128b)

    # the bdfac pass-1 pair (chol + trisolve) as one dependent unit
    def pass1(x, i):
        l = lax.linalg.cholesky(g0 + 1e-24 * x, symmetrize_input=True)
        return lax.linalg.triangular_solve(l, eye, left_side=True, lower=True)

    res["pass1_chol_trisolve"] = _timer(pass1, g0)

    # _small_inv_t (chol + 2 trisolves + 1 small GEMM)
    from numpywren_tpu.compiler.lower import _small_inv_t

    w1 = jnp.asarray(rng.standard_normal((b, b)).astype(np.float32) / b
                     + np.eye(b, dtype=np.float32))
    res["small_inv_t"] = _timer(
        lambda x, i: _small_inv_t(w1 + 1e-24 * x, hi), w1)

    # GEMM-only Newton inverse (candidate _small_inv_t replacement):
    # k iterations of X <- X(2I - C X) on the normal-equations C
    def newton_inv(c, iters):
        tau = jnp.sum(jnp.abs(c), axis=0).max() * jnp.sum(
            jnp.abs(c), axis=1).max()
        x = c.T / tau
        for _ in range(iters):
            x = jnp.matmul(x, 2.0 * eye - jnp.matmul(c, x, precision=hi),
                           precision=hi)
        return x

    c0 = jnp.matmul(w1.T, w1, precision=hp)
    for it in (8, 14):
        res[f"newton{it}_inv512"] = _timer(
            lambda x, i, it=it: newton_inv(c0 + 1e-24 * x, it), c0)

    # band_reduce hop ops: 64x64 complete QR (w=32 -> 2w=64)
    q64 = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))
    res["qr64_complete"] = _timer(
        lambda x, i: jnp.linalg.qr(q64 + 1e-24 * x, mode="complete")[0], q64)

    log_result("micro", **{k: round(v * 1e6, 1) for k, v in res.items()},
               unit="us_per_op")
    return res


# ---------------------------------------------------------------------------
# ablate: bdfac 8192/512 with the factor custom calls stubbed to cheap
# fakes — the measured GEMM+VPU floor, hence the true total custom-call
# cost as (baseline - floor). Wrong numerics by construction.
# ---------------------------------------------------------------------------

def stage_ablate(fast):
    import bench
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from numpywren_tpu.compiler import lower

    n = 4096 if fast else 8192
    tile = 512
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))

    def timed_bdfac(tag):
        # bench.bench_bdfac's scheme: each run factors the SAME
        # well-conditioned operand (fresh donated buffer + infinitesimal
        # serialization scalar) so the chain's data-dependent convergence
        # control flow matches a real run on every iteration
        lower._jitted_bdfac.cache_clear()
        body = lower.fused_bdfac_fn(n, tile, precision=lax.Precision.HIGH)
        freshen = jax.jit(lambda a, t: a + t)
        step = jax.jit(body, donate_argnums=(0,))

        def chain(k):
            t = jnp.zeros((), jnp.float32)
            for _ in range(k):
                bd = step(freshen(x, t))
                t = (bd[0, 0] * 1e-30).astype(jnp.float32)
                del bd
            bench.fetch_scalar(t)

        per = bench.slope_time(chain, 2, 6)
        tf = 8 * n**3 / 3 / per / 1e12
        log_result("ablate", variant=tag, n=n, seconds=round(per, 4),
                   tflops=round(tf, 1))
        return per

    base = timed_bdfac("baseline")

    # GEMM-only panel algebra (NPW_GEMM_INV: trtri by nilpotent doubling,
    # Yamamoto S by Newton-Schulz — 1 custom call/panel instead of 5).
    # Real numerics (unlike the stubs below); read at trace time.
    os.environ["NPW_GEMM_INV"] = "1"
    try:
        gemminv = timed_bdfac("gemminv")
    finally:
        os.environ.pop("NPW_GEMM_INV", None)

    # stub ONLY _small_inv_t (the Yamamoto S: chol + 2 trisolves) — its
    # share of the panel latency. -w1.T IS the exact s_inv (not S^T), so
    # numerics are wrong but shapes/conditioning match.
    real_sinv = lower._small_inv_t
    try:
        lower._small_inv_t = (
            lambda w1, precision, gemm_inv=None: -w1.T * 1.000001)
        nos = timed_bdfac("nosmallinv")

        # additionally fake the pass-1 chol+trisolve (control flow pinned
        # to the converged path by the hook) — the GEMM+VPU floor
        lower._ABLATE = frozenset({"factor"})
        floor = timed_bdfac("nofactor")
    finally:
        lower._ABLATE = frozenset()
        lower._small_inv_t = real_sinv
        lower._jitted_bdfac.cache_clear()

    log_result("ablate_summary", n=n,
               custom_call_ms=round((base - floor) * 1e3, 2),
               small_inv_share_ms=round((base - nos) * 1e3, 2),
               gemminv_delta_ms=round((base - gemminv) * 1e3, 2))


def stage_tilesweep(fast):
    """Real bdfac (sigma path, current defaults) across tile widths. The
    r3 'tile 1024 -> 44%' measurement predates the HIGH-smalls change
    (HIGHEST b x b algebra cost ~2 ms/panel at 1024); with half the
    panels, the ~15.7 ms custom-call bill (ablate stage) halves too, so
    1024 may now beat 512 and clear the >= 60%-of-peak bar."""
    import bench
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from numpywren_tpu.compiler import lower

    n = 4096 if fast else 8192
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    for tile in ([512, 1024] if fast else [512, 1024, 2048]):
        lower._jitted_bdfac.cache_clear()
        body = lower.fused_bdfac_fn(n, tile, precision=lax.Precision.HIGH)
        freshen = jax.jit(lambda a, t: a + t)
        step = jax.jit(body, donate_argnums=(0,))

        def chain(k):
            t = jnp.zeros((), jnp.float32)
            for _ in range(k):
                bd = step(freshen(x, t))
                t = (bd[0, 0] * 1e-30).astype(jnp.float32)
                del bd
            bench.fetch_scalar(t)

        per = bench.slope_time(chain, 2, 6)
        tf = 8 * n**3 / 3 / per / 1e12
        log_result("tilesweep", n=n, tile=tile, seconds=round(per, 4),
                   tflops=round(tf, 1))


def stage_numerics(fast):
    import bench

    if fast:
        os.environ["NPW_BENCH_FAST"] = "1"
    rc = bench.bench_numerics()
    log_result("numerics", rc=rc)


def stage_qdwh(fast):
    import numpy as np

    from numpywren_tpu.models.svd import _qdwh_svd

    rng = np.random.default_rng(1)
    for n in ([1024] if fast else [2048, 4096]):
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
                if n <= 2048 else None
            err = (float(np.max(np.abs(np.sort(s)[::-1] - s_ref)) / s_ref[0])
                   if s_ref is not None else None)
            log_result("qdwh", n=n, compute_uv=uv, cold_s=round(cold, 2),
                       warm_s=round(warm, 2), sigma_err=err)


def stage_qdwh8k(fast):
    import numpy as np

    from numpywren_tpu.models.svd import _qdwh_svd

    rng = np.random.default_rng(5)
    n = 8192
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
        log_result("qdwh8k", n=n, compute_uv=uv, cold_s=round(cold, 2),
                   warm_s=round(warm, 2), s0=float(np.max(s)))


def stage_band(fast):
    """band_reduce_packed timing sweep over w — tests the hypothesis that
    the 80 s chase at (8192, 512, w=32) is per-hop latency-bound (hops
    ~ n^2 (D-1)/(w D), so w=64 cuts them ~4x), and that the packed-band
    D2H (2.5 MB vs 389 MB) removes the fetch that crashed the worker."""
    import numpy as np

    from numpywren_tpu.models.band_reduce import band_reduce_packed

    rng = np.random.default_rng(7)
    configs = ([(2048, 512, 32), (2048, 512, 64)] if fast else
               [(4096, 512, 32), (4096, 512, 64), (8192, 512, 64)])
    for n, d, w in configs:
        a = np.triu(rng.standard_normal((n, n)).astype(np.float32))
        a -= np.triu(a, d + 1)
        s_ref = (np.linalg.svd(a.astype(np.float64), compute_uv=False)
                 if n <= 4096 else None)
        t0 = time.perf_counter()
        ab, ku2, m = band_reduce_packed(a, ku=d, w=w)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        ab, ku2, m = band_reduce_packed(a, ku=d, w=w)
        warm = time.perf_counter() - t0
        err = None
        if s_ref is not None:
            from numpywren_tpu.models.band import (
                band_sigma_packed, lapack_available,
            )

            if lapack_available():
                s = band_sigma_packed(ab.astype(np.float64), m, m, 0,
                                      ku2)[:n]
                err = float(np.max(np.abs(s - s_ref)) / s_ref[0])
        log_result("band", n=n, d=d, w=w, ku2=ku2,
                   cold_s=round(cold, 2), warm_s=round(warm, 2),
                   sigma_err=err)


def stage_spill(fast):
    """SpillTaskExecutor on the REAL chip: host-tier cholesky streamed
    through HBM, pipeline_width 0 (synchronous gather/compute/scatter) vs
    4 (prefetch thread), wavefront vs lookahead — the on-chip wall-clock
    evidence for VERDICT r3 #5/#6 (CPU tests prove order + overlap via
    gated events; only the real device shows the I/O-hiding win)."""
    import numpy as np

    from numpywren_tpu import alg_wrappers
    from numpywren_tpu.matrix_init import random_spd
    from numpywren_tpu.runtime.executor import SpillTaskExecutor

    n, t = (1024, 256) if fast else (4096, 512)
    a = random_spd(n, seed=9)
    # warmup: compiles the batched kernels for this (t,) shape family so
    # the first timed config is not charged for every jit
    prog, out, _ = alg_wrappers.cholesky(a, tile=(t, t), storage="host")
    SpillTaskExecutor(prog, pipeline_width=0).run()
    prog.free()
    for policy, pw in [("wavefront", 0), ("lookahead", 0),
                       ("lookahead", 4)]:
        prog, out, _ = alg_wrappers.cholesky(a, tile=(t, t), storage="host")
        t0 = time.perf_counter()
        status = SpillTaskExecutor(prog, schedule_policy=policy,
                                   pipeline_width=pw).run()
        wall = time.perf_counter() - t0
        l = np.tril(out.numpy())
        resid = float(np.linalg.norm(a - l @ l.T) / np.linalg.norm(a))
        log_result("spill", n=n, tile=t, policy=policy, pipeline_width=pw,
                   wall_s=round(wall, 2), status=status.name, resid=resid)
        prog.free()


def stage_sigma_e2e(fast):
    import numpy as np

    from numpywren_tpu import models

    rng = np.random.default_rng(2)
    n = 4096 if fast else 8192
    x = rng.standard_normal((n, n)).astype(np.float32)
    t0 = time.perf_counter()
    s = models.singular_values(x)  # default band path (TPU chase + dgbbrd)
    wall = time.perf_counter() - t0
    ok = bool(np.isfinite(s).all()) and bool(s[0] > 0)
    log_result("sigma_e2e", n=n, wall_s=round(wall, 1), ok=ok,
               s0=float(s[0]), s_last=float(s[-1]))


STAGES = {
    "peak": stage_peak, "micro": stage_micro, "ablate": stage_ablate,
    "tilesweep": stage_tilesweep,
    "numerics": stage_numerics, "qdwh": stage_qdwh, "qdwh8k": stage_qdwh8k,
    "band": stage_band, "spill": stage_spill, "sigma_e2e": stage_sigma_e2e,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", nargs="*", default=None, choices=list(STAGES))
    p.add_argument("--skip", nargs="*", default=[], choices=list(STAGES))
    p.add_argument("--fast", action="store_true")
    args = p.parse_args()

    import jax

    if os.environ.get("NPW_FORCE_CPU"):
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
