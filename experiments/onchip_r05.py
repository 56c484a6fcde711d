"""Round-5 on-chip measurement session A: svd_jacobi at flagship sizes
(VERDICT r4 #2) in ONE process (the remote compile cache is per-process),
with a JSONL log flushed after every stage so a tunnel flap loses nothing.

Stages (each skippable via --only):
  peak      measured matmul speed-of-light (the session's denominator)
  jsmall    svd_jacobi n=1024 random — sanity + compile warm-up
  jacobi    svd_jacobi n=4096 and n=8192 random, with vectors: wall
            (cold+warm), recon / U,V orthogonality on device, sweeps.
            The number this replaces: ~520 s host-gesdd finish at n=8192.
  jgraded   svd_jacobi n=2048/4096 logspace kappa=1e4 (known sigmas by
            construction): graded-polish recon/ortho/sigma error on chip
            (CPU tests cannot see fp32-HIGH Gram roundoff — TODO.md).
  sigonly   svd_jacobi compute_uv=False n=8192 (sigma-only path timing,
            vs the band-reduce + dgbbrd route's ~56 s warm)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/onchip_r05.py
       [--only STAGE ...] [--fast]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "results", "onchip_r05.jsonl")
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


def _check_factors(x, u, s, vt):
    """Device-side factor checks (never moves an n^2 array to host):
    recon rel-Fro, U/V orthogonality."""
    import jax
    import jax.numpy as jnp

    hp = jax.lax.Precision.HIGHEST

    @jax.jit
    def checks(x, u, s, vt):
        rec = jnp.matmul(u * s[None, :], vt, precision=hp)
        num = jnp.linalg.norm(rec - x.astype(jnp.float32))
        den = jnp.linalg.norm(x.astype(jnp.float32))
        k = u.shape[1]
        eu = jnp.matmul(u.T, u, precision=hp) - jnp.eye(k)
        ev = jnp.matmul(vt, vt.T, precision=hp) - jnp.eye(k)
        return (num / den, jnp.linalg.norm(eu) / jnp.sqrt(k),
                jnp.linalg.norm(ev) / jnp.sqrt(k))

    r, ou, ov = checks(x, u, s, vt)
    return fetch_scalar(r), fetch_scalar(ou), fetch_scalar(ov)


def _rand(n, seed=0):
    import jax
    import jax.numpy as jnp

    return jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(seed), (n, n),
                                  jnp.float32),
    )()


def _logspace_dev(n, kappa, seed=0):
    """x = Q1 diag(logspace) Q2^T with Q1,Q2 from device QR of Gaussians;
    returns (x, true sigmas as a host vector)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    sv = np.logspace(0, -np.log10(kappa), n).astype(np.float32)

    @jax.jit
    def build(sv):
        q1, _ = jnp.linalg.qr(jax.random.normal(
            jax.random.PRNGKey(seed), (n, n), jnp.float32))
        q2, _ = jnp.linalg.qr(jax.random.normal(
            jax.random.PRNGKey(seed + 1), (n, n), jnp.float32))
        hp = jax.lax.Precision.HIGHEST
        return jnp.matmul(q1 * sv[None, :], q2.T, precision=hp)

    x = build(jnp.asarray(sv))
    fetch_scalar(x[0, 0])
    return x, sv


def stage_peak(fast):
    import bench
    import jax

    peak = bench.measure_matmul_peak(jax.numpy.float32,
                                     jax.lax.Precision.HIGH)
    log_result("peak", tflops=round(peak, 1))
    return peak


def _run_jacobi(n, block, seed, label, compute_uv=True, reps=2,
                skip_rel=None, refine=2):
    import numpy as np

    from numpywren_tpu.models.jacobi import svd_jacobi

    x = _rand(n, seed)
    walls = []
    sweeps = None
    out = None
    for rep in range(reps):
        trace = []
        t0 = time.perf_counter()
        out = svd_jacobi(x, block=block, compute_uv=compute_uv,
                         skip_rel=skip_rel, refine=refine,
                         _sweep_trace=trace)
        if compute_uv:
            fetch_scalar(out[0][0, 0])
        else:
            fetch_scalar(out[0])
        walls.append(time.perf_counter() - t0)
        sweeps = len(trace)
    rec = {"n": n, "block": block, "cold_s": round(walls[0], 1),
           "warm_s": round(min(walls[1:]) if len(walls) > 1 else walls[0], 1),
           "sweeps": sweeps, "final_off": trace[-1] if trace else None,
           "skip_rel": skip_rel, "refine": refine}
    if compute_uv:
        u, s, vt = out
        r, ou, ov = _check_factors(x, u, s, vt)
        rec.update(recon=r, ou=ou, ov=ov,
                   sigma_max=float(np.asarray(s[0])))
    log_result(label, **rec)
    return rec


def stage_jsmall(fast):
    _run_jacobi(1024, 512, 0, "jsmall")


def stage_jacobi(fast):
    sizes = [4096] if fast else [4096, 8192]
    for n in sizes:
        _run_jacobi(n, 512, 1, "jacobi")


def stage_jgraded(fast):
    import numpy as np

    from numpywren_tpu.models.jacobi import svd_jacobi

    sizes = [2048] if fast else [2048, 4096]
    for n in sizes:
        x, sv = _logspace_dev(n, 1e4, seed=2)
        t0 = time.perf_counter()
        u, s, vt = svd_jacobi(x, block=512)
        fetch_scalar(u[0, 0])
        wall = time.perf_counter() - t0
        r, ou, ov = _check_factors(x, u, s, vt)
        s_host = np.asarray(s)
        serr = float(np.max(np.abs(s_host - sv)))
        log_result("jgraded", n=n, kappa=1e4, wall_s=round(wall, 1),
                   recon=r, ou=ou, ov=ov, sigma_maxerr=serr)


def stage_sigonly(fast):
    n = 4096 if fast else 8192
    _run_jacobi(n, 512, 3, "sigonly", compute_uv=False)


def stage_jskip(fast):
    """Pair-convergence thresholding A/B (models/jacobi.py skip_rel):
    converged pairs get the EXACT identity instead of eigh's
    near-identity rotation, halting the per-application GEMM-roundoff
    churn. skip_rel=0.0 is the round-5-session-A behavior; None is the
    new auto default (1.5x the sqrt(2b)*u pair noise floor). Expected
    (CPU-measured at 2048/256): fewer sweeps at equal-or-better recon."""
    n = 2048 if fast else 4096
    for sk in (0.0, None):
        _run_jacobi(n, 512, 1, "jskip", skip_rel=sk)


def stage_jrefine(fast):
    """Iterative-refinement A/B (models/jacobi.py::_refine_step, default
    refine=2): quadratic-contraction finisher below the sweep phase's
    accumulated-roundoff recon floor. CPU-measured: recon 6.5-7.4e-6 ->
    0.8-1.1e-6 at n=1024 across the kappa ladder; this stage records the
    flagship-size on-chip numbers and the step's wall cost."""
    n = 2048 if fast else 4096
    for rf in (0, 2):
        _run_jacobi(n, 512, 1, "jrefine", refine=rf)
    if not fast:
        _run_jacobi(8192, 512, 1, "jrefine", refine=2, reps=2)


def stage_svde2e(fast):
    """The PUBLIC entry point end-to-end: models.svd(x) with no method
    argument, exercising the routing stack as a user hits it
    (host-gflops probe -> jacobi on TPU -> platform-default refine).
    svd()'s contract is host-in/host-out (np.asarray both ways), so at
    the flagship size THIS TUNNEL's 1-25 MB/s D2H would dominate the
    wall (2 x 256 MB of factors) and measure the link, not the
    framework — the stage therefore times the public path at n=2048
    (2 x 16 MB factors) and separately asserts the flagship-size
    routing decision; device-resident pipelines use svd_jacobi
    directly (jacobi/jrefine stages above are those numbers)."""
    import numpy as np

    from numpywren_tpu import models
    from numpywren_tpu.models.svd import _route_default_method

    routed = _route_default_method((8192, 8192))
    n = 1024 if fast else 2048
    x = np.asarray(_rand(n, seed=4))
    walls = []
    out = None
    for _ in range(2):
        t0 = time.perf_counter()
        out = models.svd(x)
        walls.append(time.perf_counter() - t0)
    u, s, vt = out
    rec = (u * s[None, :]) @ vt
    r = float(np.linalg.norm(rec - x) / np.linalg.norm(x))
    ou = float(np.linalg.norm(u.T @ u - np.eye(n)) / np.sqrt(n))
    log_result("svde2e", n=n, routed_8192=routed,
               cold_s=round(walls[0], 1), warm_s=round(min(walls[1:]), 1),
               recon=r, ou=ou)


STAGES = {
    "peak": stage_peak,
    "jsmall": stage_jsmall,
    "jacobi": stage_jacobi,
    "jgraded": stage_jgraded,
    "sigonly": stage_sigonly,
    "jskip": stage_jskip,
    "jrefine": stage_jrefine,
    "svde2e": stage_svde2e,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", nargs="*", default=None, choices=list(STAGES))
    p.add_argument("--fast", action="store_true")
    args = p.parse_args()
    import jax

    dev = jax.devices()[0]
    log_result("session", device=dev.device_kind, platform=dev.platform,
               fast=args.fast)
    for name, fn in STAGES.items():
        if args.only and name not in args.only:
            continue
        t0 = time.perf_counter()
        try:
            fn(args.fast)
        except Exception as e:  # noqa: BLE001 — log and continue
            import traceback

            traceback.print_exc()
            log_result(name, error=f"{type(e).__name__}: {e}")
        log_result(name + "_done", stage_s=round(time.perf_counter() - t0, 1))


if __name__ == "__main__":
    main()
