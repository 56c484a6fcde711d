"""Benchmark harness: prints ONE JSON line for the driver.

Flagship metric (BASELINE.json): blocked Cholesky TFLOP/s on the real chip,
reported as a fraction of the 70%-of-peak target, where "peak" is the
MEASURED dense-matmul speed-of-light at the same dtype/precision on the same
chip (so vs_baseline is an honest %-of-attainable number regardless of which
TPU generation the driver runs on).

Timing notes: the axon tunnel's block_until_ready does not reliably wait for
device completion and a host round trip costs ~1s, so everything is timed by
SLOPE — run k1 and k2 chained iterations (each iteration data-depends on the
previous result so they serialize) with one scalar fetch at the end, and
divide the time difference by (k2 - k1). Fixed dispatch/fetch costs cancel.

Usage: python bench.py [--alg cholesky|gemm|tsqr|bdfac] [--n N] [--tile T]
                       [--dtype float32|bfloat16] [--precision default|highest]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Last-good cache (VERDICT r3 weak #1): every successful perf run writes its
# JSON line here; an outage then degrades to "previous measurement, marked
# stale" instead of value 0.0 (round 3 shipped a 0.0 because the axon tunnel
# was down at driver bench time).
LASTGOOD_PATH = os.environ.get(
    "NPW_BENCH_LASTGOOD",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "BENCH_LASTGOOD.json"))

# Set once a REAL (non-stale) measurement line has been printed. The budget
# watchdog and the failure paths consult it: once a real line is out, any
# later kill/timeout must exit 0 without emitting anything that could
# shadow it.
import threading

_REAL_PRINTED = threading.Event()


def save_lastgood(out: dict):
    try:
        tmp = LASTGOOD_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump({**out, "captured_unix": time.time()}, f)
        os.replace(tmp, LASTGOOD_PATH)
    except OSError as e:  # never let bookkeeping break the bench
        log(f"lastgood save failed: {e}")


def load_lastgood(alg: str):
    """Last-good measurement for the SAME algorithm (replaying cholesky
    numbers for a failed tsqr run would record a wrong metric)."""
    try:
        with open(LASTGOOD_PATH) as f:
            last = json.load(f)
        if str(last.get("metric", "")).startswith(f"{alg}_"):
            return last
    except (OSError, ValueError):
        pass
    return None


def emit_failure(alg: str, error: str):
    """The driver's contract is ONE JSON line. On failure, prefer the
    last-good measurement with stale markers over a useless 0.0."""
    if _REAL_PRINTED.is_set():
        return  # a real line is already out; don't shadow it
    last = load_lastgood(alg)
    if last is not None:
        out = {**last, "stale": True, "stale_reason": error}
        print(json.dumps(out), flush=True)
        return
    print(json.dumps({
        "metric": f"{alg}_tflops", "value": 0.0,
        "unit": "TFLOP/s", "vs_baseline": 0.0, "error": error,
    }), flush=True)


def emit_provisional(alg: str):
    """Flush the last-good line IMMEDIATELY at startup, marked provisional.

    Rounds 3 and 4 both recorded nothing in the driver's BENCH_r*.json —
    r3 because the tunnel was down at bench time, r4 because the driver's
    own timeout SIGKILLed bench.py mid-headline (rc 124, parsed: null)
    before any JSON line was flushed. An external SIGKILL leaves no
    exception path to hook, so the only defense is to have a parseable
    line on stdout from second zero. The driver captures and parses
    output even on rc 124 (BENCH_r04.json carries the tail), and a later
    real measurement line supersedes the provisional one; even a parser
    that took the FIRST line would record last-good-marked-stale, which
    beats parsed:null in every case."""
    last = load_lastgood(alg)
    if last is not None:
        print(json.dumps({**last, "stale": True, "provisional": True}),
              flush=True)


def fetch_scalar(x) -> float:
    """Force completion of everything `x` depends on; return it."""
    import jax.numpy as jnp
    import numpy as np

    return float(np.asarray(x.astype(jnp.float32)))


def slope_time(run_chain, k1: int, k2: int) -> float:
    """Seconds per iteration via two-point slope (run_chain(k) must execute k
    serialized iterations and block until done)."""
    run_chain(1)  # warmup / compile
    t0 = time.perf_counter()
    run_chain(k1)
    t1 = time.perf_counter()
    run_chain(k2)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1)


def measure_matmul_peak(dtype, precision, n: int = 8192) -> float:
    """Measured dense-matmul speed-of-light (TFLOP/s) at dtype/precision.
    8192-sized operands + long chains: the tunnel's timing noise is tens of
    ms, so each measurement leg must be hundreds of ms of real compute."""
    import jax
    import jax.numpy as jnp

    if jax.devices()[0].platform != "tpu":
        # CPU-smoke path: the 8192^3 chains take many minutes on a 1-core
        # host and the "%-of-peak" framing is TPU-only anyway
        n = 512

    x = (jax.random.normal(jax.random.PRNGKey(0), (n, n)) * 0.01).astype(dtype)

    @jax.jit
    def mm(a, b):
        return jnp.dot(a, b, precision=precision) * 0.01

    def chain(k):
        y = x
        for _ in range(k):
            y = mm(y, x)
        fetch_scalar(y[0, 0])

    chain(2)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        chain(8)
        t1 = time.perf_counter()
        chain(40)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / 32)
    return 2 * n**3 / best / 1e12


def bench_cholesky_trapezoid(n, tile, dtype, precision, syrk_depth, panel=None):
    """Flagship path: TrapezoidMatrix storage, buffers donated per run.
    Each timed run factors a DISTINCT fresh SPD matrix (constructed
    untimed, as factorization benchmarks conventionally do); the slope
    over back-to-back donated runs cancels dispatch/fetch overhead."""
    import jax
    import jax.numpy as jnp

    from numpywren_tpu.trapezoid import _trapezoid_chol_fn

    panel = panel or 8 * tile
    nb = -(-n // panel)
    n_pad = nb * panel
    log(f"cholesky[trapezoid]: n={n} tile={tile} panel={panel} "
        f"dtype={dtype} precision={precision}")

    # build column blocks directly (never materializes the flat square)
    # block c holds rows [c*panel, n_pad) of columns [c*panel, (c+1)*panel):
    # local (i, j) = global (c*panel + i, c*panel + j), so the global
    # diagonal is local k=0 in EVERY block
    big = (n_pad * n_pad * 4 > 6 * (1 << 30)  # the X operand would not fit
           or bool(os.environ.get("NPW_BENCH_FORCE_BIG")))

    if big:
        # blockwise-PRNG SPD: A[i,j] = s*(r(i,j) + r(j,i)^T) + 2I[i==j],
        # symmetric by construction and PD because the symmetric-random
        # spectral radius 2*s*sqrt(n) stays below the 2I shift. No O(n^2)
        # operand is ever materialized — this is what makes single-chip
        # N=65536 (8 GiB of trapezoid columns) constructible at all.
        s_scale = 0.5 / (n_pad ** 0.5)

        def blk(key, i, j):
            r_ij = jax.random.normal(jax.random.fold_in(key, i * nb + j),
                                     (panel, panel), jnp.float32)
            r_ji = jax.random.normal(jax.random.fold_in(key, j * nb + i),
                                     (panel, panel), jnp.float32)
            out = s_scale * (r_ij + r_ji.T)
            if i == j:
                out = out + 2.0 * jnp.eye(panel, dtype=jnp.float32)
            return out

        # grouped generator: per-column programs cost nb separate remote
        # compiles (~64 round trips — measured to blow past the harness
        # budget when the compile service is slow), while ONE whole-matrix
        # program got the compile helper OOM-killed (SIGKILL) at nb=64.
        # Eight columns per program is small enough to compile and few
        # enough round trips.
        group = 8

        def _mk_group(key, g0):
            return tuple(
                jnp.concatenate([blk(key, i, c) for i in range(c, nb)],
                                axis=0).astype(dtype)
                for c in range(g0, min(g0 + group, nb))
            )

        mk_group = jax.jit(_mk_group, static_argnums=1)

        def make_cols(seed):
            key = jax.random.PRNGKey(seed)
            cols = []
            for g0 in range(0, nb, group):
                cols.extend(mk_group(key, g0))
            fetch_scalar(sum(cb[-1, -1] for cb in cols))
            return cols
    else:
        mk = jax.jit(
            lambda x, c: (jnp.matmul(x[c * panel :],
                                     x[c * panel : (c + 1) * panel].T,
                                     precision=jax.lax.Precision.DEFAULT) / n
                          + 2.0 * jnp.eye(n_pad - c * panel, panel)
                          ).astype(dtype),
            static_argnums=1,
        )

        def make_cols(seed):
            x = jax.random.normal(jax.random.PRNGKey(seed), (n_pad, n_pad),
                                  jnp.float32)
            cols = [mk(x, c) for c in range(nb)]
            # block_until_ready is unreliable across the tunnel: force real
            # completion with a scalar fetch depending on every block
            fetch_scalar(sum(cb[-1, -1] for cb in cols))
            del x
            return cols

    import gc

    fn = _trapezoid_chol_fn(n_pad, panel, nb, tile, precision,
                            jnp.dtype(dtype).name, False)
    warm_out = fn(*make_cols(99))  # compile
    fetch_scalar(warm_out[0][0, 0])
    del warm_out
    gc.collect()

    if big:
        # one trapezoid barely fits beside the working set: time single
        # donated runs (per-run seconds dwarf the ~40ms fetch overhead)
        per = float("inf")
        for rep in range(2):
            cols = make_cols(rep + 1)
            gc.collect()
            t0 = time.perf_counter()
            o = fn(*cols)
            fetch_scalar(o[0][0, 0])
            per = min(per, time.perf_counter() - t0)
            del cols, o
            gc.collect()
    else:
        # slope between k1 and k2 donated runs, after one throwaway settle
        # run (the first run after bulk construction absorbs allocator
        # work); repeat and keep the best slope. Legs scale with n so each
        # leg is hundreds of ms against tens-of-ms wall noise.
        k1, k2 = (1, 2) if n > 16384 else (3, 9)
        per = float("inf")
        for rep in range(2):
            n_inputs = 1 + k1 + k2
            inputs = [make_cols(100 * rep + s) for s in range(1, n_inputs + 1)]
            gc.collect()

            def chain(idxs):
                t = jnp.zeros((), dtype)
                for i in idxs:
                    cols = inputs[i]
                    cols0 = cols[0].at[0, 0].add(t)
                    inputs[i] = None
                    o = fn(cols0, *cols[1:])
                    del cols, cols0
                    t = (o[0][0, 0] * 1e-30).astype(dtype)
                    del o
                fetch_scalar(t)

            chain([0])  # settle
            t0 = time.perf_counter()
            chain(list(range(1, 1 + k1)))
            t1 = time.perf_counter()
            chain(list(range(1 + k1, 1 + k1 + k2)))
            t2 = time.perf_counter()
            this = ((t2 - t1) - (t1 - t0)) / (k2 - k1)
            if this <= 0:  # pathological scheduling noise: use the long leg
                this = (t2 - t1) / k2
            per = min(per, this)
            gc.collect()
    tflops = n**3 / 3 / per / 1e12

    # residual check on a fresh factorization (timing buffers are gone):
    # per stored column block c, rec = sum_q L[rows>=c*panel, q] @ L[block c, q]^T
    # covers every element of the block (L is lower-tri, so blocks q > c are 0)
    l_cols = fn(*make_cols(0))
    fetch_scalar(l_cols[0][0, 0])

    hp = jax.lax.Precision.HIGHEST

    def rec_col(l_cols, c):
        lf = [lc.astype(jnp.float32) for lc in l_cols]
        rec = jnp.zeros((n_pad - c * panel, panel), jnp.float32)
        for q in range(c + 1):
            lq = lf[q]
            rows = lq[(c - q) * panel :]
            cols_blk = lq[(c - q) * panel : (c - q + 1) * panel]
            rec = rec + jnp.matmul(rows, cols_blk.T, precision=hp)
        return rec

    if big:
        # FULL streamed Frobenius residual (VERDICT r2 #7, replacing the
        # sampled estimate): work at PANEL-TILE granularity so every op is
        # a uniform (panel x panel) block — A regenerated blockwise from
        # the PRNG seed, (L L^T)_ij = sum_q L[i,q] L[j,q]^T as static
        # slices of the trapezoid columns. Row blocks are grouped into a
        # few jit programs (compile-count bound for the remote compile
        # service); lower-triangle blocks only, off-diagonal contributions
        # doubled by symmetry. Falls back to the old sampled estimate on
        # any failure (e.g. a compile-service fault at the largest size).
        key0 = jax.random.PRNGKey(0)

        def row_group_resid(l_cols, i_list):
            num = jnp.zeros((), jnp.float32)
            den = jnp.zeros((), jnp.float32)
            for i in i_list:
                for j in range(i + 1):
                    rec = jnp.zeros((panel, panel), jnp.float32)
                    for q in range(j + 1):
                        li = jax.lax.dynamic_slice(
                            l_cols[q], ((i - q) * panel, 0), (panel, panel)
                        ).astype(jnp.float32)
                        lj = jax.lax.dynamic_slice(
                            l_cols[q], ((j - q) * panel, 0), (panel, panel)
                        ).astype(jnp.float32)
                        rec = rec + jnp.matmul(li, lj.T, precision=hp)
                    a_ij = blk(key0, i, j).astype(jnp.float32)
                    w = 1.0 if i == j else 2.0  # symmetric off-diag pair
                    num = num + w * jnp.sum((a_ij - rec) ** 2)
                    den = den + w * jnp.sum(a_ij ** 2)
            return num, den

        try:
            # group row blocks so each program stays modest: ~nb/4 rows
            # per program -> 4-5 compiles of uniform panel-sized ops
            group_rows = max(1, nb // 4)
            num = den = 0.0
            for g0 in range(0, nb, group_rows):
                i_list = tuple(range(g0, min(g0 + group_rows, nb)))
                d = jax.jit(row_group_resid, static_argnums=1)(
                    list(l_cols), i_list)
                num += fetch_scalar(d[0])
                den += fetch_scalar(d[1])
            resid = (num / den) ** 0.5
            extra_resid = {"residual_fro": resid, "residual_full": True}
        except Exception as e:  # noqa: BLE001 — compile-service fallback
            log(f"full residual failed ({type(e).__name__}: {e}); "
                "falling back to sampled columns")
            n_samp = int(os.environ.get("NPW_BENCH_RESID_SAMPLES", "4"))
            picks = [round(k * (nb - 1) / max(1, n_samp - 1))
                     for k in range(n_samp)]
            sample = sorted({min(nb - 1, max(0, p)) for p in picks})
            mk_one = jax.jit(
                lambda key, c: jnp.concatenate(
                    [blk(key, i, c) for i in range(c, nb)], axis=0
                ).astype(dtype),
                static_argnums=1,
            )
            num = den = 0.0
            for c in sample:
                a_c = mk_one(key0, c).astype(jnp.float32)
                d = jax.jit(
                    lambda ls, ac, c=c: (
                        jnp.sum((ac - rec_col(ls, c)) ** 2), jnp.sum(ac ** 2))
                )(list(l_cols), a_c)
                num += fetch_scalar(d[0])
                den += fetch_scalar(d[1])
                del a_c
            resid = (num / den) ** 0.5
            extra_resid = {"residual_fro_sampled_cols": resid,
                           "residual_sample": sample}
    else:
        a_cols = make_cols(0)

        @jax.jit
        def resid_sq(l_cols, a_cols):
            num = jnp.zeros((), jnp.float32)
            den = jnp.zeros((), jnp.float32)
            for c in range(nb):
                diff = a_cols[c].astype(jnp.float32) - rec_col(l_cols, c)
                num = num + jnp.sum(diff ** 2)
                den = den + jnp.sum(a_cols[c].astype(jnp.float32) ** 2)
            return num, den

        num, den = resid_sq(list(l_cols), a_cols)
        resid = (fetch_scalar(num) / fetch_scalar(den)) ** 0.5
        extra_resid = {"residual_fro": resid}
    log(f"per-factorization: {per*1e3:.1f} ms  residual: {resid:.3e}")
    return tflops, per, {"layout": "trapezoid", **extra_resid}


def bench_cholesky(n, tile, dtype, precision, syrk_depth):
    import jax
    import jax.numpy as jnp

    from numpywren_tpu.compiler.lower import fused_cholesky_fn

    log(f"cholesky: n={n} tile={tile} dtype={dtype} precision={precision}")
    # SPD input generated on device (avoid a GiB-scale tunnel transfer)
    def make_spd():
        x = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.float32)
        return (jnp.matmul(x, x.T, precision=jax.lax.Precision.DEFAULT) / n
                + 2.0 * jnp.eye(n, dtype=jnp.float32)).astype(dtype)

    a = jax.jit(make_spd)()
    a.block_until_ready()

    body = fused_cholesky_fn(n, tile, syrk_depth=syrk_depth,
                             precision=precision, dtype=dtype)
    diag = jnp.arange(n)

    @jax.jit
    def step(a, t):
        # t is a scalar from the previous factor: serializes the chain and
        # perturbs the input negligibly (defeats any result reuse)
        return body(a.at[diag, diag].add(t))

    def chain(k):
        # keep only the perturbation scalar between iterations so at most
        # one factor buffer is live (n=32768 fp32 buffers are 4 GiB each)
        t = jnp.zeros((), dtype)
        for _ in range(k):
            l = step(a, t)
            t = (l[0, 0] * 1e-30).astype(dtype)
            del l
        fetch_scalar(t)

    ks = (2, 6) if n <= 16384 else (1, 3)
    per = slope_time(chain, *ks)
    flops = n**3 / 3
    tflops = flops / per / 1e12
    # residual ||A - L L^T||_F / ||A||_F, accumulated over row blocks so the
    # check fits in HBM at any n; measurement matmuls run at HIGHEST (must
    # be more accurate than the factorization being measured)
    l = step(a, jnp.zeros((), dtype))
    rb = min(n, 8192)

    @jax.jit
    def resid_sq(a, l):
        num = jnp.zeros((), jnp.float32)
        den = jnp.zeros((), jnp.float32)
        lf = l.astype(jnp.float32)
        for r0 in range(0, n, rb):
            ab = jax.lax.dynamic_slice(a, (r0, 0), (rb, n)).astype(jnp.float32)
            lb = jax.lax.dynamic_slice(lf, (r0, 0), (rb, n))
            rec = jnp.matmul(lb, lf.T, precision=jax.lax.Precision.HIGHEST)
            num += jnp.sum((ab - rec) ** 2)
            den += jnp.sum(ab ** 2)
        return num, den

    num, den = resid_sq(a, l)
    resid = (fetch_scalar(num) / fetch_scalar(den)) ** 0.5
    log(f"per-factorization: {per*1e3:.1f} ms  residual: {resid:.3e}")
    return tflops, per, {"residual_fro": resid}


def bench_gemm(n, tile, dtype, precision, syrk_depth):
    import jax
    import jax.numpy as jnp

    from numpywren_tpu.compiler.lower import _matmul

    log(f"gemm: n={n} tile={tile} dtype={dtype} precision={precision}")
    a = (jax.random.normal(jax.random.PRNGKey(1), (n, n)) * 0.01).astype(dtype)

    @jax.jit
    def step(x, y):
        # same dispatch as the fused lowering: Pallas for DEFAULT/HIGHEST,
        # XLA dot for HIGH (Mosaic has no 3-pass mode)
        return _matmul(x, y, precision=precision) * 0.01

    def chain(k):
        y = a
        for _ in range(k):
            y = step(y, a)
        fetch_scalar(y[0, 0])

    per = slope_time(chain, 3, 9)
    return 2 * n**3 / per / 1e12, per, {}


def bench_tsqr(n, tile, dtype, precision, syrk_depth, method="cholqr2"):
    # method: cholqr2 (fast, kappa < ~3e3) | cholqr3s (robust to ~1e6,
    # 1.5x cost) | tree (Householder, unconditional)
    import jax
    import jax.numpy as jnp

    from numpywren_tpu.compiler.lower import (
        fused_cholqr2_fn,
        fused_cholqr3s_fn,
        fused_tsqr_fn,
    )

    b = 512
    rows = n  # n = total rows
    n_leaves = max(1, rows // tile)
    rows = n_leaves * tile
    log(f"tsqr[{method}]: {rows}x{b}, {n_leaves} leaves of {tile} rows")
    a = (jax.random.normal(jax.random.PRNGKey(1), (rows, b)) * 0.1).astype(dtype)
    if method == "cholqr2":
        body = fused_cholqr2_fn(precision=precision, dtype=dtype)
    elif method == "cholqr3s":
        body = fused_cholqr3s_fn(precision=precision, dtype=dtype)
    else:
        body = fused_tsqr_fn(n_leaves, tile, b, precision=precision, dtype=dtype)

    @jax.jit
    def step(x, t):
        return body(x + t)

    def chain(k):
        t = jnp.zeros((), dtype)
        r = None
        for _ in range(k):
            r = step(a, t)
            t = (r[0, 0] * 1e-30).astype(dtype)
        fetch_scalar(r[0, 0])

    per = slope_time(chain, 2, 6)
    # per-pass useful work is 2*m*b^2 (Gram + solve): cholqr2 = 2 passes;
    # cholqr3s' adaptive chain runs exactly 2 passes in this
    # well-conditioned benchmark case (extra passes fire only on shift
    # breakdown), so counting 3 would inflate its TFLOPs ~1.5x vs cholqr2
    flops = {"cholqr2": 4, "cholqr3s": 4}.get(method, 2) * rows * b * b
    # correctness: ||R^T R - A^T A|| / ||A^T A|| (Gram parity, HIGHEST)
    r = step(a, jnp.zeros((), dtype))

    @jax.jit
    def gram_err(a, r):
        hp = jax.lax.Precision.HIGHEST
        g = jnp.matmul(a.T, a, precision=hp)
        g2 = jnp.matmul(r.T, r, precision=hp)
        return jnp.linalg.norm(g2 - g) / jnp.linalg.norm(g)

    err = fetch_scalar(gram_err(a, r))
    log(f"gram relative error: {err:.3e}")
    return flops / per / 1e12, per, {"rows": rows, "cols": b,
                                     "method": method, "gram_rel_err": err}


def bench_bdfac(n, tile, dtype, precision, syrk_depth):
    import jax
    import jax.numpy as jnp

    from numpywren_tpu.compiler.lower import fused_bdfac_fn

    log(f"bdfac: n={n} tile={tile} dtype={dtype} precision={precision}")
    a = (jax.random.normal(jax.random.PRNGKey(1), (n, n)) * 0.1).astype(dtype)
    body = fused_bdfac_fn(n, tile, precision=precision, dtype=dtype)

    import functools

    freshen = jax.jit(lambda a, t: a + t)  # fresh buffer per run

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(x):
        # x is a fresh per-run buffer — donating it lets the in-place
        # sweeps skip the defensive whole-array copy (profiled ~2.4 ms)
        return body(x)

    def chain(k):
        t = jnp.zeros((), dtype)
        bd = None
        for _ in range(k):
            bd = step(freshen(a, t))
            t = (bd[0, 0] * 1e-30).astype(dtype)
            del bd
        fetch_scalar(t)

    per = slope_time(chain, 1, 3)
    flops = 8 * n**3 / 3  # two-sided blocked Householder sweeps
    return flops / per / 1e12, per, {}


def bench_numerics():
    """On-chip numerics gate (VERDICT r2 #6): the kappa ladder through the
    adaptive-CholeskyQR chain and the BDFAC panel composition, emitting one
    JSON line of max errors per rung. The round-2 breakdown family each has
    a rung that fails on the pre-fix code: kappa>=1e4 rungs catch plain-
    CholeskyQR NaN Grams (tile>=256 case), the 1e5 rung catches finite-
    garbage pivots (pivot-floor test), 1e6+ catches over-shift, and the
    bdfac rungs catch the sigma/orthogonality composition on-chip (fp32-
    HIGH Gram roundoff that CPU meshes cannot see)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from numpywren_tpu.compiler.lower import fused_tsqr
    from numpywren_tpu import models

    rng = np.random.default_rng(0)

    def logspace_mat(m, b, kappa):
        u, _ = np.linalg.qr(rng.standard_normal((m, b)))
        v, _ = np.linalg.qr(rng.standard_normal((b, b)))
        sv = np.logspace(0, -np.log10(kappa), b)
        return (u * sv) @ v.T

    rungs = {}
    ok = 0
    total = 0
    fast = bool(os.environ.get("NPW_BENCH_FAST"))
    m, b = (8192, 128) if fast else (65536, 256)
    ladder = [1e2, 1e4, 1e6, 1e8] if fast else [1e2, 1e3, 1e4, 1e5, 1e6, 1e7, 1e8]
    for kappa in ladder:
        a = logspace_mat(m, b, kappa).astype(np.float32)
        q, r = fused_tsqr(jnp.asarray(a), tile_rows=m, compute_q=True,
                          method="cholqr3s")
        q = np.asarray(q)
        ortho = float(np.max(np.abs(q.T @ q - np.eye(b))))
        resid = float(np.linalg.norm(q @ np.asarray(r) - a) / np.linalg.norm(a))
        # resid bar 2e-4: the measured fp32-HIGH apply floor at 65536x256
        # spans 5.7e-5..1.14e-4 across healthy rungs (a 1e-4 bar cut
        # through that distribution and flickered on the kappa=1e6 rung);
        # a real chain regression lands decades higher (the max_passes
        # exhaustion case measured ortho 0.95)
        passed = np.isfinite(ortho) and ortho < 1e-3 and resid < 2e-4
        rungs[f"cholqr3s_kappa_{kappa:.0e}"] = {
            "ortho_max": ortho, "resid": resid, "pass": bool(passed)}
        ok += passed
        total += 1
        log(f"cholqr3s kappa={kappa:.0e}: ortho {ortho:.2e} resid {resid:.2e}"
            f" {'PASS' if passed else 'FAIL'}")
    # bdfac panel composition at the tile sizes where plain CholeskyQR
    # panels NaN'd on-chip in round 2 (tile >= 256)
    for tile in ([256] if fast else [256, 512]):
        n = 1024 if fast else 2048
        x = rng.standard_normal((n, n)).astype(np.float32)
        s = models.singular_values(x, tile=tile)
        s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
        err = float(np.max(np.abs(s - s_ref)) / s_ref[0])
        passed = np.isfinite(err) and err < 1e-4
        rungs[f"bdfac_sv_tile{tile}"] = {"sv_maxerr": err, "pass": bool(passed)}
        ok += passed
        total += 1
        log(f"bdfac tile={tile}: sv err {err:.2e} {'PASS' if passed else 'FAIL'}")
    worst = max(
        v.get("ortho_max", 0.0) if "ortho_max" in v else v["sv_maxerr"]
        for v in rungs.values()
    )
    out = {
        "metric": "numerics_gate_maxerr",
        "value": worst,
        "unit": "maxerr",
        "vs_baseline": ok / total,  # pass fraction (1.0 = all rungs green)
        "rungs": rungs,
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(out), flush=True)
    return 0 if ok == total else 1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--alg", default="cholesky",
                   choices=["cholesky", "gemm", "tsqr", "bdfac"])
    p.add_argument("--numerics", action="store_true",
                   help="run the on-chip numerics gate (kappa ladder + "
                        "bdfac composition) instead of a perf benchmark")
    p.add_argument("--n", type=int, default=None)
    p.add_argument("--tile", type=int, default=None)
    p.add_argument("--dtype", default="float32")
    # "high" (bf16_3x) is the flagship: fp32-equivalent accuracy (~1e-5 rel
    # error vs fp64, scipy-fp32 parity) at ~2.5x the speed of "highest";
    # "default" on this hardware is 1-pass bf16 — fast but ~1e-3 error.
    p.add_argument("--precision", default="high",
                   choices=["default", "high", "highest"])
    p.add_argument("--syrk-depth", type=int, default=3,
                   help="recursive triangular-syrk depth")
    p.add_argument("--layout", default="trapezoid", choices=["trapezoid", "flat"],
                   help="cholesky storage layout (trapezoid = donated "
                        "column blocks, the framework's hot path)")
    p.add_argument("--panel", type=int, default=None,
                   help="trapezoid column-block width (default 8*tile)")
    p.add_argument("--tsqr-method", default="cholqr2",
                   choices=["cholqr2", "cholqr3s", "tree"])
    p.add_argument("--target-frac", type=float, default=0.70,
                   help="BASELINE.json north-star fraction of peak")
    args = p.parse_args()

    if args.numerics:
        sys.exit(bench_numerics())

    # flush a provisional record before ANYTHING that can hang or be
    # killed (jax import, backend init, compiles) — see emit_provisional
    emit_provisional(args.alg)

    try:
        _perf_main(args)
    except SystemExit:
        raise
    except Exception as e:  # noqa: BLE001
        # the driver's contract is ONE JSON line; a backend outage (e.g.
        # the axon tunnel's UNAVAILABLE init error, observed mid-round-3)
        # must record a diagnosable line instead of a bare traceback
        import traceback

        log(traceback.format_exc())
        if _REAL_PRINTED.is_set():
            sys.exit(0)  # a real measurement is already on stdout
        emit_failure(args.alg, f"{type(e).__name__}: {e}")
        sys.exit(1)


def _perf_main(args):
    import jax

    if os.environ.get("NPW_BENCH_FORCE_CPU"):
        # test hook: the container's sitecustomize pre-imports jax, so the
        # JAX_PLATFORMS env var is too late for subprocesses; the config
        # knob still works before backend init
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # a down backend HANGS at init inside a blocking C call (observed:
    # axon tunnel outage — SIGALRM handlers never run because the
    # interpreter never regains control), so the watchdog is a THREAD
    # that prints the diagnostic line itself and hard-exits.
    # The same thread enforces the GLOBAL wall budget (VERDICT r4 #1):
    # r4's driver run was SIGKILLed at its own timeout mid-headline with
    # nothing parseable flushed; with a budget we exit 0 on our own terms
    # with last-good (or whatever real stage already printed) on stdout.
    import os as _os
    import threading

    _init_done = threading.Event()
    # generous default: a kill BEFORE the budget still finds the
    # provisional + quick-stage lines on stdout, so a long budget only
    # adds upside (time for the n=65536 upgrade to land)
    budget = float(os.environ.get("NPW_BENCH_BUDGET_S", "3300"))
    t_start = time.monotonic()

    def remaining() -> float:
        return budget - (time.monotonic() - t_start)

    def _watchdog():
        if not _init_done.wait(min(290, budget)):
            emit_failure(args.alg, "backend init exceeded 290 s (tunnel down?)")
            _os._exit(0 if _REAL_PRINTED.is_set() else 1)
        rem = remaining()
        while rem > 0:
            time.sleep(min(rem, 30))
            rem = remaining()
        if not _REAL_PRINTED.is_set():
            emit_failure(args.alg, f"global bench budget ({budget:.0f}s) "
                                   "exhausted before a real measurement")
        log(f"budget {budget:.0f}s exhausted; exiting "
            f"(real measurement printed: {_REAL_PRINTED.is_set()})")
        _os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()
    # UNAVAILABLE init errors (tunnel flaps) usually clear within ~2 min:
    # retry with backoff while the watchdog budget lasts (a HANGING init is
    # the watchdog's job — the interpreter never returns from the C call)
    deadline = time.monotonic() + 240
    delay = 10.0
    while True:
        try:
            dev = jax.devices()[0]
            break
        except Exception as e:  # noqa: BLE001 — backend init fault
            if time.monotonic() + delay > deadline:
                raise
            log(f"backend init failed ({type(e).__name__}: {e}); "
                f"retrying in {delay:.0f}s")
            time.sleep(delay)
            delay = min(delay * 2, 60.0)
    _init_done.set()
    log(f"device: {dev.device_kind} ({dev.platform})")
    on_tpu = dev.platform == "tpu"

    defaults = {
        # the BASELINE headline size; NPW_BENCH_FAST=1 drops to 32768
        # (~6 min instead of ~30 incl. compiles) for quick iterations
        "cholesky": ((32768 if __import__("os").environ.get("NPW_BENCH_FAST")
                      else 65536) if on_tpu else 512, 128),
        "gemm": (8192 if on_tpu else 1024, 512),
        "tsqr": (1 << 20 if on_tpu else 1 << 14, 4096 if on_tpu else 1024),
        "bdfac": (8192 if on_tpu else 256, 512 if on_tpu else 64),  # 512 measured best (26 TF abs, r2; 1024 is 12% slower)
    }
    n = args.n or defaults[args.alg][0]
    tile = args.tile or defaults[args.alg][1]
    dtype = jnp.dtype(args.dtype)
    precision = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[args.precision]

    peak = measure_matmul_peak(dtype, precision)
    log(f"measured matmul speed-of-light: {peak:.1f} TFLOP/s")

    fn = {"cholesky": bench_cholesky, "gemm": bench_gemm, "tsqr": bench_tsqr,
          "bdfac": bench_bdfac}[args.alg]
    if args.alg == "tsqr":
        import functools as _ft

        fn = _ft.partial(bench_tsqr, method=args.tsqr_method)
    if args.alg == "cholesky" and args.layout == "trapezoid":
        import functools as _ft

        fn = _ft.partial(bench_cholesky_trapezoid, panel=args.panel)

    def run_stage(n_stage, note=None):
        """Run one measurement and print its line IMMEDIATELY — every later
        stage/failure leaves this record intact on stdout."""
        tflops, per, extra = fn(n_stage, tile, dtype, precision,
                                args.syrk_depth)
        frac_peak = tflops / peak
        out = {
            "metric": (f"{args.alg}_n{n_stage}_{args.dtype}_"
                       f"{args.precision}_tflops"),
            "value": round(tflops, 2),
            "unit": "TFLOP/s",
            "vs_baseline": round(frac_peak / args.target_frac, 4),
            "frac_of_matmul_peak": round(frac_peak, 4),
            "matmul_peak_tflops": round(peak, 1),
            "seconds_per_run": round(per, 4),
            "device": dev.device_kind,
            **extra,
            **({"stage_note": note} if note else {}),
        }
        print(json.dumps(out), flush=True)
        _REAL_PRINTED.set()
        if on_tpu:
            # only real-chip numbers are worth replaying on an outage
            save_lastgood(out)

    # Escalating headline (VERDICT r4 #1): at the cholesky flagship the
    # n=65536 stage costs ~30 min of cold compiles alone — run the
    # quick-but-real n=32768 stage FIRST so a parseable fresh number is on
    # stdout within ~10 min, then upgrade to 65536 only if the wall budget
    # still has room. The driver takes the last JSON line, so the upgrade
    # supersedes the quick stage when it lands; a kill mid-upgrade leaves
    # the quick stage as the round's record.
    stages = [n]
    if (on_tpu and args.n is None and args.alg == "cholesky"
            and not os.environ.get("NPW_BENCH_FAST") and n > 32768):
        stages = [32768, n]

    escalate_min = float(os.environ.get("NPW_BENCH_ESCALATE_S", "1200"))
    for i, n_stage in enumerate(stages):
        if i > 0 and remaining() < escalate_min:
            log(f"skipping n={n_stage} upgrade: {remaining():.0f}s left "
                f"< {escalate_min:.0f}s")
            break
        try:
            run_stage(n_stage,
                      note="quick" if len(stages) > 1 and i == 0 else None)
        except Exception as e:  # noqa: BLE001 — stage fault (e.g. a
            # compile-service SIGKILL at the largest size, observed
            # 2026-08-18): shrink directly instead of retrying the same
            # size (the r4 full-retry path blew the driver's window)
            if _REAL_PRINTED.is_set():
                log(f"stage n={n_stage} failed ({type(e).__name__}: {e}); "
                    "keeping the earlier stage's record")
                break
            fallback = {"cholesky": 16384 if n_stage <= 32768 else 32768,
                        "gemm": 4096, "tsqr": 1 << 19,
                        "bdfac": 4096}.get(args.alg)
            if not (on_tpu and args.n is None and fallback
                    and fallback < n_stage):
                raise
            log(f"stage n={n_stage} failed ({type(e).__name__}: {e}); "
                f"falling back to n={fallback}")
            run_stage(fallback, note="fallback_from_stage_failure")
            break


if __name__ == "__main__":
    main()
