"""Region-fused lowering: flagship tiled programs as single fused XLA programs.

The generic executor (runtime.executor.JaxTaskExecutor) lowers ANY compiled
DSL program level-by-level with tile gather/scatter. That is correct but
leaves MXU throughput on the table: every level pays a gather + scatter over
the whole tile stack, and same-level tiles of one logical region are kept
apart.

This module is the static-schedule compiler's fast path (SURVEY §7 layer 4,
"the region-fused lowering in compiler.lower"): because TiledMatrix keeps
tiles contiguous in ONE flat padded jax.Array, a whole panel / trailing
region is a zero-copy slice, so the wavefront schedule of the flagship
algorithms lowers to a handful of large fused MXU ops per step:

- Cholesky: per column super-panel, one blocked diagonal potrf + a
  recursive GEMM-rich trsm + one lower-triangle-only trailing syrk
  (see fused_cholesky_fn for the measured design rationale).
- GEMM: one matmul over the flat arrays.
- TSQR: batched leaf QRs + a static halving combine tree, or CholeskyQR2
  (two GEMM passes) for well-conditioned inputs.
- BDFAC: compact-WY blocked Householder sweeps (QR columns / LQ rows).

Everything here traces into one jit per program — no host round trips
between steps (the inversion of the reference's per-task SQS/Redis round
trips, numpywren/job_runner.py).

`lower_fused(program)` pattern-matches a compiled TiledProgram against these
templates by its DSL name and returns a callable, or None when the program
has no fused specialization (the generic executor then runs it).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from numpywren_tpu.ops.common import default_precision, on_tpu


def _dus(arr, update, i0: int, j0: int):
    return lax.dynamic_update_slice(arr, update, (i0, j0))


def _use_compensated(a, precision, pallas) -> bool:
    """The bf16x3 Pallas kernel (ops/gemm3.py) as the HIGH backend: measured
    ~3x better accuracy than XLA's HIGH dot (1.4e-6 vs 4.0e-6 end-to-end
    cholesky residual) at ~7% cost — opt in via NpwConfig.compensated
    (BASELINE's "fp32 + compensated accumulation" mode)."""
    if not (pallas and on_tpu() and a.dtype == jnp.float32
            and precision == jax.lax.Precision.HIGH):
        return False
    from numpywren_tpu.config import default_config

    return default_config().compensated


def _matmul(a, b, *, ta=False, tb=False, precision, pallas=True):
    """Large fused matmul. On TPU this routes through the Pallas MXU kernels
    when shapes are tile-aligned; elsewhere (CPU "fake cluster") jnp.matmul.
    pallas=False forces plain XLA dots — required under GSPMD partitioning
    (parallel.sharded), which cannot split an opaque pallas_call. HIGH
    precision uses XLA's 3-pass dot (fastest) unless NpwConfig.compensated
    selects the more accurate bf16x3 Pallas kernel."""
    if pallas and on_tpu():
        if precision == jax.lax.Precision.HIGH:
            if not ta and _use_compensated(a, precision, pallas):
                from numpywren_tpu.ops.gemm3 import matmul3

                try:
                    return matmul3(a, b, tb=tb)
                except Exception:
                    pass
        else:
            from numpywren_tpu.ops.gemm import matmul as pallas_matmul

            try:
                return pallas_matmul(a, b, ta=ta, tb=tb, precision=precision)
            except Exception:
                pass  # unaligned fall-through
    if ta:
        a = a.T
    if tb:
        b = b.T
    return jnp.matmul(a, b, precision=precision)


def _sub_matmul(c, a, b, *, tb=False, precision, pallas=True):
    """c - a @ op(b) — the trailing-update shape. In compensated mode the
    subtract rides in the bf16x3 kernel's epilogue."""
    if _use_compensated(a, precision, pallas):
        from numpywren_tpu.ops.gemm3 import matmul3

        try:
            return matmul3(a, b, c, tb=tb)
        except Exception:
            pass
    return c - _matmul(a, b, tb=tb, precision=precision, pallas=pallas)


# ---------------------------------------------------------------------------
# Cholesky
# ---------------------------------------------------------------------------

def _syrk_tril(a, pan, r1, j0, rows, depth, tile, precision, pallas, leaf_rows):
    """In-place a[j0:j0+rows, j0:j0+rows] -= P P^T restricted to the (block)
    lower triangle, recursively: the off-diagonal rectangle is ONE large MXU
    GEMM, the two diagonal halves recurse; leaves compute their full square
    (bounded waste: leaf_rows/rows of the flops).

    Splits MUST land on tile boundaries: a split through a diagonal tile
    would leave stale upper-triangle values inside a tile that a later
    potrf reads (cholesky sees the full tile)."""
    if depth == 0 or rows <= leaf_rows:
        p = lax.dynamic_slice(pan, (j0 - r1, 0), (rows, pan.shape[1]))
        s = lax.dynamic_slice(a, (j0, j0), (rows, rows))
        out = _sub_matmul(s, p, p, tb=True, precision=precision, pallas=pallas)
        return _dus(a, out.astype(a.dtype), j0, j0)
    h = (rows // 2 + tile - 1) // tile * tile  # split on a tile boundary
    p1 = lax.dynamic_slice(pan, (j0 - r1, 0), (h, pan.shape[1]))
    p2 = lax.dynamic_slice(pan, (j0 - r1 + h, 0), (rows - h, pan.shape[1]))
    s21 = lax.dynamic_slice(a, (j0 + h, j0), (rows - h, h))
    out = _sub_matmul(s21, p2, p1, tb=True, precision=precision, pallas=pallas)
    a = _dus(a, out.astype(a.dtype), j0 + h, j0)
    a = _syrk_tril(a, pan, r1, j0, h, depth - 1, tile, precision, pallas, leaf_rows)
    a = _syrk_tril(a, pan, r1, j0 + h, rows - h, depth - 1, tile, precision, pallas, leaf_rows)
    return a


def fused_cholesky_fn(
    n_pad: int,
    tile: int,
    *,
    truncate: int = 0,
    panel_tiles: int = 8,
    syrk_depth: int = 3,
    leaf_rows: int = 4096,
    inv_panel: bool = True,
    precision=None,
    dtype=jnp.float32,
    pallas: bool = True,
) -> Callable:
    """Build the jittable in-place blocked Cholesky over a flat padded array.

    Super-panel right-looking factorization, unrolled at trace time so every
    slice has static shape (XLA requirement; SURVEY §7 "no data-dependent
    control flow inside jit"). Per super-panel of W = panel_tiles*tile
    columns, three measured-on-chip design choices:

    1. the W x W diagonal block factors with ONE lax.linalg.cholesky call
       (XLA's internal blocking is MXU-efficient and its cost is near-flat
       in W up to ~4096 — one big call beats W/tile small potrf+trtri steps
       plus their narrow in-panel updates by ~2x end to end);
    2. the below-panel solve B := B L^{-T} is a recursive GEMM-rich trsm
       (`rtrsm`): half the flops per level land in one (rows x W/2) MXU
       GEMM; only tile-sized leaves touch triangular_solve (explicit tile
       inverse when `inv_panel`, the MAGMA trick);
    3. ONE outer trailing update per super-panel via _syrk_tril (recursive
       lower-triangle-only syrk, contraction depth K = W — K=4096 GEMMs
       sustain ~1.5x the throughput of K=512 on the MXU).

    potrf reads only the lower triangle (symmetrize_input=False): the
    strictly-upper region of diagonal tiles may hold stale values.

    Returns fn(a) -> l where `a` is the (n_pad, n_pad) SPD array and `l` the
    lower-triangular factor (upper triangle zeroed). At N=32768 fp32/HIGH
    this runs at ~62% of the same-precision matmul speed of light with
    residual ~4e-6 (see BENCH notes / bench.py).
    """
    if n_pad % tile != 0:
        raise ValueError(f"n_pad {n_pad} not a multiple of tile {tile}")
    g = n_pad // tile
    n_done = (g - truncate) * tile
    w_max = max(1, panel_tiles) * tile
    if precision is None:
        precision = default_precision(dtype)

    def rtrsm(b, l, w):
        """b := b @ l^{-T} for lower-triangular l (w x w), recursively:
        half the flops land in one (rows x w/2) @ (w/2 x w/2) MXU GEMM per
        level; leaves solve against one tile via its explicit inverse
        (tile-sized trtri — numerically equivalent to the reference's
        per-tile trsm)."""
        if w <= tile:
            if inv_panel:
                winv = lax.linalg.triangular_solve(
                    l, jnp.eye(w, dtype=dtype), left_side=True, lower=True
                )
                return _matmul(b, winv, tb=True, precision=precision, pallas=pallas)
            return lax.linalg.triangular_solve(
                l, b, left_side=False, lower=True, transpose_a=True
            )
        h = (w // 2 + tile - 1) // tile * tile
        b1 = rtrsm(b[:, :h], l[:h, :h], h)
        b2 = b[:, h:] - _matmul(b1, l[h:, :h], tb=True,
                                precision=precision, pallas=pallas)
        b2 = rtrsm(b2, l[h:, h:], w - h)
        return jnp.concatenate([b1, b2], axis=1)

    def chol_flat(a):
        """Flat-array in-place variant (used for truncate/prefix runs, where
        the trailing matrix must stay resident in the same buffer)."""
        for p0 in range(0, n_done, w_max):
            pw = min(w_max, n_done - p0)
            d = lax.dynamic_slice(a, (p0, p0), (pw, pw))
            ld = lax.linalg.cholesky(d, symmetrize_input=False)
            a = _dus(a, ld.astype(a.dtype), p0, p0)
            rem = n_pad - (p0 + pw)
            if rem == 0:
                continue
            b = lax.dynamic_slice(a, (p0 + pw, p0), (rem, pw))
            b = rtrsm(b, ld, pw)
            a = _dus(a, b.astype(a.dtype), p0 + pw, p0)
            a = _syrk_tril(a, b, p0 + pw, p0 + pw, rem, syrk_depth,
                           tile, precision, pallas, leaf_rows)
        return jnp.tril(a) if truncate == 0 else a

    def chol_cols(a):
        """Column-block trapezoid layout (the hot path): each super-panel's
        at-and-below-diagonal region lives in its own buffer, so every
        trailing update of one step is ONE GEMM + one whole-buffer
        subtraction per later column block — no giant-array
        dynamic_update_slices at all. Measured ~10% over the flat variant
        at N=32768 (43.7 vs 39.4 TFLOP/s)."""
        nb = -(-n_pad // w_max)
        widths = [min(w_max, n_pad - c * w_max) for c in range(nb)]
        # columns materialize lazily: the first trailing subtract fuses the
        # slice-out of `a` with the GEMM epilogue, so no separate 2-GB-scale
        # split pass happens up front
        cols = [None] * nb

        def col_slice(c):
            return lax.dynamic_slice(a, (c * w_max, c * w_max),
                                     (n_pad - c * w_max, widths[c]))

        for p in range(nb):
            colp = cols[p] if cols[p] is not None else col_slice(p)
            wp = widths[p]
            ld = lax.linalg.cholesky(colp[:wp], symmetrize_input=False)
            if colp.shape[0] > wp:
                b = rtrsm(colp[wp:], ld, wp)
                cols[p] = jnp.concatenate([jnp.tril(ld), b], axis=0)
            else:
                cols[p] = jnp.tril(ld)
                continue
            for c in range(p + 1, nb):
                off = (c - p - 1) * w_max
                pc = lax.dynamic_slice(b, (off, 0), (b.shape[0] - off, wp))
                pcc = lax.dynamic_slice(b, (off, 0), (widths[c], wp))
                base = cols[c] if cols[c] is not None else col_slice(c)
                cols[c] = _sub_matmul(base, pc, pcc, tb=True,
                                      precision=precision,
                                      pallas=pallas).astype(a.dtype)
        out = jnp.zeros_like(a)
        for c in range(nb):
            out = _dus(out, cols[c], c * w_max, c * w_max)
        return out

    return chol_flat if truncate else chol_cols


@functools.lru_cache(maxsize=32)
def _jitted_cholesky(n_pad, tile, truncate, panel_tiles, syrk_depth,
                     leaf_rows, inv_panel, precision, dtype, _compensated):
    # _compensated is only a cache key: _use_compensated reads the config at
    # trace time, so a toggled NpwConfig.compensated must retrace
    fn = fused_cholesky_fn(
        n_pad, tile, truncate=truncate, panel_tiles=panel_tiles,
        syrk_depth=syrk_depth, leaf_rows=leaf_rows, inv_panel=inv_panel,
        precision=precision, dtype=dtype,
    )
    return jax.jit(fn, donate_argnums=(0,))


def fused_cholesky(a: jax.Array, tile: int, *, truncate: int = 0,
                   panel_tiles: int = 8, syrk_depth: int = 3,
                   leaf_rows: int = 4096, inv_panel: bool = True,
                   precision=None) -> jax.Array:
    """One-call fused Cholesky on a flat padded array (donates its input)."""
    from numpywren_tpu.config import default_config

    if precision is None:
        precision = default_precision(a.dtype)
    fn = _jitted_cholesky(a.shape[0], tile, truncate, panel_tiles, syrk_depth,
                          leaf_rows, inv_panel, precision, a.dtype,
                          default_config().compensated)
    return fn(a)


# ---------------------------------------------------------------------------
# BDFAC (block bidiagonalization)
# ---------------------------------------------------------------------------

def _geqrf(panel):
    """Householder QR (V in the lower trapezoid + taus). jax only exports
    the primitive privately (lax.linalg.qr is built on it); fall back to it
    via the public qr_p lowering if the private name moves."""
    try:
        from jax._src.lax import linalg as _lxl

        return _lxl.geqrf(panel)
    except (ImportError, AttributeError):  # pragma: no cover - jax internals
        from jax.lax.linalg import qr  # noqa: F401  (no Householder form)

        raise NotImplementedError(
            "jax geqrf unavailable; fused bdfac requires Householder QR"
        )


def _wy_t(v, tau, precision):
    """Compact-WY block reflector: upper-triangular T with
    Q = I - V T V^T for unit-lower-trapezoidal V and Householder taus.
    Identity: T^{-1} = diag(1/tau) + striu(V^T V), so T is one small
    triangular solve instead of a column-by-column recurrence."""
    g = jnp.matmul(v.T, v, precision=precision)
    dinv = jnp.where(tau != 0, 1.0 / jnp.where(tau != 0, tau, 1.0), 1e30)
    m = jnp.triu(g, 1) + jnp.diag(dinv)
    eye = jnp.eye(v.shape[1], dtype=v.dtype)
    return lax.linalg.triangular_solve(m, eye, left_side=True, lower=False)


def _panel_qr_update(panel, trailing, precision, want_reflector=False):
    """QR-factor `panel` (rows x b) and apply the FULL orthogonal Q^T to
    `trailing` (rows x c) via the blocked reflector (two large GEMMs):
    returns (R, trailing') — plus the reflector ("wy", V, T) with
    H = I - V T V^T when want_reflector (the transform-accumulation hook
    for singular vectors: trailing' = H^T trailing, so B = ...H_k^T... A
    and the left accumulator applies P := P H_k)."""
    b = panel.shape[1]
    vr, tau = _geqrf(panel)
    r = jnp.triu(vr[:b])
    v = jnp.tril(vr, -1) + jnp.eye(vr.shape[0], b, dtype=vr.dtype)
    t = _wy_t(v, tau, precision)
    if trailing is not None and trailing.shape[1]:
        w1 = jnp.matmul(v.T, trailing, precision=precision)     # (b, c)
        w2 = jnp.matmul(t.T, w1, precision=precision)           # (b, c)
        trailing = trailing - jnp.matmul(v, w2, precision=precision)
    if want_reflector:
        return r, trailing, ("wy", v, t)
    return r, trailing


def _cholqr3s(p, precision):
    """Thin QR of tall `p` by shifted CholeskyQR3 (same scheme as
    fused_cholqr3s_fn, inlined for composition inside larger jits): the
    shifted first pass cannot break down — plain CholeskyQR(2) panels DO
    break down in practice: a random square diagonal block has kappa ~ n,
    and at tile 256 kappa^2 * eps_bf16x3 reaches O(1), which produced NaN
    Grams on real-TPU bdfac runs — and passes 2-3 restore eps-grade
    orthogonality, which the Yamamoto reflector (and hence sigma
    preservation) depends on. See _cholqr_adaptive for the pass policy."""
    return _cholqr_adaptive(p, precision, rows=False)


def _cholqr_adaptive(p, precision, rows: bool = False, max_passes: int = 8):
    """Adaptive CholeskyQR chain: thin QR (rows=False: p = q r, r upper
    b x b) or thin LQ (rows=True: p = l q, l lower b x b) of p by repeated
    Gram-Cholesky passes with shift-on-breakdown (_safe_gram_chol).

    Pass policy: always two passes (CholeskyQR2 — quadratic convergence
    gives eps-grade orthogonality whenever the plain factorizations
    succeed), then up to max_passes - 2 further passes, each under
    lax.cond firing ONLY if the previous pass needed a shift. One shifted
    pass contracts kappa^2 by ~4 u sqrt(m b) (linear convergence while
    shifted), so kappa ~ 1e6 in fp32 burns through ~4 shifted passes
    before the plain quadratic cleanup — while the well-conditioned
    common case (every panel of a typical bdfac/tsqr sweep) pays exactly
    CholeskyQR2 cost: the conditional passes are skipped at runtime (TPU
    executes one lax.cond branch), leaving only an identity-l in the
    factor composition."""
    b = p.shape[0] if rows else p.shape[1]
    eye = jnp.eye(b, dtype=p.dtype)

    def solve(l, x):
        if rows:
            return lax.linalg.triangular_solve(l, x, left_side=True, lower=True)
        return lax.linalg.triangular_solve(l, x, left_side=False, lower=True,
                                           transpose_a=True)

    def one(x, check_dev=False):
        """One Gram-Cholesky pass. The returned flag means CONVERGED when
        check_dev (iterate passes): the plain factorization succeeded AND
        the input Gram was already within 1e-3 of I — the regime where
        this pass's quadratic step lands at u-grade orthogonality. A bare
        plain-success is NOT enough: after a shifted pass the next plain
        pass succeeds on pivots while leaving kappa(q)^2*u-grade error
        (measured 0.12 ortho error on a kappa=1e6 triangular panel when
        the chain stopped there — the r2 policy's singular-vector bug)."""
        l, ok, dev = _safe_gram_chol(x, precision, rows=rows)
        flag = ok & (dev < 1e-3) if check_dev else ok
        return solve(l, x), l, flag

    def cleanup(x):
        """Pass over an ALREADY near-orthonormal iterate: its Gram is
        I + E with ||E|| <= kappa^2 u <= 4 u sqrt(m b) (the plain-pass
        pivot test guarantees this), so chol(I + E) = I + tril(E, -1)
        + diag(E)/2 to O(||E||^2) <= u — a VPU-only factorization that
        skips the cholesky custom-call entirely. Profiling showed those
        custom-calls were 31% of fused-bdfac runtime (~0.3 ms each, cost
        near-flat in size, ~60 calls per factorization)."""
        if rows:
            g = jnp.matmul(x, x.T, precision=precision)
        else:
            g = jnp.matmul(x.T, x, precision=precision)
        e = g - eye
        l = eye + jnp.tril(e, -1) + jnp.diag(0.5 * jnp.diagonal(e))
        ok = jnp.max(jnp.abs(e)) < 1e-2  # first-order regime check
        return solve(l, x), l, ok

    q, l, ok = one(p)
    ls = [l]
    q, l, ok = lax.cond(ok, cleanup, lambda x: one(x, True), q)
    ls.append(l)

    # conditional passes 3..max_passes, NESTED: a lax.cond costs ~10 ms
    # in pure buffer traffic on a 1M x 512 operand even when its taken
    # branch is the identity, so the common (converged) case must cross
    # ONE skipped cond, not max_passes - 2 of them
    def extra(q, ok, depth):
        if depth == 0:
            return (q,)

        def skip(q):
            return (q,) + tuple(eye for _ in range(depth))

        def run(q):
            q2, l2, ok2 = one(q, True)
            rest = extra(q2, ok2, depth - 1)
            return (rest[0], l2) + tuple(rest[1:])

        return lax.cond(ok, skip, run, q)

    out = extra(q, ok, max_passes - 2)
    q = out[0]
    ls.extend(out[1:])
    if rows:
        total = ls[0]
        for li in ls[1:]:
            total = jnp.matmul(total, li, precision=precision)
    else:
        total = ls[-1].T
        for li in reversed(ls[:-1]):
            total = jnp.matmul(total, li.T, precision=precision)
    return q, total


def _safe_gram_chol(x, precision, rows: bool = False):
    """Lower Cholesky factor of the Gram matrix G = x^T x (x x^T when
    rows=True), with SHIFT-ON-BREAKDOWN: factor G plainly; if that produced
    non-finite entries (G numerically indefinite), select the factorization
    of G + s I instead, s = 4 u sqrt(m b) ||G||_inf. Both factorizations
    are b x b — two tiny cholesky calls buy a branch-free lax-friendly
    select.

    Why this composition (every simpler one failed on real-TPU runs):
    - plain CholeskyQR2 panels break down: kappa(square random block) ~ n,
      kappa^2 u reaches O(1) at tile 256+ (NaN Grams in bdfac);
    - shifting PASS 1 ONLY (paper sCholQR3) caps kappa(Q1)^2 at
      ~s/sigma_min^2, which for kappa ~ 1e6 in fp32 still exceeds 1/u and
      breaks pass 2;
    - shifting EVERY pass unconditionally floors the final orthogonality
      error at ~shift level (~1e-2 observed at kappa = 1e5): a shifted
      pass converges linearly, an unshifted one quadratically.
    Shift-on-breakdown composes both: shifted only while the iterate is
    bad enough to break the plain factorization, quadratic cleanup after.
    The shift scales with ||G||_inf >= ||A||_2^2 (within sqrt(b)), NOT
    ||A||_F^2 — Frobenius overestimates by up to b, and the over-shift
    pushes the next pass's Gram eigenvalues to roundoff (2.8e-8 min-eig
    observed on bdfac's final square panel).

    "Breakdown" is judged by the PIVOTS, not just NaN: a numerically
    near-singular Gram can factor to finite garbage (observed at
    kappa = 1e5 on CPU: finite L, final orthogonality stuck at ~7e-3).
    The plain factorization is accepted only when
    min(diag(L))^2 > 4 u sqrt(m b) ||G||_inf — pivots above the Gram's
    own roundoff floor, the regime where CholeskyQR converges
    quadratically.

    Returns (l, ok, dev): ok=False means the shifted branch was taken;
    dev = max|G - I| is the iterate's distance from orthonormality (the
    adaptive chain's convergence criterion — free, G is already formed).
    The shifted factorization runs under lax.cond, so the common
    (well-conditioned) case pays for exactly one b x b cholesky."""
    if rows:
        g = jnp.matmul(x, x.T, precision=precision)
        b, m = x.shape
    else:
        g = jnp.matmul(x.T, x, precision=precision)
        m, b = x.shape
    u = jnp.finfo(jnp.float32).eps
    lam_max = jnp.max(jnp.sum(jnp.abs(g), axis=1))  # >= ||x||_2^2
    floor = 4.0 * u * (m * b) ** 0.5 * lam_max
    l_plain = lax.linalg.cholesky(g, symmetrize_input=True)
    pivots = jnp.diagonal(l_plain)
    ok = jnp.all(jnp.isfinite(l_plain)) & (jnp.min(pivots * pivots) > floor)
    dev = jnp.max(jnp.abs(g - jnp.eye(g.shape[0], dtype=g.dtype)))

    def reshifted():
        eye = jnp.eye(g.shape[0], dtype=g.dtype)
        return lax.linalg.cholesky(g + floor * eye, symmetrize_input=True)

    return lax.cond(ok, lambda: l_plain, reshifted), ok, dev


def _panel_qr_update_cholqr(panel, trailing, precision, want_reflector=False):
    """GEMM-only replacement for _panel_qr_update (VERDICT r1 #4): thin Q,R
    from shifted CholeskyQR3, then the FULL orthogonal factor as a Yamamoto
    basis-kernel reflector

        H = I - W S W^T,   W = Q Sigma - E,   S^{-1} = I - Sigma Q1^T,

    where E = leading b columns of I and Sigma = diag(-sign(Q1_ii)) keeps
    diag(S^{-1}) = 1 + |Q1_ii|. H is orthogonal with H E = Q Sigma
    exactly, so H^T panel = E (Sigma R) and
    H^T trailing = trailing - W S^T (W^T trailing): two large MXU GEMMs
    plus one small b x b solve. No Householder chain anywhere.

    SQUARE panels (rows == b) bypass the W form entirely: there Q1 = Q is
    fully orthogonal, so S^{-1} = I - Sigma Q^T can be arbitrarily
    ill-conditioned (measured cond 8e7 on the final panel of an R-factor
    input — the fp32 inv turned the accumulated P's orthogonality error
    into O(1)); but H = Q Sigma EXACTLY in that case, so the reflector is
    just the dense orthogonal factor."""
    b = panel.shape[1]
    q, r = _cholqr3s(panel, precision)
    if panel.shape[0] == b:
        sigma_sq = -jnp.where(jnp.diagonal(q[:b]) >= 0, 1.0,
                              -1.0).astype(q.dtype)
        h = q * sigma_sq[None, :]
        if trailing is not None and trailing.shape[1]:
            trailing = jnp.matmul(h.T, trailing, precision=precision)
        if want_reflector:
            return sigma_sq[:, None] * r, trailing, ("dense", h)
        return sigma_sq[:, None] * r, trailing
    q1 = q[:b]
    d = jnp.diagonal(q1)
    sigma = -jnp.where(d >= 0, 1.0, -1.0).astype(q.dtype)
    w = q * sigma[None, :]
    w = w.at[:b].add(-jnp.eye(b, dtype=q.dtype))
    s_inv = jnp.eye(b, dtype=q.dtype) - sigma[:, None] * q1.T
    if trailing is not None and trailing.shape[1]:
        # fold S into W once (b x b inverse + one skinny GEMM — S is
        # well-conditioned by the Sigma choice): applying S by LU-solve
        # against the full-width w1 ran at triangular-solve speed, not
        # GEMM speed, on every panel
        ws = jnp.matmul(w, jnp.linalg.inv(s_inv).T, precision=precision)
        w1 = jnp.matmul(w.T, trailing, precision=precision)      # (b, c)
        trailing = trailing - jnp.matmul(ws, w1, precision=precision)
    # H^T panel = E Sigma R: the factor's row block is Sigma R (still upper)
    if want_reflector:
        return sigma[:, None] * r, trailing, ("yam", w, s_inv)
    return sigma[:, None] * r, trailing


def _cholqr3s_rows(p, precision):
    """Row-form shifted CholeskyQR3: thin LQ of wide `p` (b x m) as
    p = l @ qr with l lower-triangular (b x b) and qr row-orthonormal
    (b x m). The exact mirror of _cholqr3s with the Gram taken as p p^T
    and the triangular solve from the left — no transpose of `p` is ever
    materialized (the MXU absorbs the transposition inside the GEMM)."""
    return _cholqr_adaptive(p, precision, rows=True)


def _panel_lq_update_cholqr(panel, body, precision, want_reflector=False):
    """Right-side mirror of _panel_qr_update_cholqr for the LQ sweep:
    LQ-factor the wide row `panel` (b x m) and apply the full orthogonal
    factor from the RIGHT to `body` (rows x m), entirely in row
    orientation — the transpose-and-reuse-the-QR-path alternative costs
    two full HBM passes per sweep step (materializing body.T in and
    body_t.T out), which profiling showed as a ~30% tax at n=8192.

    With qr (b x m) row-orthonormal from _cholqr3s_rows, the Yamamoto
    basis-kernel factor is H = I - W S W^T for W = qr^T Sigma - E
    (H E = qr^T Sigma exactly); panel H = [l Sigma, 0] and
    body H = body - (body W) S W^T, where every product against
    W = Wr^T rides the GEMM's transpose flag. Returns (l Sigma, body')."""
    b = panel.shape[0]
    qr_, l = _cholqr3s_rows(panel, precision)
    q1 = qr_[:, :b]  # (b, b): Q1^T in the column-form derivation
    d = jnp.diagonal(q1)
    sigma = -jnp.where(d >= 0, 1.0, -1.0).astype(qr_.dtype)
    wr = qr_ * sigma[:, None]          # (b, m): W^T
    wr = wr.at[:, :b].add(-jnp.eye(b, dtype=qr_.dtype))
    s_inv = jnp.eye(b, dtype=qr_.dtype) - sigma[:, None] * q1
    if body is not None and body.shape[0]:
        # fold S into W^T once (see _panel_qr_update_cholqr: LU-solving
        # against the full-width RHS ran at solve speed per panel)
        s_wr = jnp.matmul(jnp.linalg.inv(s_inv), wr, precision=precision)
        u1 = jnp.matmul(body, wr.T, precision=precision)   # (rows, b) = B W
        body = body - jnp.matmul(u1, s_wr, precision=precision)
    if want_reflector:
        return l * sigma[None, :], body, ("yam_t", wr, s_inv)
    return l * sigma[None, :], body


def _apply_reflector_right(x, refl, c0: int, precision):
    """x[:, c0:] := x[:, c0:] @ H for a panel reflector H — the transform
    accumulator's inner step (two large MXU GEMMs per panel, the cost the
    singular-vector path pays over sigma-only; VERDICT r2 missing #1).

    refl forms: ("wy", V, T): H = I - V T V^T (Householder compact-WY);
    ("yam", W, S_inv): H = I - W S W^T (Yamamoto basis kernel);
    ("yam_t", W^T, S_inv): same with W supplied transposed (row-form LQ);
    ("dense", H): the explicit b x b orthogonal factor (square panels,
    where the W form is ill-conditioned)."""
    kind = refl[0]
    sub = x[:, c0:]
    if kind == "dense":
        out = jnp.matmul(sub, refl[1], precision=precision)
        return jnp.concatenate([x[:, :c0], out], axis=1) if c0 else out
    if kind == "wy":
        _, v, t = refl
        xv = jnp.matmul(sub, v, precision=precision)             # (n, b)
        upd = jnp.matmul(xv, jnp.matmul(t, v.T, precision=precision),
                         precision=precision)
    elif kind == "yam":
        _, w, s_inv = refl
        xw = jnp.matmul(sub, w, precision=precision)             # (n, b)
        swt = jnp.matmul(jnp.linalg.inv(s_inv), w.T, precision=precision)
        upd = jnp.matmul(xw, swt, precision=precision)
    else:  # "yam_t": W^T given
        _, wr, s_inv = refl
        xw = jnp.matmul(sub, wr.T, precision=precision)          # (n, b)
        swr = jnp.matmul(jnp.linalg.inv(s_inv), wr, precision=precision)
        upd = jnp.matmul(xw, swr, precision=precision)
    return jnp.concatenate([x[:, :c0], sub - upd], axis=1) if c0 else sub - upd


def fused_bdfac_fn(n_pad: int, tile: int, *, precision=None,
                   dtype=jnp.float32, panel_method: str = None,
                   accumulate: bool = False) -> Callable:
    """Jittable block bidiagonalization over a flat padded array (the fused
    lowering of algs.bdfac): per block column, a tall QR with full-Q
    trailing update (two MXU GEMMs), then a wide LQ (QR of the transpose)
    on the row panel when >= 2 superdiagonal blocks remain — LAPACK gebrd
    at block granularity. Returns fn(a) -> B (block upper bidiagonal with
    the singular values of a).

    panel_method: "cholqr" (default) factors panels by shifted CholeskyQR3 + a
    Yamamoto basis-kernel reflector — GEMM-only, the perf path; "house"
    uses Householder geqrf + compact-WY — sequential but unconditionally
    stable (use for kappa(panel) >~ 1/sqrt(eps) inputs). Env override:
    NPW_BDFAC_PANEL.

    accumulate=True additionally accumulates the sweep transforms and
    returns fn(a) -> (B, P, Q) with A = P B Q^T (P, Q orthogonal n x n):
    each panel reflector is applied to the accumulator's live column block
    (two large MXU GEMMs per panel — ~+4n^3 flops over the 8n^3/3
    reduction, LAPACK's usual with-vectors multiple). This is the
    singular-VECTOR path: svd(B) = Ub S Vb^T gives A = (P Ub) S (Q Vb)^T."""
    if n_pad % tile != 0:
        raise ValueError(f"n_pad {n_pad} not a multiple of tile {tile}")
    g = n_pad // tile
    if precision is None:
        precision = default_precision(dtype)
    if panel_method is None:
        import os

        panel_method = os.environ.get("NPW_BDFAC_PANEL", "cholqr")
    if panel_method not in ("cholqr", "house"):
        raise ValueError(f"unknown bdfac panel_method {panel_method!r}")
    panel_update = (_panel_qr_update_cholqr if panel_method == "cholqr"
                    else _panel_qr_update)

    def bdfac(a):
        # the live trailing matrix shrinks by one block per step and is
        # carried as a VALUE (static per-step shapes from the unroll):
        # round-tripping updates through the full (n, n) array cost one
        # whole-array read+write per step (profiled ~10 ms of pure HBM
        # traffic at 8192/512 — the f32[8192,8192] write-back fusions)
        out = jnp.zeros_like(a)
        cur = a
        p_acc = jnp.eye(n_pad, dtype=a.dtype) if accumulate else None
        q_acc = jnp.eye(n_pad, dtype=a.dtype) if accumulate else None
        for k in range(g):
            c0, c1 = k * tile, (k + 1) * tile
            rows = n_pad - c0
            panel = cur[:, :tile]
            trailing = cur[:, tile:] if rows > tile else None
            if accumulate:
                r, trailing, refl = panel_update(panel, trailing, precision,
                                                 True)
                p_acc = _apply_reflector_right(p_acc, refl, c0, precision)
            else:
                r, trailing = panel_update(panel, trailing, precision)
            out = _dus(out, r.astype(out.dtype), c0, c0)
            if rows == tile:
                break
            if g - k - 1 >= 2:
                row_pan, body = trailing[:tile], trailing[tile:]
                if panel_method == "cholqr":
                    # row-form LQ: no body.T / body_t.T materialization
                    if accumulate:
                        l_blk, body2, reflr = _panel_lq_update_cholqr(
                            row_pan, body, precision, True
                        )
                        q_acc = _apply_reflector_right(q_acc, reflr, c1,
                                                       precision)
                    else:
                        l_blk, body2 = _panel_lq_update_cholqr(
                            row_pan, body, precision
                        )
                else:
                    # Householder path: LQ on the row panel = QR of its
                    # transpose
                    if accumulate:
                        l_t, body_t, reflr = panel_update(
                            row_pan.T, body.T, precision, True
                        )
                        q_acc = _apply_reflector_right(q_acc, reflr, c1,
                                                       precision)
                    else:
                        l_t, body_t = panel_update(row_pan.T, body.T,
                                                   precision)
                    l_blk, body2 = l_t.T, body_t.T
                out = _dus(out, l_blk.astype(out.dtype), c0, c1)
                cur = body2
            else:
                # single superdiagonal block: lands in out as-is
                out = _dus(out, trailing[:tile].astype(out.dtype), c0, c1)
                cur = trailing[tile:]
        if accumulate:
            return out, p_acc, q_acc
        return out

    return bdfac


@functools.lru_cache(maxsize=16)
def _jitted_bdfac(n_pad, tile, precision, dtype, panel_method, donate,
                  accumulate=False):
    return jax.jit(fused_bdfac_fn(n_pad, tile, precision=precision,
                                  dtype=dtype, panel_method=panel_method,
                                  accumulate=accumulate),
                   donate_argnums=(0,) if donate else ())


def fused_bdfac(a: jax.Array, tile: int, *, precision=None,
                panel_method: str = None, donate: bool = False,
                accumulate: bool = False):
    """donate=True lets XLA run the in-place sweeps without the defensive
    input copy (profiled at ~2.4 ms on 8192^2) — pass it when the caller
    owns `a` and will not reuse it. accumulate=True returns (B, P, Q) with
    A = P B Q^T (the singular-vector path)."""
    if precision is None:
        precision = default_precision(a.dtype)
    if panel_method is None:
        import os

        panel_method = os.environ.get("NPW_BDFAC_PANEL", "cholqr")
    return _jitted_bdfac(a.shape[0], tile, precision, a.dtype, panel_method,
                         donate, accumulate)(a)


# ---------------------------------------------------------------------------
# GEMM
# ---------------------------------------------------------------------------

def fused_gemm(a: jax.Array, b: jax.Array, *, precision=None) -> jax.Array:
    if precision is None:
        precision = default_precision(a.dtype)
    return _matmul(a, b, precision=precision)


# ---------------------------------------------------------------------------
# TSQR
# ---------------------------------------------------------------------------

def fused_cholqr2_fn(compute_q: bool = False, precision=None,
                     dtype=jnp.float32) -> Callable:
    """CholeskyQR2: the MXU-native tall-skinny QR. XLA's Householder QR runs
    at ~2 TFLOP/s on TPU (panel-bound); CholeskyQR is two GEMMs + one tiny
    b x b Cholesky, and doubling it (QR2) restores fp32-grade orthogonality
    (classic result: one pass loses kappa(A)^2 digits in the Gram matrix,
    the second pass starts from kappa ~ 1). Requires kappa(A) well below
    ~1/sqrt(eps_work); the tree path (fused_tsqr_fn) covers the rest.

    Returns fn(a) -> R (or (Q, R)) for a tall-skinny (m, b) array."""
    if precision is None:
        precision = default_precision(dtype)

    def one_pass(x):
        g = jnp.matmul(x.T, x, precision=precision)
        l = lax.linalg.cholesky(g, symmetrize_input=False)
        w = lax.linalg.triangular_solve(
            l, jnp.eye(l.shape[0], dtype=x.dtype), left_side=True, lower=True
        )
        q = jnp.matmul(x, w.T, precision=precision)  # X L^{-T}
        return q, l

    def f(a):
        q1, l1 = one_pass(a)
        q2, l2 = one_pass(q1)
        r = jnp.matmul(l2.T, l1.T, precision=precision)  # R = R2 R1
        return (q2, r) if compute_q else r

    return f


def fused_cholqr3s_fn(compute_q: bool = False, precision=None,
                      dtype=jnp.float32) -> Callable:
    """Shifted CholeskyQR3 (Fukaya/Kannan/Nakatsukasa/Yamamoto/Yanagisawa,
    "Shifted Cholesky QR for computing the QR factorization of
    ill-conditioned matrices", SISC 2020): the fast ROBUST tall-skinny QR.

    Pass 1 Cholesky-factors G + s I: the shift guarantees the Gram
    factorization cannot break down and caps kappa(Q1) at ~sqrt(s)/sigma_min
    — small enough that passes 2-3 (plain CholeskyQR x2) restore eps-grade
    orthogonality. A = Q R holds EXACTLY by construction in every pass
    (Q := X R^{-1}), so R3 R2 R1 is the R factor regardless of the shift.

    Shift policy: every pass uses the shift-on-breakdown Cholesky
    (_safe_gram_chol — shifted by s = 4 u sqrt(m b) ||G||_inf only when
    the plain factorization of that pass's Gram comes back non-finite).
    The paper's worst-case constant (11 u m b ||A||_2^2) is calibrated
    for fp64; at fp32 it over-shifts by orders of magnitude. Measured on
    the logspace-spectrum family: clean through kappa = 1e6, vs ~3e3 for
    plain CholeskyQR2. Beyond that the Householder tree remains the
    fallback.

    All passes are GEMM + small-Cholesky shaped; pass 3 runs under
    lax.cond only when a shift fired, so the well-conditioned common case
    costs exactly CholeskyQR2 (worst case ~1.5x, still ~13x faster than
    the Householder combine tree)."""
    if precision is None:
        precision = default_precision(dtype)

    def f(a):
        q, r = _cholqr_adaptive(a, precision, rows=False)
        return (q, r) if compute_q else r

    return f


def fused_tsqr_fn(n_leaves: int, tile_rows: int, b: int, *,
                  b_fac: int = 2, compute_q: bool = False, precision=None,
                  dtype=jnp.float32):
    """Jittable TSQR over the (n_leaves*tile_rows, b) flat array.

    Leaf QRs batched (vmapped geqrf onto the MXU), then a static b-ary
    combine tree: at each level the live R stack (m, b, b) groups b_fac
    consecutive blocks into stacked (b_fac*b, b) QRs, batched again —
    exactly the DSL `reducer` tree (algs.tsqr / the reference reducer's
    b_fac) with the whole level fused into one batched kernel. A lone
    tail block passes through; a tail group of 2..b_fac-1 blocks is
    zero-padded to a full group (QR of [Rs; 0] has the same R, and the
    padded Q slices are sliced away in the downward sweep), keeping every
    level one static-shape batched QR.

    Returns fn(a) -> R  (or (Q, R) when compute_q; Q reconstructed by the
    downward sweep of the combine factors, algs.tsqr_q).
    """
    if precision is None:
        precision = default_precision(dtype)
    if b_fac < 2:
        raise ValueError(f"b_fac must be >= 2, got {b_fac}")

    def tsqr(a):
        stack = a.reshape(n_leaves, tile_rows, b)
        q0, r = jnp.linalg.qr(stack, mode="reduced")  # batched leaf QR
        # (q, m_in, tail) per level for the Q downward sweep: q is the
        # (groups, b_fac*b, b) combine factor, m_in the live count entering
        # the level, tail 1 when one block passed through unfactored
        levels = []
        m = n_leaves
        while m > 1:
            full = m // b_fac
            rem = m - full * b_fac
            if rem == 1:
                body, tail = r[: full * b_fac], 1
            elif rem == 0:
                body, tail = r, 0
            else:  # ragged group: zero-pad to a full stack
                pad = jnp.zeros((b_fac - rem, b, b), r.dtype)
                body, tail = jnp.concatenate([r, pad], axis=0), 0
            g = body.shape[0] // b_fac
            stacked = body.reshape(g, b_fac * b, b)
            q, r2 = jnp.linalg.qr(stacked, mode="reduced")
            if tail:
                r2 = jnp.concatenate([r2, r[full * b_fac :]], axis=0)
            levels.append((q, m, tail))
            r = r2
            m = g + tail
        r_final = r[0]
        if not compute_q:
            return r_final
        # downward sweep: Z maps each leaf's local basis to the global one
        z = jnp.eye(b, dtype=a.dtype)[None]  # (1, b, b)
        for q, m_in, tail in reversed(levels):
            g = q.shape[0]
            # (g, b_fac*b, b) @ (g, b, b) -> per-child transforms, stacked
            z_child = jnp.matmul(q, z[:g], precision=precision)
            z_child = z_child.reshape(g * b_fac, b, b)[: m_in - tail]
            z = jnp.concatenate([z_child, z[g:]], axis=0) if tail else z_child
        q_full = jnp.matmul(q0, z, precision=precision)  # (leaves, rows, b)
        return q_full.reshape(n_leaves * tile_rows, b), r_final

    return tsqr


@functools.lru_cache(maxsize=32)
def _jitted_tsqr(n_leaves, tile_rows, b, compute_q, precision, dtype, method,
                 b_fac):
    if method == "cholqr2":
        fn = fused_cholqr2_fn(compute_q=compute_q, precision=precision, dtype=dtype)
    elif method == "cholqr3s":
        fn = fused_cholqr3s_fn(compute_q=compute_q, precision=precision, dtype=dtype)
    else:
        fn = fused_tsqr_fn(n_leaves, tile_rows, b, b_fac=b_fac,
                           compute_q=compute_q, precision=precision, dtype=dtype)
    return jax.jit(fn)


def fused_tsqr(a: jax.Array, tile_rows: int, *, compute_q: bool = False,
               precision=None, method: str = "tree", b_fac: int = 2):
    """Tall-skinny QR. method="cholqr2" (two GEMM passes — ~20x faster on
    the MXU than Householder, needs kappa(A) well below 1/sqrt(eps)),
    "cholqr3s" (shifted CholeskyQR3 — the fast ROBUST path, kappa up to
    ~1/eps at 1.5x cholqr2 cost), or "tree" (Householder combine tree —
    slow but unconditionally stable, the last-resort fallback). b_fac is
    the tree method's branching factor (reducer b_fac parity): wider
    nodes mean fewer, larger batched QR levels."""
    m, b = a.shape
    if m % tile_rows != 0:
        raise ValueError(f"rows {m} not a multiple of tile_rows {tile_rows}")
    if precision is None:
        precision = default_precision(a.dtype)
    fn = _jitted_tsqr(m // tile_rows, tile_rows, b, compute_q, precision,
                      a.dtype, method, b_fac)
    return fn(a)


# ---------------------------------------------------------------------------
# Program-level dispatch
# ---------------------------------------------------------------------------

def lower_fused(program) -> Optional[Callable[[], None]]:
    """Return a no-arg callable running `program` through its fused lowering,
    committing results into the bound TiledMatrices; None when the program's
    template has no fused specialization."""
    name = program.dag.template.name
    if name == "cholesky":
        inner = lambda: _run_fused_cholesky(program)  # noqa: E731
    elif name == "gemm":
        inner = lambda: _run_fused_gemm(program)  # noqa: E731
    elif name in ("tsqr", "tsqr_q") or name.startswith("tsqr_b"):
        inner = lambda: _run_fused_tsqr(program, compute_q=(name == "tsqr_q"))  # noqa: E731
    elif name == "bdfac":
        inner = lambda: _run_fused_bdfac(program)  # noqa: E731
    else:
        return None

    def run_and_commit():
        """Fused runners promote host-tier operands to HBM copies; the
        caller's ORIGINAL matrix handles must still see the results
        (reference semantics: writes land in the store the program was
        bound to). Copy computed blocks back and restore the handles."""
        import numpy as np

        originals = {nm: ba.matrix for nm, ba in program.matrices.items()}
        inner()
        for nm, orig in originals.items():
            cur = program.matrices[nm].matrix
            if cur is orig or getattr(orig, "storage", None) in ("hbm", "trapezoid"):
                continue
            if getattr(cur, "_freed", False):
                orig.free()  # scratch the runner released (reference free())
                continue
            for (i, j) in cur.block_idxs_exist:
                orig.put_block(np.asarray(cur.get_block(i, j)), i, j)
            program.matrices[nm].matrix = orig

    return run_and_commit


def _hbm(program, name):
    ba = program.matrices[name]
    if ba.matrix.storage != "hbm":
        ba.matrix = ba.matrix.to_hbm()
    return ba.matrix


def _hbm_budget_bytes() -> int:
    """Usable HBM (fraction of the device limit per config.spill_threshold);
    generous fallback when the backend exposes no memory stats (CPU tests)."""
    from numpywren_tpu.config import default_config

    cfg = default_config()
    if cfg.hbm_budget_bytes:
        return int(cfg.hbm_budget_bytes * cfg.spill_threshold)
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
        if limit:
            return int(limit * cfg.spill_threshold)
    except Exception:
        pass
    return 1 << 62


def _run_fused_cholesky(program):
    s_ba = program.matrices["S"]
    # trapezoid tier: run natively on the column buffers (donating them) —
    # the flagship perf path, no flat array ever exists
    if getattr(s_ba.matrix, "storage", None) == "trapezoid":
        from numpywren_tpu.trapezoid import cholesky_trapezoid

        o_m = program.matrices["O"].matrix
        l_trap = cholesky_trapezoid(s_ba.matrix.trap)
        o_m.adopt(l_trap)
        s_ba.matrix.free()  # buffers were donated to the factorization
        return
    # out-of-HBM dispatch: a host-tier input too big for the chip streams
    # through runtime.spill instead of being promoted wholesale
    truncate0 = program.consts.get("truncate", 0)
    if s_ba.matrix.storage == "host" and truncate0 == 0:
        m = s_ba.matrix
        pm, pn = m.padded_shape
        # fused needs ~3 full copies resident (input+output+workspace)
        if 3 * pm * pn * m.dtype.itemsize > _hbm_budget_bytes():
            from numpywren_tpu.runtime.spill import out_of_core_cholesky

            o_host = program.matrices["O"].matrix
            if o_host.storage != "host":
                o_host = o_host.to_host()
                program.matrices["O"].matrix = o_host
            out_of_core_cholesky(m, out=o_host)
            return

    s = _hbm(program, "S")
    o = _hbm(program, "O")
    truncate = program.consts.get("truncate", 0)
    # the lowering's internal blocking is independent of the storage tile:
    # 128 is the measured sweet spot (BENCH.md panel sweep) whenever it
    # divides the padded size
    n_pad = s.padded_shape[0]
    inner = 128 if n_pad % 128 == 0 and truncate == 0 else s.tile[0]
    l = fused_cholesky(s.array, inner, truncate=truncate)
    if truncate == 0:
        o.replace_array(l)
        s.free()
    else:
        # prefix run: factored panels land in O, trailing matrix stays in S
        g = s.grid[0]
        k_done = g - truncate
        n_done = k_done * s.tile[0]
        mask_cols = jnp.arange(l.shape[1]) < n_done
        o.replace_array(jnp.where(mask_cols[None, :], jnp.tril(l), 0.0).astype(l.dtype))
        s.replace_array(jnp.where(mask_cols[None, :], 0.0, l).astype(l.dtype))


def _spill_if_over_budget(program, factor: int = 2) -> bool:
    """Host-tier operands whose wholesale promotion would exceed the HBM
    budget run through the streaming SpillTaskExecutor instead of OOMing
    (the cholesky runner has its own dedicated out-of-core path). Returns
    True when the program was executed that way."""
    total = 0
    any_host = False
    for ba in program.matrices.values():
        m = ba.matrix
        pm, pn = m.padded_shape
        total += pm * pn * m.dtype.itemsize
        any_host = any_host or m.storage != "hbm"
    if any_host and factor * total > _hbm_budget_bytes():
        from numpywren_tpu.runtime.executor import SpillTaskExecutor

        SpillTaskExecutor(program).run()
        return True
    return False


def _run_fused_bdfac(program):
    if _spill_if_over_budget(program):
        return
    s = _hbm(program, "S")
    b = _hbm(program, "B")
    out = fused_bdfac(s.array, s.tile[0])
    b.replace_array(out.astype(b.dtype))
    s.free()


def _run_fused_gemm(program):
    if _spill_if_over_budget(program):
        return
    a = _hbm(program, "A")
    b = _hbm(program, "B")
    c = _hbm(program, "C")
    c.replace_array(fused_gemm(a.array, b.array).astype(c.dtype))


def _run_fused_tsqr(program, compute_q: bool):
    if _spill_if_over_budget(program):
        return
    a = _hbm(program, "A")
    r_mat = _hbm(program, "R")
    n_leaves = program.consts["N"]
    depth = program.consts["L"]
    tile_rows = a.tile[0]
    b = a.tile[1]
    opts = getattr(program, "fused_options", {})
    method = opts.get("tsqr_method", "tree")
    b_fac = opts.get("b_fac", 2)
    arr = a.array[: n_leaves * tile_rows, :b]
    if compute_q:
        q_arr, r_final = fused_tsqr(arr, tile_rows, compute_q=True,
                                    method=method, b_fac=b_fac)
        q_mat = _hbm(program, "Q")
        pad = jnp.zeros(q_mat.padded_shape, q_mat.dtype)
        q_mat.replace_array(lax.dynamic_update_slice(pad, q_arr.astype(q_mat.dtype), (0, 0)))
    else:
        r_final = fused_tsqr(arr, tile_rows, compute_q=False,
                             method=method, b_fac=b_fac)
    # final R lives at block (0, depth) of the R matrix (algs.tsqr layout)
    r_mat.put_block(r_final.astype(r_mat.dtype), 0, depth)
