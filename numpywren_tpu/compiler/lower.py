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
import os
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


def _cholqr3s(p, precision, conv_tol: float = 1e-4, small_precision=None,
              gemm_inv=None, pallas_chain=None):
    """Thin QR of tall `p` by shifted CholeskyQR3 (same scheme as
    fused_cholqr3s_fn, inlined for composition inside larger jits): the
    shifted first pass cannot break down — plain CholeskyQR(2) panels DO
    break down in practice: a random square diagonal block has kappa ~ n,
    and at tile 256 kappa^2 * eps_bf16x3 reaches O(1), which produced NaN
    Grams on real-TPU bdfac runs — and passes 2-3 restore eps-grade
    orthogonality, which the Yamamoto reflector (and hence sigma
    preservation) depends on. See _cholqr_adaptive for the pass policy."""
    return _cholqr_adaptive(p, precision, rows=False, conv_tol=conv_tol,
                            small_precision=small_precision,
                            gemm_inv=gemm_inv, pallas_chain=pallas_chain)


# Perf-ablation hook (experiments/onchip_r04b.py): tokens in this set stub
# parts of the panel chain with shape-preserving fakes to measure the
# GEMM/VPU floor. "factor" fakes the pass-1 cholesky+trisolve AND pins the
# chain's convergence flags (so the extras while_loop stays zero-trip and
# the pass-2 cond takes the cleanup branch — the same control flow as a
# converged real run). NEVER set outside ablation experiments: numerics are
# wrong by construction.
_ABLATE = frozenset()


def _cholqr_adaptive(p, precision, rows: bool = False, max_passes: int = 16,
                     conv_tol: float = 1e-4, small_precision=None,
                     psum_axes=None, global_m: int = None, gemm_inv=None,
                     pallas_chain=None):
    """Adaptive CholeskyQR chain: thin QR (rows=False: p = q r, r upper
    b x b) or thin LQ (rows=True: p = l q, l lower b x b) of p by repeated
    Gram-Cholesky passes with shift-on-breakdown.

    Pass policy: always two passes (CholeskyQR2 — quadratic convergence
    gives eps-grade orthogonality whenever the plain factorizations
    succeed), then up to max_passes - 2 further passes firing only until
    CONVERGED (plain success with the input Gram within conv_tol of I).
    One shifted pass contracts kappa^2 by ~4 u sqrt(m b) (linear
    convergence while shifted), so high kappa burns through several
    shifted passes before the plain quadratic cleanup — measured clean to
    kappa = 1e8 on-chip (ortho 2.3e-5 at 65536 x 256) — while the
    well-conditioned common case (every panel of a typical bdfac/tsqr
    sweep) pays exactly CholeskyQR2 cost. max_passes only bounds the
    while_loop (converged chains cross ONE zero-trip while op), so the
    default is sized for the worst supported case: the per-pass kappa
    contraction is ~sqrt(shift_rel) = ~2 (u^2 m b)^(1/4), which at
    m = 1M, b = 512 (shift_rel ~1e-2) needs ~9 shifted passes for
    kappa = 1e8 — max_passes=8 measurably exhausts there (on-chip ortho
    0.95), 16 leaves headroom.

    Lowering (profiled on-chip at 8192/512, where the non-GEMM op floor
    is the bdfac bottleneck):
    - each factoring pass is ONE always-shifted cholesky of
      G + 4 u sqrt(m b) ||G||_inf I — positive definite by construction,
      so there is NO pivot test, NO plain/shifted pair, and NO lax.cond
      around the factor (a cond cost ~0.2-0.35 ms/panel in buffer
      traffic; computing both factors branchlessly cost ~0.2 ms/panel of
      extra chol machinery). The ||G||_inf-scaled shift caps the NEXT
      Gram's deviation at ~shift/u_gram (< the 1e-2 cleanup regime) for
      ANY input kappa up to total breakdown, so
    - pass 2 onward selects the first-order cleanup factor
      chol(I+E) = I + tril(E,-1) + diag(E)/2 (pure VPU, no custom call)
      whenever dev = max|G - I| < 1e-2 — the common chain is exactly one
      cholesky call + one VPU cleanup per panel;
    - a pass whose INPUT dev < conv_tol is the last (its quadratic step
      lands at ~dev^2: bare plain success is NOT convergence — measured
      0.12 ortho on a kappa=1e6 panel when the r2 policy stopped there);
    - extra passes sit behind ONE lax.cond whose taken branch is a
      lax.while_loop with a single live iterate — the converged case
      crosses one skipped cond, and memory is CONSTANT in max_passes
      (nested conds at max_passes=8 on a 1M x 512 operand allocated
      16.5 G of 15.75 G HBM and OOM'd)."""
    b = p.shape[0] if rows else p.shape[1]
    # psum_axes (shard_map callers): the iterate is SHARDED along the
    # non-b axis and every REAL Gram is psum'd over these mesh axes —
    # nothing else changes, because all (b, b) algebra (shifted factors,
    # Neumann cleanup, folds, the analytic pass-2 Gram, the convergence
    # flag) is a pure function of the replicated Gram, so every device
    # takes identical extras-pass trips. global_m then supplies the TRUE
    # operand height for the shift constant (the local shape understates
    # it by the device count).
    m = global_m if global_m is not None else (
        p.shape[1] if rows else p.shape[0])
    eye = jnp.eye(b, dtype=p.dtype)
    u = jnp.finfo(jnp.float32).eps
    shift_c = 4.0 * u * (m * b) ** 0.5
    # b x b algebra precision (folds, analytic Gram updates, Neumann
    # series). Default HIGHEST: the composed R's accuracy rides on these
    # products (measured: HIGH smalls doubled the TSQR gate's resid to
    # ~1e-4 at 65536 x 256). Callers whose error budget tolerates
    # bf16x3-grade folds (fused bdfac: sigma bar 1e-4, ~31 panels whose
    # b x b op time is pure overhead) pass HIGH — at tile 1024 the
    # HIGHEST smalls alone cost ~2 ms/panel (hlo_stats, 8192/1024)
    hp = small_precision or jax.lax.Precision.HIGHEST
    # a pass whose INPUT deviation is below this lands under conv_tol
    # after its quadratic step (out <= dev^2 / 4, hence gate =
    # 2 sqrt(tol)): predicting convergence from the input dev replaces
    # the analytic post-Gram check — two fewer b x b GEMMs + a reduction
    # per panel, same fidelity (neither sees the big apply's own
    # roundoff; that floor is the working-precision orthogonality grade
    # the chain targets anyway)
    conv_gate = min(2.0 * float(conv_tol) ** 0.5, 1e-1)
    if gemm_inv is None:  # None = the NPW_GEMM_INV env default (callers
        # that key jit caches on it pass an explicit bool)
        gemm_inv = _gemm_only_inv()

    def gram_dev(x):
        if rows:
            g = jnp.matmul(x, x.T, precision=precision)
        else:
            g = jnp.matmul(x.T, x, precision=precision)
        if psum_axes is not None:
            g = lax.psum(g, psum_axes)
        e = g - eye
        return g, e, jnp.max(jnp.abs(e))

    def shifted_linv(g, extra_floor=0.0):
        """Always-shifted factor + its EXPLICIT b x b triangular inverse
        (the MAGMA trick, as in fused_cholesky's inv_panel): the chain
        then applies L^{-1} by one MXU GEMM instead of a blocked
        triangular solve against the full (m, b) iterate — the solve's
        diag-block-invert machinery runs on the big operand, the trtri
        here on b x b only. chol(G + s I) with s = 4 u sqrt(m b)
        ||G||_inf is PD by construction: no pivot test, no plain/shifted
        pair, no cond around the factor."""
        floor = shift_c * jnp.max(jnp.sum(jnp.abs(g), axis=1)) + extra_floor
        gs = g + floor * eye
        # NPW_PALLAS_FACTOR=1 opts into the fused Pallas (L, L^{-1})
        # kernel (ops/pallas_factor.potrf_inv_pallas). Measured on-chip at
        # 8192/512: 46.7 ms vs 44.3 ms for the XLA pair — the kernel's
        # 128-row masked-select factor loop is sequential-depth-bound, so
        # it does NOT beat the custom calls here; kept as an opt-in for
        # future hardware where call latency dominates.
        if on_tpu():
            if os.environ.get("NPW_PALLAS_FACTOR", "0") == "1":
                from numpywren_tpu.ops.pallas_factor import potrf_inv_pallas

                try:
                    return potrf_inv_pallas(0.5 * (gs + gs.T))
                except Exception:
                    pass
        if "factor" in _ABLATE:  # perf ablation: keep the VPU shift work,
            # drop only the two custom calls (see _ABLATE)
            return jnp.tril(gs), eye + 1e-24 * gs
        l = lax.linalg.cholesky(gs, symmetrize_input=True)
        if gemm_inv:  # GEMM-only trtri, one custom call (the chol) per
            # factoring pass instead of two
            return l, _trtri_gemm(l, hp)
        linv = lax.linalg.triangular_solve(l, eye, left_side=True,
                                           lower=True)
        return l, linv

    def neumann_linv(e):
        """First-order-cleanup factor and its GEMM-only inverse: no
        cholesky call, no triangular machinery at all. With
        M = tril(E,-1) + diag(E)/2, the applied inverse is the 4-term
        Neumann/Horner series linv = I - M + M^2 - M^3, whose EXACT
        inverse is (I + M)(I - M^4)^{-1}; folding
        l = I + M + M^4(I + M) keeps the R composition consistent to
        O(||M||^8) — so the cleanup regime safely extends to
        ||E|| <= 0.1 (on-chip, the analytic pass-2 deviation at 1M x 512
        measures 2.6e-2: a 1e-2 gate there forced real-Gram extras and a
        10x slowdown; accuracy is guarded by the conv gate, not this
        one)."""
        m_ = jnp.tril(e, -1) + jnp.diag(0.5 * jnp.diagonal(e))
        m2 = jnp.matmul(m_, m_, precision=hp)
        ip2 = eye + m2
        linv = ip2 - jnp.matmul(ip2, m_, precision=hp)   # (I+M^2)(I-M)
        m4 = jnp.matmul(m2, m2, precision=hp)
        l = jnp.matmul(eye + m4, eye + m_, precision=hp)  # (I+M^4)(I+M)
        return l, linv

    def apply_linv(x, linv):
        if rows:
            return jnp.matmul(linv, x, precision=precision)
        return jnp.matmul(x, linv.T, precision=precision)

    def iterate_pass(x):
        """Extras pass: first-order cleanup in the near-orthonormal
        regime, full shifted factor otherwise. The lax.cond carries ONLY
        b x b values (the factor and its inverse) — the profiled
        0.2-0.35 ms/panel cond cost came from shuffling the (m, b)
        iterate through branch buffers; the big-operand application
        happens outside."""
        g, e, dev = gram_dev(x)
        l, linv = lax.cond(dev < 1e-1,
                           lambda e_, g_: neumann_linv(e_),
                           lambda e_, g_: shifted_linv(g_),
                           e, g)
        conv_p = dev < conv_gate  # this pass's quadratic step lands < tol
        return apply_linv(x, linv), l, conv_p

    def small_gram_update(g, linv):
        """G' = L^{-1} G L^{-T}: the NEXT pass's Gram analytically from
        the current one — two b x b GEMMs instead of a (m, b)-operand
        Gram. This misses the big apply's own roundoff (~eps_gemm
        sqrt(b)), which is exactly the orthogonality grade the chain
        lands at anyway in working precision; the rare extras passes
        recompute real Grams. ALWAYS at HIGHEST regardless of
        small_precision: the convergence decision reads dev off this
        product, and bf16x3 roundoff here floors the analytic dev at
        ~1e-2 (measured on-chip at 8192 x 512: dev2 6.9e-3 vs a REAL
        post-chain dev of 7.6e-5), which forced a wasted real-Gram
        extras pass on EVERY well-conditioned panel. Two b x b GEMMs at
        HIGHEST are microseconds; it also keeps err2's fp32-eps bound
        honest."""
        hi = jax.lax.Precision.HIGHEST
        return jnp.matmul(jnp.matmul(linv, g, precision=hi), linv.T,
                          precision=hi)

    # passes 1-2 with ONE big Gram and ONE big apply: pass 2's Gram comes
    # from small_gram_update, and the two inverse factors fold into a
    # single b x b transform applied to the original operand — halving
    # the chain's large-operand GEMMs (4 m b^2 flops total, CholeskyQR1
    # cost, vs CholeskyQR2's 8 m b^2)
    g1, _, _ = gram_dev(p)

    # NPW_PALLAS_CHAIN=1 opts the pass-1-2 fold path into the ONE-LAUNCH
    # Pallas chain kernel (ops/pallas_factor.cholqr2_chain_pallas):
    # shifted factor + explicit inverse + analytic Gram + cleanup/full
    # pass 2 + folded inverse + the big apply, all in a single kernel —
    # the VERDICT r4 #5 lever (collapse the per-panel custom-call bill
    # into one dispatch). Semantics are identical to the lines below; the
    # extras while_loop is shared. Measured numbers in BENCH.md round 5.
    if pallas_chain is None:  # None = the env default (callers that key
        # jit caches on it pass an explicit bool, like gemm_inv)
        pallas_chain = os.environ.get("NPW_PALLAS_CHAIN", "0") == "1"
    _chained = False
    if psum_axes is None and not _ABLATE and pallas_chain:
        from numpywren_tpu.ops.pallas_factor import (chain_supported,
                                                     cholqr2_chain_pallas)

        mm = p.shape[1] if rows else p.shape[0]
        if chain_supported(mm, b, p.dtype):
            q, total, conv, _dev2 = cholqr2_chain_pallas(
                g1, p, rows=rows, shift_c=float(shift_c),
                conv_gate=float(conv_gate), precision=precision)
            _chained = True

    # incremental composition of the R factor: rows form p = L1 L2 ... q
    # folds on the right; column form p = q (Lk^T ... L1^T) folds new
    # factors on the LEFT of the running product
    if rows:
        def fold(total, li):
            return jnp.matmul(total, li, precision=hp)
    else:
        def fold(total, li):
            return jnp.matmul(li.T, total, precision=hp)

    if not _chained:
        l1, linv1 = shifted_linv(g1)
        g2 = small_gram_update(g1, linv1)
        e2 = g2 - eye
        dev2 = jnp.max(jnp.abs(e2))
        if "factor" in _ABLATE:  # pin the converged-run control flow:
            # cleanup branch on pass 2, zero-trip extras while (see _ABLATE)
            dev2 = jnp.float32(0.0)
        # the analytic G2 is NOT a real Gram: its fp roundoff
        # (~u ||L1^{-1}||^2 ||G1||) can push a near-singular G2 indefinite
        # and NaN the chol (observed at kappa=1e6, b=16) — shift past that
        rb1 = jnp.max(jnp.sum(jnp.abs(linv1), axis=1))
        err2 = 3.0 * u * rb1 * rb1 * jnp.max(jnp.sum(jnp.abs(g1), axis=1))
        l2, linv2 = lax.cond(dev2 < 1e-1,
                             lambda e_, g_: neumann_linv(e_),
                             lambda e_, g_: shifted_linv(g_, err2),
                             e2, g2)
        linv_tot = jnp.matmul(linv2, linv1, precision=hp)
        # converged ONLY via the cleanup branch: a shifted pass 2 carries
        # the err2-inflated shift in its factor, so such panels must fall
        # through to the real-Gram extras, which correct everything the
        # analytic path cannot see (measured: stopping there cost
        # 1e-4-grade absolute sigma error on moderately conditioned
        # panels). Within the cleanup branch the input dev predicts the
        # output: dev2 < conv_gate => out < tol.
        conv = dev2 < conv_gate
        q = apply_linv(p, linv_tot)
        total = fold(l1, l2) if rows else fold(l1.T, l2)

    if max_passes <= 2:
        return q, total

    def w_cond(carry):
        _, _, cv, i = carry
        return jnp.logical_and(jnp.logical_not(cv), i < max_passes - 2)

    def w_body(carry):
        qc, tot, _, i = carry
        q2, li, conv2 = iterate_pass(qc)
        return (q2, fold(tot, li), conv2, i + 1)

    # ONE while whose initial flag already encodes pass-2 convergence:
    # the converged common case crosses a single zero-trip while op
    # (~50 us) instead of the previous big-operand cond + nested while
    # (~140 us/panel, hlo_stats at 8192/512 — the identity branch still
    # shuffles the (m, b) iterate through branch buffers)
    out = lax.while_loop(w_cond, w_body, (q, total, conv, jnp.int32(0)))
    return out[0], out[1]


def _gemm_only_inv() -> bool:
    """Opt-in (NPW_GEMM_INV=1, read at TRACE time like NPW_PALLAS_FACTOR —
    set it before the first fused_bdfac call of the process) replacement of
    the panel chain's non-chol custom calls with GEMM-only algebra:
    triangular inverses by exact nilpotent doubling (_trtri_gemm) and the
    Yamamoto S factor by Newton-Schulz (_ns_inv). Motivation: on-chip
    profiling (experiments/onchip_r04b, 2026-08-18) shows each XLA
    custom call inside a fused program costs ~0.1-0.45 ms nearly flat in
    size, while a 512^3 GEMM is ~5-10 us of MXU time — at 8192/512 fused
    bdfac runs ~150 factor-adjacent custom calls (5 per panel x ~30
    panels), a double-digit-ms latency floor that pure-GEMM algebra
    removes (VERDICT r3 #1)."""
    import os

    return os.environ.get("NPW_GEMM_INV", "0") == "1"


def _trtri_gemm(l, precision):
    """Exact lower-triangular inverse by nilpotent Neumann doubling — GEMMs
    only, no triangular_solve custom call. Write L = D (I + N) with
    D = diag(L) and N strictly lower (nilpotent of index b):
    (I + N)^{-1} = sum_{k<b} (-N)^k, computed by log2(b) doubling steps
    S_{m+1} = S_m + P_m S_m, P_{m+1} = P_m^2 with P_1 = N^2 — exact in
    exact arithmetic after ceil(log2(b)) steps because N^b = 0. One
    Newton-polish step X <- X + X (I - L X) then quadratically kills the
    fp rounding of the doubling chain (growth is bounded: the chain's
    shifted Grams keep kappa(L) <= ~sqrt(1/shift_rel) ~ 33, so
    ||N^k|| decays). 2 ceil(log2(b)) + 2 b^3-GEMMs total — ~0.09 ms of
    MXU work at b=512 vs a ~0.3-0.8 ms triangular_solve custom call."""
    b = l.shape[0]
    eye = jnp.eye(b, dtype=l.dtype)
    dinv = 1.0 / jnp.diagonal(l)
    n_ = l * dinv[:, None] - eye          # strictly lower, nilpotent
    s = eye - n_                           # sum_{k<2}
    p = jnp.matmul(n_, n_, precision=precision)   # (-N)^2
    steps = max((b - 1).bit_length() - 1, 0)      # 2^(1+steps) >= b
    for _ in range(steps):
        s = s + jnp.matmul(p, s, precision=precision)
        p = jnp.matmul(p, p, precision=precision)
    linv = s * dinv[None, :]               # (I+N)^{-1} D^{-1}
    resid = eye - jnp.matmul(l, linv, precision=precision)
    return linv + jnp.matmul(linv, resid, precision=precision)


def _ns_inv(a, precision, iters: int = 20):
    """Newton-Schulz inverse of a (b, b) matrix — GEMMs only, no LU/chol
    custom calls: X_{k+1} = X_k (2 I - A X_k), X_0 = A^T / (||A||_1
    ||A||_inf). Quadratic once ||I - A X|| < 1; the X_0 scaling makes the
    initial residual spectrum 1 - sigma_i^2/(||A||_1 ||A||_inf) — the
    norm product overshoots sigma_max^2 by up to b, but the overshoot
    only costs log2 extra doublings. Measured iteration demand (err
    < 1e-6): 19 at b=512 cond=25, 15 at cond=5 — default 20 covers the
    Yamamoto W1 regime (cond(W1) <= ~25 measured;
    _panel_qr_update_cholqr docstring) with one to spare."""
    b = a.shape[0]
    two_eye = 2.0 * jnp.eye(b, dtype=a.dtype)
    scale = 1.0 / (jnp.max(jnp.sum(jnp.abs(a), axis=0))
                   * jnp.max(jnp.sum(jnp.abs(a), axis=1)))
    x = a.T * scale
    for _ in range(iters):
        x = jnp.matmul(x, two_eye - jnp.matmul(a, x, precision=precision),
                       precision=precision)
    return x


def _small_inv_t(w1, precision, gemm_inv=None):
    """inv(s_inv) = S for the Yamamoto factor via the EXACT identity
    s_inv = -W1^T (W1 = the reflector's leading b x b block: check
    -(Q1 Sigma - I)^T = I - Sigma Q1^T), computed by Cholesky normal
    equations: (W1^T)^{-1} = W1 (W1^T W1)^{-1}, so S = -W1 C^{-1} with
    C = W1^T W1 SPD. One b x b GEMM + one cholesky + two b x b triangular
    solves — profiling showed jnp.linalg.inv's blocked pivoted LU
    (LuDecompositionBlock, ~0.11 ms/call) plus its diag-block inverts at
    ~7.5 ms/step of fused bdfac@8192/512, vs ~14 us for a cholesky call.
    Conditioning: cond(C) = cond(W1)^2 — fine for the tall panels this
    serves (cond(W1) <= ~25 measured); the accumulate (singular-vector)
    path keeps the exact LU inverse.

    NPW_GEMM_INV=1 replaces the chol + two solves (THREE custom calls)
    with Newton-Schulz directly on W1 (see _ns_inv) — same cond(W1)^2
    sensitivity through the squared singular-value spectrum, zero custom
    calls. -W1^{-1} = S^T identically (S^{-1} = -W1^T)."""
    if gemm_inv if gemm_inv is not None else _gemm_only_inv():
        return -_ns_inv(w1, precision)
    c = jnp.matmul(w1.T, w1, precision=precision)
    lc = lax.linalg.cholesky(c, symmetrize_input=True)
    # ONE trisolve (identity RHS -> explicit L^{-1}) + two b x b GEMMs
    # instead of two b x b-RHS trisolves: custom calls inside fused
    # programs cost ~0.1 ms nearly flat in size (on-chip ablation,
    # experiments/onchip_r04b 2026-08-19: the 3-call _small_inv_t is
    # 5.8 ms of the 45.6 ms bdfac@8192/512) while a 512^3 GEMM is ~10 us,
    # so trading one call for two GEMMs saves ~0.1 ms per panel. Same
    # normal-equations conditioning; GEMM roundoff (bf16x3 ~4e-6 rel at
    # HIGH) is far inside the sigma path's 1e-4 bar.
    cinv = lax.linalg.triangular_solve(lc, jnp.eye(w1.shape[0],
                                                   dtype=w1.dtype),
                                       left_side=True, lower=True)
    y = jnp.matmul(cinv, w1.T, precision=precision)
    return -jnp.matmul(cinv.T, y, precision=precision)  # = -C^{-1} W1^T = S^T


def _panel_qr_update_cholqr(panel, trailing, precision, want_reflector=False,
                            conv_tol: float = 1e-4, fast_s: bool = False,
                            small_precision=None, gemm_inv=None,
                            pallas_chain=None):
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
    q, r = _cholqr3s(panel, precision, conv_tol=conv_tol,
                     small_precision=small_precision, gemm_inv=gemm_inv,
                     pallas_chain=pallas_chain)
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
        # GEMM speed, on every panel. fast_s replaces the LU inverse with
        # the chol-normal-equations form (see _small_inv_t).
        if fast_s:
            st = _small_inv_t(w[:b], small_precision or precision,
                              gemm_inv=gemm_inv)  # S^T
        else:
            st = jnp.linalg.inv(s_inv).T
        w1 = jnp.matmul(w.T, trailing, precision=precision)      # (b, c)
        # apply S on the NARROW side: S^T w1 is (b, b) @ (b, c) — folding
        # S into W instead costs 2 m b^2 > 2 b^2 c (hlo_stats: the W-fold
        # was one extra large-GEMM launch per panel)
        sw1 = jnp.matmul(st, w1, precision=precision)            # (b, c)
        trailing = trailing - jnp.matmul(w, sw1, precision=precision)
    # H^T panel = E Sigma R: the factor's row block is Sigma R (still upper)
    if want_reflector:
        return sigma[:, None] * r, trailing, ("yam", w, s_inv)
    return sigma[:, None] * r, trailing


def _cholqr3s_rows(p, precision, conv_tol: float = 1e-4,
                   small_precision=None, gemm_inv=None, pallas_chain=None):
    """Row-form shifted CholeskyQR3: thin LQ of wide `p` (b x m) as
    p = l @ qr with l lower-triangular (b x b) and qr row-orthonormal
    (b x m). The exact mirror of _cholqr3s with the Gram taken as p p^T
    and the triangular solve from the left — no transpose of `p` is ever
    materialized (the MXU absorbs the transposition inside the GEMM)."""
    return _cholqr_adaptive(p, precision, rows=True, conv_tol=conv_tol,
                            small_precision=small_precision,
                            gemm_inv=gemm_inv, pallas_chain=pallas_chain)


def _panel_lq_update_cholqr(panel, body, precision, want_reflector=False,
                            conv_tol: float = 1e-4, fast_s: bool = False,
                            small_precision=None, gemm_inv=None,
                            pallas_chain=None):
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
    qr_, l = _cholqr3s_rows(panel, precision, conv_tol=conv_tol,
                            small_precision=small_precision,
                            gemm_inv=gemm_inv, pallas_chain=pallas_chain)
    q1 = qr_[:, :b]  # (b, b): Q1^T in the column-form derivation
    d = jnp.diagonal(q1)
    sigma = -jnp.where(d >= 0, 1.0, -1.0).astype(qr_.dtype)
    wr = qr_ * sigma[:, None]          # (b, m): W^T
    wr = wr.at[:, :b].add(-jnp.eye(b, dtype=qr_.dtype))
    s_inv = jnp.eye(b, dtype=qr_.dtype) - sigma[:, None] * q1
    if body is not None and body.shape[0]:
        # fold S into W^T once (see _panel_qr_update_cholqr: LU-solving
        # against the full-width RHS ran at solve speed per panel). Row
        # form: s_inv_row = I - Sigma q1 = -wr1 for wr1 = wr[:, :b], so
        # S_row = -wr1^{-1} = (C^{-1} wr1^T)... = _small_inv_t(wr1^T)^T
        if fast_s:
            s_row = _small_inv_t(wr[:, :b].T,
                                 small_precision or precision,
                                 gemm_inv=gemm_inv).T  # = S_row
        else:
            s_row = jnp.linalg.inv(s_inv)
        u1 = jnp.matmul(body, wr.T, precision=precision)   # (rows, b) = B W
        # narrow-side S application (see _panel_qr_update_cholqr): fold S
        # into the (rows, b) projection, not the (b, m) row basis
        u1s = jnp.matmul(u1, s_row, precision=precision)   # (rows, b)
        body = body - jnp.matmul(u1s, wr, precision=precision)
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
                   accumulate: bool = False,
                   accum_precision=None, gemm_inv: bool = None,
                   pallas_chain: bool = None) -> Callable:
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
        panel_method = os.environ.get("NPW_BDFAC_PANEL", "cholqr")
    if panel_method not in ("cholqr", "house"):
        raise ValueError(f"unknown bdfac panel_method {panel_method!r}")
    # panel-chain convergence tolerance (a bound on each factor's OUTPUT
    # Gram deviation): sweeps that are orthogonal to 1e-5 keep sigma to
    # ~1e-5 absolute and the vector accumulators eps-grade; typical tall
    # panels converge analytically at this tolerance in two passes, and
    # only near-square / ill-conditioned panels pay real extra passes
    conv_tol = 1e-5
    # fast_s: chol-normal-equations S application (no LU) — the sigma-only
    # perf path; the vector path keeps the exact LU inverse (cond(W1)^2
    # sensitivity would land in the accumulated P/Q)
    fast_s = not accumulate
    # b x b chain algebra at HIGH (bf16x3): a fold's 3.7e-6-grade error is
    # far inside the 1e-4 sigma bar, and at tile >= 512 the HIGHEST smalls
    # are pure per-panel overhead (hlo_stats: ~2 ms/panel at tile 1024).
    # The vector path keeps HIGHEST smalls: accumulator consistency.
    sp = jax.lax.Precision.HIGHEST if accumulate else jax.lax.Precision.HIGH
    if gemm_inv is None:
        gemm_inv = _gemm_only_inv()
    if pallas_chain is None:
        # opt-in (NPW_PALLAS_CHAIN=1): the one-launch Pallas panel chain
        # (ops/pallas_factor.cholqr2_chain_pallas). Measured 2026-08-19
        # at 8192/256 on-chip: per-panel slope-timed micro 1.08x SLOWER
        # than the custom-call fold path; one e2e A/B showed 1.88x faster
        # (22.7 vs 42.5 ms) but three later same-session repeats measured
        # parity inside a 30-44 ms noise band, so the default stays OFF —
        # sigma parity holds either way (2.4e-5 at kappa 1e6). At tile
        # 512 the kernel exceeds v5e's 16M scoped VMEM (envelope-checked,
        # falls back per-panel). experiments/results/chain_onchip_r05.jsonl.
        pallas_chain = os.environ.get("NPW_PALLAS_CHAIN", "0") == "1"
    panel_update = (
        functools.partial(_panel_qr_update_cholqr, conv_tol=conv_tol,
                          fast_s=fast_s, small_precision=sp,
                          gemm_inv=gemm_inv, pallas_chain=pallas_chain)
        if panel_method == "cholqr" else _panel_qr_update
    )
    panel_lq = functools.partial(_panel_lq_update_cholqr, conv_tol=conv_tol,
                                 fast_s=fast_s, small_precision=sp,
                                 gemm_inv=gemm_inv,
                                 pallas_chain=pallas_chain)
    # accumulator-GEMM precision: the P/Q applies are ~60% of the
    # with-vectors flops and their roundoff is the recon-error floor
    # (measured 1.05e-4 Frobenius at HIGH, 768^2/t256 on-chip);
    # accum_precision=HIGHEST buys ~fp32-true accumulators for +~60%
    # cost instead of the ~150% of making EVERYTHING HIGHEST
    ap = accum_precision or precision

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
                p_acc = _apply_reflector_right(p_acc, refl, c0, ap)
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
                        l_blk, body2, reflr = panel_lq(
                            row_pan, body, precision, True
                        )
                        q_acc = _apply_reflector_right(q_acc, reflr, c1,
                                                       ap)
                    else:
                        l_blk, body2 = panel_lq(row_pan, body, precision)
                else:
                    # Householder path: LQ on the row panel = QR of its
                    # transpose
                    if accumulate:
                        l_t, body_t, reflr = panel_update(
                            row_pan.T, body.T, precision, True
                        )
                        q_acc = _apply_reflector_right(q_acc, reflr, c1,
                                                       ap)
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
                  accumulate=False, accum_precision=None, gemm_inv=None):
    return jax.jit(fused_bdfac_fn(n_pad, tile, precision=precision,
                                  dtype=dtype, panel_method=panel_method,
                                  accumulate=accumulate,
                                  accum_precision=accum_precision,
                                  gemm_inv=gemm_inv),
                   donate_argnums=(0,) if donate else ())


def fused_bdfac(a: jax.Array, tile: int, *, precision=None,
                panel_method: str = None, donate: bool = False,
                accumulate: bool = False, accum_precision=None,
                gemm_inv: bool = None):
    """donate=True lets XLA run the in-place sweeps without the defensive
    input copy (profiled at ~2.4 ms on 8192^2) — pass it when the caller
    owns `a` and will not reuse it. accumulate=True returns (B, P, Q) with
    A = P B Q^T (the singular-vector path). gemm_inv=True swaps the panel
    chain's non-chol custom calls for GEMM-only algebra (see
    _gemm_only_inv); None = the NPW_GEMM_INV env default — resolved HERE
    so the jit cache keys on the choice."""
    if precision is None:
        precision = default_precision(a.dtype)
    if panel_method is None:
        panel_method = os.environ.get("NPW_BDFAC_PANEL", "cholqr")
    if gemm_inv is None:
        gemm_inv = _gemm_only_inv()
    return _jitted_bdfac(a.shape[0], tile, precision, a.dtype, panel_method,
                         donate, accumulate, accum_precision, gemm_inv)(a)


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

    Shift policy (_cholqr_adaptive): pass 1 is ALWAYS shifted,
    branchlessly — one cholesky of G + 4 u sqrt(m b) ||G||_inf I, positive
    definite by construction, so there is no pivot test and no lax.cond
    around the factor. Later passes use the first-order Neumann cleanup
    factor (pure VPU) once the Gram is within 1e-2 of I, with extra
    shifted passes behind one lax.cond until converged. The paper's
    worst-case constant (11 u m b ||A||_2^2) is calibrated for fp64; at
    fp32 it over-shifts by orders of magnitude, hence the ||G||_inf-scaled
    constant. Measured on the logspace-spectrum family: clean through
    kappa = 1e8 on-chip (ortho 2.3e-5 at 65536 x 256; at 1M x 512 the
    larger shift needs ~9 shifted passes — see _cholqr_adaptive's
    max_passes sizing); the Householder tree remains the last-resort
    fallback.

    All passes are GEMM + small-Cholesky shaped; pass 3 runs under
    lax.cond only when a shift fired, so the well-conditioned common case
    costs exactly CholeskyQR2 (worst case ~1.5x, still ~13x faster than
    the Householder combine tree)."""
    if precision is None:
        precision = default_precision(dtype)

    def f(a):
        # headroom to kappa ~ 1e8 at any supported aspect (default
        # max_passes=16; see _cholqr_adaptive's sizing note)
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
        truncate_t = program.consts.get("truncate", 0)
        if truncate_t == 0:
            l_trap = cholesky_trapezoid(s_ba.matrix.trap)
            o_m.adopt(l_trap)
        else:
            # prefix run (reference truncate): LAPACK-style in-place state —
            # factored panels + updated Schur complement share O's buffers;
            # only the factored tile columns are marked computed (the bind
            # step validated panel alignment)
            g = s_ba.matrix.grid[0]
            done_tiles = g - truncate_t
            stop = (done_tiles * s_ba.matrix.tile[0]) // s_ba.matrix.trap.panel
            l_trap = cholesky_trapezoid(s_ba.matrix.trap, stop_panels=stop)
            o_m.adopt(l_trap, written_tile_cols=done_tiles)
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


def _spill_if_over_budget(program, factor: int = 2, names=None) -> bool:
    """Host-tier operands whose wholesale promotion would exceed the HBM
    budget run through the streaming SpillTaskExecutor instead of OOMing
    (the cholesky runner has its own dedicated out-of-core path). Returns
    True when the program was executed that way.

    names: the matrices the FUSED runner would actually promote (default:
    all). Scratch a runner never touches (e.g. gemm's P chunk partials,
    which only the generic executors read) must not count against the
    fused path's budget."""
    total = 0
    any_host = False
    for name, ba in program.matrices.items():
        if names is not None and name not in names:
            continue
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
    if _spill_if_over_budget(program, names=("A", "B", "C")):
        return
    a = _hbm(program, "A")
    b = _hbm(program, "B")
    c = _hbm(program, "C")
    c.replace_array(fused_gemm(a.array, b.array).astype(c.dtype))
    # the chunk-partials scratch exists for the generic executors only;
    # the fused path computes C in one XLA dot and never reads it
    p = program.matrices.get("P")
    if p is not None:
        p.matrix.free()


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
