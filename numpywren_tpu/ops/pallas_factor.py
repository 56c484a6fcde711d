"""Pallas factorization tile kernels (SURVEY §2: "every tile kernel gets a
real Pallas implementation" — these are the potrf/trtri/trsm members of the
family; the GEMM members live in ops/gemm.py / ops/gemm3.py).

Reference semantics: kernels.potrf / kernels.trsm
(upstream:numpywren/kernels.py wrap LAPACK); these are their MXU/VPU-native
equivalents for VMEM-resident tiles (n <= 1024 fp32 — the tile sizes the
framework's blocked algorithms actually use).

Design (potrf): the whole tile lives in VMEM; per 128-wide diagonal block a
`fori_loop` runs the unblocked right-looking factorization, accumulating the
block's INVERSE row-by-row in the same loop (forward substitution against
the already-built columns) so the below-panel solve is ONE MXU dot
X = A21 W^T instead of a sequential substitution, and the trailing update is
one more dot — the MAGMA explicit-inverse trick, entirely on-chip. XLA's
cholesky custom-call costs ~0.3 ms nearly flat in tile size inside a fused
program; this kernel replaces it where the latency matters (many small
panel factorizations, e.g. CholeskyQR Gram chains).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

_B = 128  # unblocked-factor width: one MXU/VPU native tile


def _factor_block_with_inverse(d):
    """Unblocked Cholesky of the (B, B) SPD block `d`, returning (l, w) with
    l lower-triangular, l l^T = d, and w = l^{-1} (accumulated row-by-row in
    the same loop: W[j, :] = (e_j - L[j, :j] W) / piv).

    All indexing is mask-select (Mosaic cannot lower dynamic_slice on
    values): extracting row/column j is a masked reduction, inserting is a
    masked where — each a (B, B) VPU op, B = 128."""
    b = d.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = lax.broadcasted_iota(jnp.int32, (b, b), 1)
    hp = lax.Precision.HIGHEST

    def body(j, carry):
        d, l, w = carry
        piv = jnp.sqrt(jnp.sum(jnp.where((rows == j) & (cols == j), d, 0.0)))
        col = jnp.sum(jnp.where(cols == j, d, 0.0), axis=1, keepdims=True) / piv
        colm = jnp.where(rows[:, :1] >= j, col, 0.0)        # (b, 1)
        # inverse row j BEFORE inserting column j into l: row j of l holds
        # exactly L[j, :j] (later columns still zero)
        lrow = jnp.sum(jnp.where(rows == j, l, 0.0), axis=0, keepdims=True)
        ej = (cols[:1, :] == j).astype(d.dtype)              # (1, b)
        wrow = (ej - jnp.matmul(lrow, w, precision=hp)) / piv
        w = jnp.where(rows == j, wrow, w)
        l = jnp.where(cols == j, colm, l)
        d = d - colm * colm.reshape(1, b)  # rank-1 trailing update (VPU)
        return d, l, w

    zero = jnp.zeros_like(d)
    _, l, w = lax.fori_loop(0, b, body, (d, zero, zero))
    return l, w


def _potrf_kernel(a_ref, l_ref, *, n):
    l_ref[:] = a_ref[:]
    hp = lax.Precision.HIGHEST
    for j0 in range(0, n, _B):
        l_blk, w = _factor_block_with_inverse(l_ref[j0:j0 + _B, j0:j0 + _B])
        l_ref[j0:j0 + _B, j0:j0 + _B] = l_blk
        if j0 + _B < n:
            below = l_ref[j0 + _B:, j0:j0 + _B]
            x = jnp.matmul(below, w.T, precision=hp)  # A21 L11^{-T}
            l_ref[j0 + _B:, j0:j0 + _B] = x
            trail = l_ref[j0 + _B:, j0 + _B:]
            l_ref[j0 + _B:, j0 + _B:] = trail - jnp.matmul(x, x.T, precision=hp)
    # zero the strict upper triangle (the loop leaves stale values there)
    r = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    l_ref[:] = jnp.where(r >= c, l_ref[:], 0.0)


def _potrf_inv_kernel(a_ref, l_ref, w_ref, *, n):
    """Fused Cholesky + full triangular inverse in ONE VMEM kernel:
    l l^T = a and w = l^{-1}. The per-128-block inverse falls out of the
    factor loop for free (_factor_block_with_inverse), and the
    off-diagonal inverse blocks are pure MXU GEMMs — so the kernel's
    sequential depth is the FACTOR's alone. The adaptive CholeskyQR chain
    consumes exactly (L, L^{-1}) per panel; XLA's separate
    cholesky + triangular_solve custom calls each pay their own blocked
    diag-invert machinery (profiled ~0.28 ms/panel combined at b=512
    inside fused bdfac)."""
    hp = lax.Precision.HIGHEST
    l_ref[:] = a_ref[:]
    w_ref[:] = jnp.zeros((n, n), a_ref.dtype)
    nb = n // _B
    for j0 in range(0, n, _B):
        l_blk, w = _factor_block_with_inverse(l_ref[j0:j0 + _B, j0:j0 + _B])
        l_ref[j0:j0 + _B, j0:j0 + _B] = l_blk
        w_ref[j0:j0 + _B, j0:j0 + _B] = w
        if j0 + _B < n:
            below = l_ref[j0 + _B:, j0:j0 + _B]
            x = jnp.matmul(below, w.T, precision=hp)  # A21 L11^{-T}
            l_ref[j0 + _B:, j0:j0 + _B] = x
            trail = l_ref[j0 + _B:, j0 + _B:]
            l_ref[j0 + _B:, j0 + _B:] = trail - jnp.matmul(x, x.T, precision=hp)
    r = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    l_ref[:] = jnp.where(r >= c, l_ref[:], 0.0)
    # off-diagonal inverse blocks: W[i,j] = -W[i,i] (sum_k L[i,k] W[k,j])
    for j in range(nb):
        for i in range(j + 1, nb):
            acc = jnp.zeros((_B, _B), a_ref.dtype)
            for k in range(j, i):
                acc = acc + jnp.matmul(
                    l_ref[i * _B:(i + 1) * _B, k * _B:(k + 1) * _B],
                    w_ref[k * _B:(k + 1) * _B, j * _B:(j + 1) * _B],
                    precision=hp)
            w_ref[i * _B:(i + 1) * _B, j * _B:(j + 1) * _B] = -jnp.matmul(
                w_ref[i * _B:(i + 1) * _B, i * _B:(i + 1) * _B], acc,
                precision=hp)


def _trtri_kernel(l_ref, w_ref, *, n):
    """w = l^{-1} for lower-triangular l: per-diagonal-block inverses by
    direct row-wise forward substitution (the same masked-select loop shape
    as _factor_block_with_inverse), then the strictly-lower blocks by the
    blocked identity W[i, j] = -W[i, i] (sum_k L[i, k] W[k, j])."""
    hp = lax.Precision.HIGHEST
    nb = n // _B
    w_ref[:] = jnp.zeros((n, n), l_ref.dtype)  # out refs start uninitialized
    rows = lax.broadcasted_iota(jnp.int32, (_B, _B), 0)
    cols = lax.broadcasted_iota(jnp.int32, (_B, _B), 1)

    def invert_block(lb):
        def body(j, w):
            piv = jnp.sum(jnp.where((rows == j) & (cols == j), lb, 0.0))
            lrow = jnp.sum(jnp.where((rows == j) & (cols < j), lb, 0.0),
                           axis=0, keepdims=True)
            ej = (cols[:1, :] == j).astype(lb.dtype)
            wrow = (ej - jnp.matmul(lrow, w, precision=hp)) / piv
            return jnp.where(rows == j, wrow, w)
        return lax.fori_loop(0, _B, body, jnp.zeros_like(lb))

    for i in range(nb):
        w_ref[i * _B:(i + 1) * _B, i * _B:(i + 1) * _B] = invert_block(
            l_ref[i * _B:(i + 1) * _B, i * _B:(i + 1) * _B])
    for j in range(nb):
        for i in range(j + 1, nb):
            acc = jnp.zeros((_B, _B), l_ref.dtype)
            for k in range(j, i):
                acc = acc + jnp.matmul(
                    l_ref[i * _B:(i + 1) * _B, k * _B:(k + 1) * _B],
                    w_ref[k * _B:(k + 1) * _B, j * _B:(j + 1) * _B],
                    precision=hp)
            w_ref[i * _B:(i + 1) * _B, j * _B:(j + 1) * _B] = -jnp.matmul(
                w_ref[i * _B:(i + 1) * _B, i * _B:(i + 1) * _B], acc,
                precision=hp)


def _supported(n: int, dtype) -> bool:
    return (n % _B == 0 and n <= 1024 and dtype == jnp.float32)


@functools.lru_cache(maxsize=8)
def _potrf_call(n: int, interpret: bool):
    return jax.jit(pl.pallas_call(
        functools.partial(_potrf_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        interpret=interpret,
    ))


@functools.lru_cache(maxsize=8)
def _potrf_inv_call(n: int, interpret: bool):
    return jax.jit(pl.pallas_call(
        functools.partial(_potrf_inv_kernel, n=n),
        out_shape=(jax.ShapeDtypeStruct((n, n), jnp.float32),
                   jax.ShapeDtypeStruct((n, n), jnp.float32)),
        interpret=interpret,
    ))


@functools.lru_cache(maxsize=8)
def _trtri_call(n: int, interpret: bool):
    return jax.jit(pl.pallas_call(
        functools.partial(_trtri_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        interpret=interpret,
    ))


def potrf_pallas(a: jax.Array, *, interpret: bool = None) -> jax.Array:
    """Lower Cholesky factor of an SPD VMEM-sized tile (n <= 1024, n % 128
    == 0, fp32). Falls back to lax.linalg.cholesky outside that envelope."""
    n = a.shape[0]
    if interpret is None:
        from numpywren_tpu.ops.common import on_tpu

        interpret = not on_tpu()
    if not _supported(n, a.dtype):
        return lax.linalg.cholesky(a, symmetrize_input=False)
    return _potrf_call(n, interpret)(a)


def potrf_inv_pallas(a: jax.Array, *, interpret: bool = None):
    """(L, L^{-1}) of an SPD VMEM-sized tile in one fused kernel (n <=
    1024, n % 128 == 0, fp32); falls back to cholesky + triangular_solve
    outside that envelope."""
    n = a.shape[0]
    if interpret is None:
        from numpywren_tpu.ops.common import on_tpu

        interpret = not on_tpu()
    if not _supported(n, a.dtype):
        l = lax.linalg.cholesky(a, symmetrize_input=False)
        w = lax.linalg.triangular_solve(l, jnp.eye(n, dtype=l.dtype),
                                        left_side=True, lower=True)
        return l, w
    return _potrf_inv_call(n, interpret)(a)


def trtri_pallas(l: jax.Array, *, interpret: bool = None) -> jax.Array:
    """Inverse of a lower-triangular VMEM-sized tile (same envelope)."""
    n = l.shape[0]
    if interpret is None:
        from numpywren_tpu.ops.common import on_tpu

        interpret = not on_tpu()
    if not _supported(n, l.dtype):
        eye = jnp.eye(n, dtype=l.dtype)
        return lax.linalg.triangular_solve(l, eye, left_side=True, lower=True)
    return _trtri_call(n, interpret)(l)


def trsm_pallas(a: jax.Array, l: jax.Array, *, precision=None) -> jax.Array:
    """Solve X L^T = A (the Cholesky panel op, kernels.trsm semantics) via
    the explicit tile inverse + one MXU GEMM."""
    from numpywren_tpu.ops.common import default_precision

    if precision is None:
        precision = default_precision(a.dtype)
    w = trtri_pallas(l)
    return jnp.matmul(a, w.T, precision=precision)


# ---------------------------------------------------------------------------
# Blocked-Householder QR (the qr_factor/qr_leaf member of the family)
# ---------------------------------------------------------------------------

def _householder_panel(pan, j0, m):
    """Unblocked Householder QR of the (m, B) panel whose global column
    offset is j0 (rows < j0 + jj are already reduced and must not move).

    Returns (pan, v, tau_row): pan with the R rows in place (subdiagonal
    left as roundoff garbage — masked later), v the unit-lower Householder
    vectors (zero above the diagonal, 1 on it), tau_row (1, B).

    All indexing is mask-select (Mosaic cannot lower dynamic_slice on
    values). LAPACK geqrf conventions: beta = -sign(alpha) ||x||, v
    normalized to v[diag] = 1, tau = (beta - alpha)/beta in [1, 2]; a
    zero column yields tau = 1 with v = 0 (H = I) so the compact-WY
    T-inverse below stays finite."""
    b = pan.shape[1]
    rows = lax.broadcasted_iota(jnp.int32, (m, b), 0)
    cols = lax.broadcasted_iota(jnp.int32, (m, b), 1)
    hp = lax.Precision.HIGHEST

    def body(jj, carry):
        pan, v, taus = carry
        jg = j0 + jj
        x = jnp.sum(jnp.where((cols == jj) & (rows >= jg), pan, 0.0),
                    axis=1, keepdims=True)                     # (m, 1)
        sigma = jnp.sum(x * x)
        alpha = jnp.sum(jnp.where(rows[:, :1] == jg, x, 0.0))
        nrm = jnp.sqrt(sigma)
        beta = jnp.where(alpha >= 0, -nrm, nrm)
        good = sigma > 0
        denom = jnp.where(good, alpha - beta, 1.0)  # |denom| >= nrm > 0
        vcol = jnp.where(rows[:, :1] > jg, x, 0.0) / denom
        vcol = jnp.where(rows[:, :1] == jg, 1.0, vcol)
        vcol = jnp.where(good, vcol, 0.0)
        tau = jnp.where(good, (beta - alpha) / jnp.where(good, beta, 1.0),
                        1.0)
        # apply H = I - tau v v^T to the whole panel (v is zero above the
        # diagonal, so finished rows are untouched; already-reduced columns
        # only change in their roundoff-grade subdiagonal garbage)
        w = jnp.matmul(vcol.T, pan, precision=hp) * tau        # (1, b)
        pan = pan - vcol * w
        # R[jg, jj] = beta exactly (the rank-1 update leaves roundoff)
        pan = jnp.where((rows == jg) & (cols == jj), beta, pan)
        v = jnp.where(cols == jj, vcol, v)
        taus = jnp.where(cols[:1, :] == jj, tau, taus)
        return pan, v, taus

    zero_v = jnp.zeros_like(pan)
    zero_t = jnp.zeros((1, b), pan.dtype)
    return lax.fori_loop(0, b, body, (pan, zero_v, zero_t))


def _invert_upper(tinv, taus):
    """T = inv(T^{-1}) for the compact-WY factor, where
    T^{-1} = strict_upper(V^T V) + diag(1/tau) (verify at b=2: T =
    [[t1, -t1 t2 s12], [0, t2]] inverts to [[1/t1, s12], [0, 1/t2]]).
    Row-wise back-substitution with masked selects, upper-triangular
    mirror of _trtri_kernel's loop."""
    b = tinv.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = lax.broadcasted_iota(jnp.int32, (b, b), 1)
    hp = lax.Precision.HIGHEST
    tinv = jnp.where(rows == cols, 1.0 / taus, jnp.where(rows < cols, tinv, 0.0))

    def body(jr, t):
        j = b - 1 - jr  # rows bottom-up: row j needs rows > j complete
        piv = jnp.sum(jnp.where((rows == j) & (cols == j), tinv, 0.0))
        trow = jnp.sum(jnp.where((rows == j) & (cols > j), tinv, 0.0),
                       axis=0, keepdims=True)
        ej = (cols[:1, :] == j).astype(tinv.dtype)
        row = (ej - jnp.matmul(trow, t, precision=hp)) / piv
        return jnp.where(rows == j, row, t)

    return lax.fori_loop(0, b, body, jnp.zeros_like(tinv))


def _qr_kernel(a_ref, q_ref, r_ref, s_ref, *, m, n):
    """Thin Householder QR of the (m, n) VMEM tile: q (m, n) with
    orthonormal columns, r (n, n) upper triangular, a = q r to working
    precision. Blocked compact-WY by 128 columns: per panel an unblocked
    masked-select factor loop, T from the T^{-1} = strict_upper(V^T V) +
    diag(1/tau) identity, trailing update and Q reconstruction as MXU
    GEMMs — the kernel's sequential depth is the n-column factor loop
    alone."""
    hp = lax.Precision.HIGHEST
    s_ref[:] = a_ref[:]
    panels = []  # (j0, T) — V panels live in q_ref until the rebuild
    q_ref[:] = jnp.zeros((m, n), a_ref.dtype)
    for j0 in range(0, n, _B):
        pan, v, taus = _householder_panel(s_ref[:, j0:j0 + _B], j0, m)
        s_ref[:, j0:j0 + _B] = pan
        q_ref[:, j0:j0 + _B] = v
        s = jnp.matmul(v.T, v, precision=hp)
        t = _invert_upper(s, taus)
        panels.append((j0, t))
        if j0 + _B < n:
            body = s_ref[:, j0 + _B:]
            w1 = jnp.matmul(v.T, body, precision=hp)        # (B, cols)
            s_ref[:, j0 + _B:] = body - jnp.matmul(
                v, jnp.matmul(t.T, w1, precision=hp), precision=hp)
    rows_n = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols_n = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    r_ref[:] = jnp.where(rows_n <= cols_n, s_ref[:n, :], 0.0)
    # Q = (I - V1 T1 V1^T) ... (I - Vp Tp Vp^T) E, applied right-to-left
    rows_m = lax.broadcasted_iota(jnp.int32, (m, n), 0)
    cols_m = lax.broadcasted_iota(jnp.int32, (m, n), 1)
    q = jnp.where(rows_m == cols_m, 1.0, 0.0).astype(a_ref.dtype)
    for j0, t in reversed(panels):
        v = q_ref[:, j0:j0 + _B]
        w1 = jnp.matmul(v.T, q, precision=hp)
        q = q - jnp.matmul(v, jnp.matmul(t, w1, precision=hp), precision=hp)
    q_ref[:] = q


def _qr_supported(m: int, n: int, dtype) -> bool:
    # three (m, n) fp32 buffers + the (m, n) Q value must sit in VMEM:
    # the scoped limit is 16M on v5e, and m*n = 2^19 measured 17.45M
    # (compile-time vmem OOM on-chip), so the envelope stops at 2^18
    return (m % _B == 0 and n % _B == 0 and m >= n and n <= 512
            and m * n <= (1 << 18) and dtype == jnp.float32)


@functools.lru_cache(maxsize=8)
def _qr_call(m: int, n: int, interpret: bool):
    from jax.experimental.pallas import tpu as pltpu

    scratch = (pltpu.VMEM((m, n), jnp.float32),)
    return jax.jit(pl.pallas_call(
        functools.partial(_qr_kernel, m=m, n=n),
        out_shape=(jax.ShapeDtypeStruct((m, n), jnp.float32),
                   jax.ShapeDtypeStruct((n, n), jnp.float32)),
        scratch_shapes=scratch,
        interpret=interpret,
    ))


def qr_pallas(a: jax.Array, *, interpret: bool = None):
    """Thin Householder QR of a VMEM-sized tile — the Pallas qr_factor /
    qr_leaf member of the tile-kernel family (reference semantics:
    upstream:numpywren/kernels.py qr_factor wraps LAPACK geqrf).

    (q, r) with a = q r, q orthonormal to working precision, r upper
    triangular — unconditionally stable (no Gram matrix anywhere), the
    Pallas counterpart of the XLA geqrf custom call for Householder-grade
    panels. Envelope: fp32, 128 | m, 128 | n, m >= n, n <= 512,
    m * n <= 256K (VMEM residency: 512K measured 17.45M > the 16M scoped
    limit on v5e); falls back to jnp.linalg.qr outside it. Like potrf_pallas, the sequential n-column factor loop puts this
    at custom-call-comparable latency on current hardware — it exists to
    complete the Pallas kernel family and for fusion opportunities, not
    as a default (the perf path for well-conditioned panels remains the
    GEMM-only adaptive CholeskyQR chain in compiler/lower.py)."""
    m, n = a.shape
    if interpret is None:
        from numpywren_tpu.ops.common import on_tpu

        interpret = not on_tpu()
    if not _qr_supported(m, n, a.dtype):
        return jnp.linalg.qr(a, mode="reduced")
    return _qr_call(m, n, interpret)(a)
