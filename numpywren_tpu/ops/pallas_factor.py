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
