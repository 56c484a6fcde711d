"""Factorization tile kernels: potrf / trsm / QR / LQ on device.

The reference runs these tiles through LAPACK (numpywren/kernels.py ::
cholesky, trsm via solve_triangular, qr_factor). On TPU the sequential
triangular cores are delegated to XLA's native blocked implementations
(lax.linalg.cholesky / triangular_solve / qr — which themselves tile onto
the MXU), while the gemm-shaped bulk around them goes through the Pallas
matmul in ops.gemm. potrf/trsm account for O(N T^2) / O(N^2 T) flops vs the
O(N^3) trailing updates, so the MXU-bound fraction dominates end-to-end.

All functions are jittable, tile-in/tile-out, dtype-preserving, and match
the numpy reference kernels' conventions exactly (see kernels.py header).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


@jax.jit
def potrf(a: jax.Array) -> jax.Array:
    """Lower Cholesky factor of an SPD tile."""
    return lax.linalg.cholesky(a)


@jax.jit
def trsm(a: jax.Array, l: jax.Array) -> jax.Array:
    """Solve X @ L^T = A for X (Cholesky panel op)."""
    return lax.linalg.triangular_solve(l, a, left_side=False, lower=True, transpose_a=True)


@jax.jit
def qr_leaf(a: jax.Array):
    """Thin QR of a (tall) tile: (Q, R)."""
    q, r = jnp.linalg.qr(a, mode="reduced")
    return q, r


@jax.jit
def qr_combine(r_top: jax.Array, r_bot: jax.Array):
    """QR of stacked [R_top; R_bot] (TSQR tree node): (Q_top, Q_bot, R)."""
    n = r_top.shape[0]
    q, r = jnp.linalg.qr(jnp.vstack([r_top, r_bot]), mode="reduced")
    return q[:n], q[n:], r


@jax.jit
def qr_r(a: jax.Array) -> jax.Array:
    return jnp.linalg.qr(a, mode="r")


@jax.jit
def lq_leaf(a: jax.Array):
    """Thin LQ of a (wide) tile: (L, Q)."""
    q, r = jnp.linalg.qr(a.T, mode="reduced")
    return r.T, q.T


def small_qr_apply(q: jax.Array, a: jax.Array) -> jax.Array:
    """q^T @ a."""
    from numpywren_tpu.ops.gemm import matmul

    return matmul(q, a, ta=True)
