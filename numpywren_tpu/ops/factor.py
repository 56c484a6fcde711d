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


def qr_leaf(a: jax.Array):
    """Thin QR of a (tall) tile: (Q, R). NPW_PALLAS_QR=1 opts into the
    Pallas blocked-Householder kernel (ops/pallas_factor.qr_pallas) for
    tiles inside its VMEM envelope — measured at custom-call-comparable
    latency (BENCH.md round 3), kept opt-in like NPW_PALLAS_FACTOR."""
    import os

    if os.environ.get("NPW_PALLAS_QR", "0") == "1":
        from numpywren_tpu.ops.pallas_factor import qr_pallas

        return qr_pallas(a)
    return _qr_leaf_xla(a)


@jax.jit
def _qr_leaf_xla(a: jax.Array):
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


def _make_qr_combine_r(m: int):
    """R of the QR of m stacked R tiles (k-ary `reducer` tree node; matches
    kernels.qr_combine_r{m} semantics)."""
    @jax.jit
    def f(*rs):
        return jnp.linalg.qr(jnp.concatenate(rs, axis=0), mode="r")

    f.__name__ = f"qr_combine_r{m}"
    return f


@jax.jit
def lq_leaf(a: jax.Array):
    """Thin LQ of a (wide) tile: (L, Q)."""
    q, r = jnp.linalg.qr(a.T, mode="reduced")
    return r.T, q.T


def small_qr_apply(q: jax.Array, a: jax.Array) -> jax.Array:
    """q^T @ a."""
    from numpywren_tpu.ops.gemm import matmul

    return matmul(q, a, ta=True)


# ---------------------------------------------------------------------------
# Full-Q pairwise kernels (BDFAC flat-tree sweeps; see kernels.py docstrings)
# ---------------------------------------------------------------------------

@jax.jit
def qr_factor2(top: jax.Array, bot: jax.Array):
    """Complete QR of [top; bot]: (qtt, qtb, qbt, qbb, r)."""
    t = top.shape[-2]
    q, r = jnp.linalg.qr(jnp.concatenate([top, bot], axis=-2), mode="complete")
    return (
        q[..., :t, :t], q[..., :t, t:],
        q[..., t:, :t], q[..., t:, t:],
        r[..., :t, :],
    )


@jax.jit
def qr_apply2(qtt, qtb, qbt, qbb, yt, yb):
    mt = jnp.swapaxes
    new_t = mt(qtt, -1, -2) @ yt + mt(qbt, -1, -2) @ yb
    new_b = mt(qtb, -1, -2) @ yt + mt(qbb, -1, -2) @ yb
    return new_t, new_b


@jax.jit
def lq_factor2(left: jax.Array, right: jax.Array):
    """Complete LQ of [left right]: (qtt, qtb, qbt, qbb, l)."""
    t = left.shape[-2]
    a_t = jnp.swapaxes(jnp.concatenate([left, right], axis=-1), -1, -2)
    qc, rc = jnp.linalg.qr(a_t, mode="complete")
    q = jnp.swapaxes(qc, -1, -2)
    l = jnp.swapaxes(rc[..., :t, :], -1, -2)
    return (
        q[..., :t, :t], q[..., :t, t:],
        q[..., t:, :t], q[..., t:, t:],
        l,
    )


@jax.jit
def lq_apply2(qtt, qtb, qbt, qbb, yl, yr):
    mt = jnp.swapaxes
    new_l = yl @ mt(qtt, -1, -2) + yr @ mt(qtb, -1, -2)
    new_r = yl @ mt(qbt, -1, -2) + yr @ mt(qbb, -1, -2)
    return new_l, new_r
