"""Least-squares model family (tall overdetermined systems).

The reference's end-to-end story is "big dense linear algebra for ML
primitives"; least squares is the canonical consumer of its TSQR and
Cholesky programs. Two TPU-native paths:

- `least_squares(..., method="qr")` (default): CholeskyQR3s of A, then
  x = R^{-1} Q^T b — numerically safe to kappa(A) ~ 1/eps_fp32, all GEMMs.
- `method="normal"`: Gram matrix G = A^T A on the MXU + Cholesky solve —
  half the flops of QR but squares the condition number; right answer for
  well-conditioned tall systems and the path that scales through the
  cholesky program stack (upstream:numpywren's own demo workload).
"""

from __future__ import annotations

import numpy as np

__all__ = ["least_squares", "ridge_regression"]


def _solve_upper(r, y):
    """x = R^{-1} y on device (R upper triangular)."""
    from jax import lax

    return lax.linalg.triangular_solve(r, y, left_side=True, lower=False)


def least_squares(a, b, method: str = "qr") -> np.ndarray:
    """argmin_x ||A x - b||_2 for tall A (m, n), b (m,) or (m, k)."""
    import jax.numpy as jnp

    from numpywren_tpu.compiler.lower import fused_tsqr
    from numpywren_tpu.ops.common import default_precision

    a = np.asarray(a)
    b_arr = np.asarray(b, dtype=a.dtype)
    if a.ndim != 2 or a.shape[0] < a.shape[1]:
        raise ValueError(f"least_squares expects tall A, got {a.shape}")
    if b_arr.shape[0] != a.shape[0]:
        raise ValueError(f"b rows {b_arr.shape[0]} != A rows {a.shape[0]}")
    squeeze = b_arr.ndim == 1
    if squeeze:
        b_arr = b_arr[:, None]
    ad = jnp.asarray(a)
    bd = jnp.asarray(b_arr)
    prec = default_precision(ad.dtype)
    if method == "qr":
        q, r = fused_tsqr(ad, tile_rows=a.shape[0], compute_q=True,
                          method="cholqr3s")
        x = _solve_upper(r, jnp.matmul(q.T, bd, precision=prec))
    elif method == "normal":
        from jax import lax

        g = jnp.matmul(ad.T, ad, precision=prec)
        l = lax.linalg.cholesky(g, symmetrize_input=True)
        atb = jnp.matmul(ad.T, bd, precision=prec)
        y = lax.linalg.triangular_solve(l, atb, left_side=True, lower=True)
        x = lax.linalg.triangular_solve(l, y, left_side=True, lower=True,
                                        transpose_a=True)
    else:
        raise ValueError(f"unknown method {method!r}")
    x = np.asarray(x)
    return x[:, 0] if squeeze else x


def ridge_regression(a, b, alpha: float) -> np.ndarray:
    """argmin_x ||A x - b||^2 + alpha ||x||^2 via the regularized normal
    equations (A^T A + alpha I) x = A^T b — SPD by construction, so the
    Cholesky path is always safe. alpha > 0."""
    import jax.numpy as jnp
    from jax import lax

    from numpywren_tpu.ops.common import default_precision

    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    a = np.asarray(a)
    b_arr = np.asarray(b, dtype=a.dtype)
    squeeze = b_arr.ndim == 1
    if squeeze:
        b_arr = b_arr[:, None]
    ad = jnp.asarray(a)
    prec = default_precision(ad.dtype)
    g = jnp.matmul(ad.T, ad, precision=prec)
    g = g + alpha * jnp.eye(g.shape[0], dtype=g.dtype)
    l = lax.linalg.cholesky(g, symmetrize_input=True)
    atb = jnp.matmul(ad.T, jnp.asarray(b_arr), precision=prec)
    y = lax.linalg.triangular_solve(l, atb, left_side=True, lower=True)
    x = lax.linalg.triangular_solve(l, y, left_side=True, lower=True,
                                    transpose_a=True)
    x = np.asarray(x)
    return x[:, 0] if squeeze else x
