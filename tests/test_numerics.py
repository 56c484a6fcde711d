"""Numerical stress tests: conditioning behavior of the factorizations
(the reference's accuracy story is LAPACK fp64; ours is documented
fp32-parity with measured failure modes)."""

import jax
import numpy as np
import pytest

import numpywren_tpu as npw
from numpywren_tpu.compiler.lower import fused_cholesky, fused_tsqr


def _spd_with_cond(n, cond, seed=0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eig = np.logspace(0, -np.log10(cond), n)
    return (q * eig) @ q.T


@pytest.mark.parametrize("cond", [1e2, 1e4, 1e6])
def test_cholesky_conditioning(cond):
    """Residual stays at fp32 level for cond up to ~1e6 (fp32 cholesky's
    classical stability bound: factorization succeeds for cond << 1/eps)."""
    import jax.numpy as jnp

    a = _spd_with_cond(256, cond).astype(np.float32)
    l = np.asarray(fused_cholesky(jnp.asarray(a), tile=64))
    resid = np.linalg.norm(a - l @ l.T) / np.linalg.norm(a)
    assert resid < 1e-5, (cond, resid)


def test_tree_tsqr_survives_ill_conditioning():
    """kappa ~ 1e5: CholeskyQR's first Gram matrix has cond ~1e10 > 1/eps32
    and degrades or fails; the Householder tree stays accurate — this is
    WHY both methods exist (method='tree' is the robust default)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    m, b = 8 * 64, 32
    u, _ = np.linalg.qr(rng.standard_normal((m, b)))
    v, _ = np.linalg.qr(rng.standard_normal((b, b)))
    sv = np.logspace(0, -5, b)
    a = ((u * sv) @ v.T).astype(np.float32)

    r_tree = np.asarray(fused_tsqr(jnp.asarray(a), tile_rows=64, method="tree"))
    gram = a.astype(np.float64).T @ a.astype(np.float64)
    err_tree = np.linalg.norm(r_tree.astype(np.float64).T @ r_tree - gram) / np.linalg.norm(gram)
    assert err_tree < 1e-5, err_tree

    # cholqr2 on the same input: expected to be (much) worse or NaN
    r_cq = np.asarray(fused_tsqr(jnp.asarray(a), tile_rows=64, method="cholqr2"))
    err_cq = np.linalg.norm(
        np.nan_to_num(r_cq.astype(np.float64)).T @ np.nan_to_num(r_cq) - gram
    ) / np.linalg.norm(gram)
    assert not np.isfinite(err_cq) or err_cq > err_tree


def test_bdfac_ill_conditioned_singular_values():
    """Orthogonal sweeps preserve even tiny singular values to relative
    fp32 accuracy of the LARGEST (absolute, not relative per-value)."""
    rng = np.random.default_rng(2)
    n = 96
    u, _ = np.linalg.qr(rng.standard_normal((n, n)))
    v, _ = np.linalg.qr(rng.standard_normal((n, n)))
    sv = np.logspace(0, -4, n)
    x = ((u * sv) @ v.T).astype(np.float32)
    prog, b_mat, _ = npw.bdfac(x, tile=(32, 32))
    npw.run_program(prog)
    sv_out = np.linalg.svd(b_mat.numpy().astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(sv_out, sv, atol=1e-5)


# ---------------------------------------------------------------------------
# adaptive CholeskyQR chain (round 2)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kappa", [1.0, 1e3, 1e5])
def test_cholqr_adaptive_column_form(rng, kappa):
    """QR via the adaptive chain: A = Q R exactly by construction, Q
    orthonormal across three decades of conditioning (the chain adds
    shifted passes only as needed)."""
    import jax.numpy as jnp

    from numpywren_tpu.compiler.lower import _cholqr_adaptive

    m, b = 2048, 32
    u, _ = np.linalg.qr(rng.standard_normal((m, b)))
    v, _ = np.linalg.qr(rng.standard_normal((b, b)))
    s = np.logspace(0, -np.log10(kappa), b)
    a = ((u * s) @ v.T).astype(np.float32)
    q, r = _cholqr_adaptive(jnp.asarray(a), jax.lax.Precision.HIGHEST)
    q, r = np.asarray(q), np.asarray(r)
    np.testing.assert_allclose(q.T @ q, np.eye(b), atol=5e-4)
    np.testing.assert_allclose(q @ r, a, atol=5e-5)
    assert np.abs(np.tril(r, -1)).max() < 1e-5  # upper triangular


def test_cholqr_adaptive_row_form_mirrors_column_form(rng):
    """LQ of p must equal (QR of p^T) transposed — the row form exists to
    avoid transposes, not to change semantics."""
    import jax.numpy as jnp

    from numpywren_tpu.compiler.lower import _cholqr_adaptive

    p = rng.standard_normal((48, 512)).astype(np.float32)
    qr_, l = _cholqr_adaptive(jnp.asarray(p), jax.lax.Precision.HIGHEST,
                              rows=True)
    qc, rc = _cholqr_adaptive(jnp.asarray(p.T), jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(l), np.asarray(rc).T,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(qr_), np.asarray(qc).T,
                               rtol=1e-4, atol=1e-5)
    # reconstruction: p = l @ qr
    np.testing.assert_allclose(np.asarray(l) @ np.asarray(qr_), p,
                               atol=1e-4)
