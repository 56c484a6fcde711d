"""Pallas factorization tile kernels (ops/pallas_factor.py) vs the numpy
reference kernels (kernels.potrf / kernels.trsm semantics — SURVEY §2 "every
tile kernel gets a real Pallas implementation"). Interpret mode on the CPU
fake cluster; the on-chip path is exercised by the TPU drive scripts."""

import numpy as np
import pytest

import jax.numpy as jnp

from numpywren_tpu import kernels
from numpywren_tpu.matrix_init import random_spd
from numpywren_tpu.ops.pallas_factor import potrf_pallas, trsm_pallas, trtri_pallas


@pytest.mark.parametrize("n", [128, 384, 1024])
def test_potrf_pallas_matches_lapack(n, rng):
    a = random_spd(n, seed=3).astype(np.float32)
    l = np.asarray(potrf_pallas(jnp.asarray(a), interpret=True))
    ref = kernels.potrf(a)
    np.testing.assert_allclose(l, ref, rtol=1e-4, atol=1e-4 * np.abs(ref).max())
    assert np.abs(np.triu(l, 1)).max() == 0.0


@pytest.mark.parametrize("n", [128, 256])
def test_trtri_pallas(n, rng):
    a = random_spd(n, seed=4).astype(np.float32)
    l = np.linalg.cholesky(a.astype(np.float64)).astype(np.float32)
    w = np.asarray(trtri_pallas(jnp.asarray(l), interpret=True))
    np.testing.assert_allclose(l @ w, np.eye(n), atol=5e-5)
    assert np.abs(np.triu(w, 1)).max() == 0.0


def test_trsm_pallas_matches_reference(rng):
    n = 256
    a = random_spd(n, seed=5).astype(np.float32)
    l = np.linalg.cholesky(a.astype(np.float64)).astype(np.float32)
    x = rng.standard_normal((n, n)).astype(np.float32)
    s = np.asarray(trsm_pallas(jnp.asarray(x), jnp.asarray(l)))
    ref = kernels.trsm(x, l)
    np.testing.assert_allclose(s, ref, rtol=1e-3, atol=1e-3 * np.abs(ref).max())


def test_potrf_pallas_fallback_unsupported(rng):
    """Outside the VMEM envelope (non-multiple-of-128) the wrapper must
    fall back to XLA's cholesky, not fail."""
    a = random_spd(96, seed=6).astype(np.float32)
    l = np.asarray(potrf_pallas(jnp.asarray(a)))
    np.testing.assert_allclose(l, kernels.potrf(a), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n", [128, 512])
def test_potrf_inv_pallas_fused(n, rng):
    """Fused (L, L^{-1}) kernel: the adaptive chain's per-panel factor —
    one kernel instead of cholesky + triangular_solve custom calls."""
    from numpywren_tpu.ops.pallas_factor import potrf_inv_pallas

    a = random_spd(n, seed=11).astype(np.float32)
    l, w = potrf_inv_pallas(jnp.asarray(a))
    l, w = np.asarray(l), np.asarray(w)
    ref = np.linalg.cholesky(a.astype(np.float64))
    np.testing.assert_allclose(l, ref, rtol=1e-3, atol=1e-3 * ref.max())
    np.testing.assert_allclose(l @ w, np.eye(n), atol=1e-4)
    assert np.abs(np.triu(l, 1)).max() == 0.0
    assert np.abs(np.triu(w, 1)).max() == 0.0


def test_potrf_inv_pallas_fallback(rng):
    from numpywren_tpu.ops.pallas_factor import potrf_inv_pallas

    a = random_spd(96, seed=12).astype(np.float32)
    l, w = potrf_inv_pallas(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(l) @ np.asarray(w), np.eye(96),
                               atol=1e-4)


# ---------------------------------------------------------------------------
# Blocked-Householder QR (qr_pallas — the qr_factor/qr_leaf family member)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(128, 128), (256, 128), (512, 512),
                                   (1024, 256), (2048, 128)])
def test_qr_pallas_thin_qr(shape, rng):
    from numpywren_tpu.ops.pallas_factor import qr_pallas

    m, n = shape
    a = rng.standard_normal((m, n)).astype(np.float32)
    q, r = qr_pallas(jnp.asarray(a))
    q, r = np.asarray(q), np.asarray(r)
    assert q.shape == (m, n) and r.shape == (n, n)
    np.testing.assert_allclose(r, np.triu(r))  # exactly upper triangular
    np.testing.assert_allclose(q.T @ q, np.eye(n), atol=2e-5)
    np.testing.assert_allclose(q @ r, a, atol=2e-5 * np.abs(a).max() * n**0.5)


def test_qr_pallas_ill_conditioned(rng):
    """Householder grade: no Gram matrix anywhere, so kappa ~ 1e7 (where
    every CholeskyQR variant breaks at fp32) must still give eps-grade
    orthogonality."""
    from numpywren_tpu.ops.pallas_factor import qr_pallas

    m, n = 512, 128
    u, _ = np.linalg.qr(rng.standard_normal((m, n)))
    v, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = ((u * np.logspace(0, -7, n)) @ v.T).astype(np.float32)
    q, r = qr_pallas(jnp.asarray(a))
    q = np.asarray(q)
    np.testing.assert_allclose(q.T @ q, np.eye(n), atol=5e-5)
    np.testing.assert_allclose(q @ np.asarray(r), a,
                               atol=1e-5 * np.abs(a).max())


def test_qr_pallas_zero_column(rng):
    """A zero column (tau = 0 path) must not NaN the compact-WY T."""
    from numpywren_tpu.ops.pallas_factor import qr_pallas

    m, n = 256, 128
    a = rng.standard_normal((m, n)).astype(np.float32)
    a[:, 5] = 0.0
    q, r = qr_pallas(jnp.asarray(a))
    q, r = np.asarray(q), np.asarray(r)
    assert np.isfinite(q).all() and np.isfinite(r).all()
    np.testing.assert_allclose(q @ r, a, atol=2e-5 * np.abs(a).max() * n**0.5)


def test_qr_pallas_fallback_unsupported(rng):
    from numpywren_tpu.ops.pallas_factor import qr_pallas

    a = rng.standard_normal((100, 60)).astype(np.float32)  # not 128-aligned
    q, r = qr_pallas(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(q) @ np.asarray(r), a, atol=1e-4)


def test_qr_leaf_pallas_env_hook(rng, monkeypatch):
    """NPW_PALLAS_QR=1 routes ops.factor.qr_leaf through qr_pallas."""
    from numpywren_tpu.ops import factor

    monkeypatch.setenv("NPW_PALLAS_QR", "1")
    a = rng.standard_normal((256, 128)).astype(np.float32)
    q, r = factor.qr_leaf(jnp.asarray(a))
    q, r = np.asarray(q), np.asarray(r)
    np.testing.assert_allclose(q.T @ q, np.eye(128), atol=2e-5)
    np.testing.assert_allclose(q @ r, a, atol=3e-4)


@pytest.mark.parametrize("rows", [False, True])
@pytest.mark.parametrize("kappa", [10.0, 1e4, 1e6])
def test_cholqr2_chain_kernel_matches_xla_chain(rng, monkeypatch, rows, kappa):
    """The one-launch Pallas CholeskyQR2 chain (VERDICT r4 #5) must be a
    drop-in for the fold path of compiler.lower._cholqr_adaptive: same
    orthogonality and residual grade, q within roundoff of the XLA path."""
    import jax
    from jax import lax

    import numpywren_tpu.compiler.lower as L

    m, b = 1024, 256
    u_, _ = np.linalg.qr(rng.standard_normal((m, b)))
    v_, _ = np.linalg.qr(rng.standard_normal((b, b)))
    s = np.logspace(0, -np.log10(kappa), b)
    p = ((u_ * s) @ v_.T).astype(np.float32)
    if rows:
        p = p.T.copy()
    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("NPW_PALLAS_CHAIN", flag)
        q, r = jax.jit(lambda x: L._cholqr_adaptive(
            x, lax.Precision.HIGHEST, rows=rows))(jnp.asarray(p))
        outs[flag] = (np.asarray(q), np.asarray(r))
    for q, r in outs.values():
        if rows:
            ortho = np.linalg.norm(q @ q.T - np.eye(b)) / np.sqrt(b)
            resid = np.linalg.norm(r @ q - p) / np.linalg.norm(p)
        else:
            ortho = np.linalg.norm(q.T @ q - np.eye(b)) / np.sqrt(b)
            resid = np.linalg.norm(q @ r - p) / np.linalg.norm(p)
        assert ortho < 2e-5
        assert resid < 5e-6
    # same math, different roundoff paths: agreement degrades ~ kappa * u
    tol = 3e-6 * max(kappa, 10.0)
    assert np.max(np.abs(outs["0"][0] - outs["1"][0])) < tol
