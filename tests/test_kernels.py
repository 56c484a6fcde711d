"""Reference (numpy) tile-kernel tests against scipy/LAPACK semantics."""

import numpy as np
import scipy.linalg

from numpywren_tpu import kernels
from numpywren_tpu.matrix_init import random_spd


def test_potrf():
    a = random_spd(64, seed=2)
    l = kernels.potrf(a)
    assert np.allclose(np.triu(l, 1), 0)
    np.testing.assert_allclose(l @ l.T, a, rtol=1e-5, atol=1e-5)


def test_trsm():
    a = random_spd(64, seed=3)
    l = kernels.potrf(a)
    rng = np.random.default_rng(0)
    b = rng.standard_normal((64, 64)).astype(np.float32)
    x = kernels.trsm(b, l)
    np.testing.assert_allclose(x @ l.T, b, rtol=1e-4, atol=1e-4)


def test_syrk_gemm():
    rng = np.random.default_rng(1)
    s = rng.standard_normal((32, 32)).astype(np.float32)
    x = rng.standard_normal((32, 32)).astype(np.float32)
    y = rng.standard_normal((32, 32)).astype(np.float32)
    np.testing.assert_allclose(kernels.syrk(s, x, y), s - x @ y.T, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(kernels.gemm(x, y), x @ y, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(kernels.gemm_nt(x, y), x @ y.T, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(kernels.gemm_tn(x, y), x.T @ y, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(kernels.gemm_acc(s, x, y), s + x @ y, rtol=1e-5, atol=1e-5)


def test_qr_leaf_combine():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((128, 32)).astype(np.float32)
    q, r = kernels.qr_leaf(a)
    assert q.shape == (128, 32) and r.shape == (32, 32)
    np.testing.assert_allclose(q @ r, a, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(q.T @ q, np.eye(32), atol=1e-4)
    assert np.allclose(np.tril(r, -1), 0)

    r2 = kernels.qr_r(rng.standard_normal((128, 32)).astype(np.float32))
    qt, qb, rc = kernels.qr_combine(r, r2)
    assert qt.shape == (32, 32) and qb.shape == (32, 32) and rc.shape == (32, 32)
    np.testing.assert_allclose(np.vstack([qt, qb]) @ rc, np.vstack([r, r2]), rtol=1e-4, atol=1e-4)


def test_lq_leaf():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((32, 128)).astype(np.float32)
    l, q = kernels.lq_leaf(a)
    np.testing.assert_allclose(l @ q, a, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(q @ q.T, np.eye(32), atol=1e-4)
    assert np.allclose(np.triu(l, 1), 0, atol=1e-5)


def test_structural():
    rng = np.random.default_rng(4)
    a = rng.standard_normal((16, 16)).astype(np.float32)
    b = rng.standard_normal((16, 16)).astype(np.float32)
    np.testing.assert_allclose(kernels.add(a, b), a + b, rtol=1e-6)
    np.testing.assert_allclose(kernels.sub(a, b), a - b, rtol=1e-6)
    np.testing.assert_array_equal(kernels.identity(a), np.eye(16, dtype=np.float32))
    np.testing.assert_array_equal(kernels.transpose(a), a.T)


def test_flop_count():
    assert kernels.flop_count("gemm", [(512, 512), (512, 512)]) == 2 * 512**3
    assert kernels.flop_count("potrf", [(512, 512)]) == 512**3 // 3
    assert kernels.flop_count("trsm", [(512, 512), (512, 512)]) == 512**3
