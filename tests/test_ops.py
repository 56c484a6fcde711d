"""Per-kernel device-op tests vs the numpy/scipy reference kernels
(the rebuild analog of per-kernel tile tests, SURVEY §4 lesson (b)).

On the CPU test backend Pallas kernels run interpreted; the same code
compiles to Mosaic on TPU.
"""

import numpy as np
import pytest

from numpywren_tpu import kernels as ref
from numpywren_tpu import ops
from numpywren_tpu.matrix_init import random_spd

RTOL = 2e-4
ATOL = 2e-4


@pytest.fixture
def mats(rng):
    a = rng.standard_normal((256, 128)).astype(np.float32)
    b = rng.standard_normal((128, 256)).astype(np.float32)
    return a, b


def test_matmul_plain(mats):
    a, b = mats
    out = np.asarray(ops.matmul(a, b, bm=128, bn=128, bk=64))
    np.testing.assert_allclose(out, a @ b, rtol=RTOL, atol=ATOL)


def test_matmul_transposes(rng):
    a = rng.standard_normal((128, 256)).astype(np.float32)
    b = rng.standard_normal((128, 256)).astype(np.float32)
    c = rng.standard_normal((64, 256)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(ops.gemm_tn(a, b)), a.T @ b, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(ops.gemm_nt(a, c)), a @ c.T, rtol=RTOL, atol=ATOL)


def test_matmul_epilogue(rng):
    a = rng.standard_normal((128, 128)).astype(np.float32)
    b = rng.standard_normal((128, 128)).astype(np.float32)
    c = rng.standard_normal((128, 128)).astype(np.float32)
    out = np.asarray(ops.matmul(a, b, c, alpha=2.0, beta=-3.0))
    np.testing.assert_allclose(out, 2.0 * (a @ b) - 3.0 * c, rtol=RTOL, atol=ATOL)


def test_gemm_acc_matches_reference(rng):
    c = rng.standard_normal((128, 128)).astype(np.float32)
    a = rng.standard_normal((128, 128)).astype(np.float32)
    b = rng.standard_normal((128, 128)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ops.gemm_acc(c, a, b)), ref.gemm_acc(c, a, b), rtol=RTOL, atol=ATOL
    )


def test_syrk_update(rng):
    s = rng.standard_normal((128, 128)).astype(np.float32)
    x = rng.standard_normal((128, 64)).astype(np.float32)
    y = rng.standard_normal((128, 64)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ops.syrk_update(s, x, y)), ref.syrk(s, x, y), rtol=RTOL, atol=ATOL
    )


def test_matmul_grid_multiblock(rng):
    """Exercise a real multi-block grid incl. sequential K accumulation."""
    a = rng.standard_normal((512, 384)).astype(np.float32)
    b = rng.standard_normal((384, 256)).astype(np.float32)
    out = np.asarray(ops.matmul(a, b, bm=128, bn=128, bk=128))
    np.testing.assert_allclose(out, a @ b, rtol=RTOL, atol=ATOL)


def test_potrf_trsm(rng):
    a = random_spd(128, seed=5)
    l = np.asarray(ops.potrf(a))
    np.testing.assert_allclose(l, ref.potrf(a), rtol=1e-3, atol=1e-3)
    pan = rng.standard_normal((256, 128)).astype(np.float32)
    x = np.asarray(ops.trsm(pan, l))
    np.testing.assert_allclose(x @ l.T, pan, rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(x, ref.trsm(pan, l), rtol=1e-2, atol=1e-2)


def test_qr_family(rng):
    a = rng.standard_normal((256, 64)).astype(np.float32)
    q, r = ops.qr_leaf(a)
    q, r = np.asarray(q), np.asarray(r)
    np.testing.assert_allclose(q @ r, a, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(q.T @ q, np.eye(64), atol=1e-3)

    r2 = np.asarray(ops.qr_r(rng.standard_normal((256, 64)).astype(np.float32)))
    qt, qb, rc = ops.qr_combine(r, r2)
    np.testing.assert_allclose(
        np.vstack([np.asarray(qt), np.asarray(qb)]) @ np.asarray(rc),
        np.vstack([r, r2]), rtol=1e-3, atol=1e-3,
    )

    l, qq = ops.lq_leaf(a.T.copy())
    np.testing.assert_allclose(np.asarray(l) @ np.asarray(qq), a.T, rtol=1e-3, atol=1e-3)


def test_dispatch_table_covers_reference():
    missing = set(ref.KERNELS) - set(ops.JAX_KERNELS)
    assert not missing, f"device kernels missing for: {missing}"
