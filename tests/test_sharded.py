"""Multi-chip sharding tests on the virtual 8-device CPU mesh (the "fake
cluster" — SURVEY §4 lesson; the reference's analogous trick is running
job_runner in-process instead of on Lambda)."""

import numpy as np
import pytest
import scipy.linalg

import jax

from numpywren_tpu.matrix_init import random_spd
from numpywren_tpu.parallel import (
    make_mesh,
    sharded_cholesky,
    sharded_gemm,
    sharded_tsqr,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(jax.devices()[:8], shape=(2, 4))


def test_mesh_shape(mesh):
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("rows", "cols")


def test_sharded_cholesky(mesh):
    a = random_spd(256, seed=0)
    l = np.asarray(sharded_cholesky(a, tile=64, mesh=mesh))
    ref = scipy.linalg.cholesky(a.astype(np.float64), lower=True)
    np.testing.assert_allclose(l, ref, rtol=5e-3, atol=5e-4)
    resid = np.linalg.norm(a - l @ l.T) / np.linalg.norm(a)
    assert resid < 1e-5


def test_sharded_cholesky_is_actually_sharded(mesh):
    a = random_spd(256, seed=1)
    l = sharded_cholesky(a, tile=64, mesh=mesh)
    assert len(l.sharding.device_set) == 8  # result lives on all 8 devices


def test_sharded_gemm(mesh):
    rng = np.random.default_rng(2)
    a = rng.standard_normal((256, 128)).astype(np.float32)
    b = rng.standard_normal((128, 192)).astype(np.float32)
    c = np.asarray(sharded_gemm(a, b, mesh=mesh))
    np.testing.assert_allclose(c, a @ b, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n_leaves", [8, 11])
def test_sharded_tsqr(mesh, n_leaves):
    rng = np.random.default_rng(3)
    a = rng.standard_normal((n_leaves * 64, 32)).astype(np.float32)
    r = np.asarray(sharded_tsqr(a, tile_rows=64, mesh=mesh))
    np.testing.assert_allclose(r.T @ r, a.T @ a, rtol=1e-3, atol=1e-2)


def test_sharded_tsqr_q(mesh):
    rng = np.random.default_rng(4)
    a = rng.standard_normal((8 * 64, 32)).astype(np.float32)
    q, r = sharded_tsqr(a, tile_rows=64, mesh=mesh, compute_q=True)
    q, r = np.asarray(q), np.asarray(r)
    np.testing.assert_allclose(q @ r, a, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(q.T @ q, np.eye(32), atol=1e-4)
