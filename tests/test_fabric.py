"""Explicit-collective fabric tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from numpywren_tpu.exceptions import ShapeError
from numpywren_tpu.parallel.fabric import summa_gemm, tsqr_butterfly
from numpywren_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh2x2():
    return make_mesh(jax.devices()[:4], shape=(2, 2))


def test_summa_matches_numpy(mesh2x2, rng):
    a = rng.standard_normal((128, 64)).astype(np.float32)
    b = rng.standard_normal((64, 96)).astype(np.float32)
    c = np.asarray(summa_gemm(a, b, mesh=mesh2x2))
    np.testing.assert_allclose(c, a @ b, rtol=1e-4, atol=1e-4)


def test_summa_result_sharded(mesh2x2, rng):
    a = rng.standard_normal((64, 64)).astype(np.float32)
    c = summa_gemm(a, a, mesh=mesh2x2)
    assert len(c.sharding.device_set) == 4


def test_summa_rejects_nonsquare_mesh(rng):
    mesh = make_mesh(jax.devices()[:8], shape=(2, 4))
    a = rng.standard_normal((64, 64)).astype(np.float32)
    with pytest.raises(ShapeError):
        summa_gemm(a, a, mesh=mesh)


@pytest.mark.parametrize("p", [2, 4, 8])
def test_tsqr_butterfly(p, rng):
    mesh = make_mesh(jax.devices()[:p], shape=(1, p))
    a = rng.standard_normal((p * 32, 16)).astype(np.float32)
    r = np.asarray(tsqr_butterfly(a, mesh=mesh))
    np.testing.assert_allclose(r.T @ r, a.T @ a, rtol=1e-3, atol=1e-3)


def test_tsqr_butterfly_rejects_non_pow2(rng):
    devs = jax.devices()[:6]
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(devs), ("d",))
    a = rng.standard_normal((6 * 16, 8)).astype(np.float32)
    with pytest.raises(ShapeError):
        tsqr_butterfly(a, mesh=mesh, axis="d")


def test_tsqr_butterfly_vs_fused(rng):
    from numpywren_tpu.compiler.lower import fused_tsqr

    import jax.numpy as jnp

    mesh = make_mesh(jax.devices()[:8], shape=(1, 8))
    a = rng.standard_normal((8 * 32, 16)).astype(np.float32)
    r_bf = np.asarray(tsqr_butterfly(a, mesh=mesh))
    r_fu = np.asarray(fused_tsqr(jnp.asarray(a), tile_rows=32))
    np.testing.assert_allclose(
        np.abs(r_bf), np.abs(r_fu), rtol=1e-3, atol=1e-3
    )  # R unique up to row signs


@pytest.mark.parametrize("p", [4, 8])
def test_cholqr2_sharded(p, rng):
    from numpywren_tpu.parallel.fabric import cholqr2_sharded

    mesh = make_mesh(jax.devices()[:p], shape=(1, p))
    a = rng.standard_normal((p * 32, 16)).astype(np.float32)
    q, r = cholqr2_sharded(a, mesh=mesh, compute_q=True)
    q, r = np.asarray(q), np.asarray(r)
    np.testing.assert_allclose(q @ r, a, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(q.T @ q, np.eye(16), atol=1e-4)


def test_cholqr2_sharded_r_only(rng):
    from numpywren_tpu.parallel.fabric import cholqr2_sharded

    mesh = make_mesh(jax.devices()[:8], shape=(2, 4))  # flattened internally
    a = rng.standard_normal((8 * 32, 16)).astype(np.float32)
    r = np.asarray(cholqr2_sharded(a, mesh=mesh))
    np.testing.assert_allclose(r.T @ r, a.T @ a, rtol=1e-3, atol=1e-2)


@pytest.mark.parametrize("nb,p", [(8, 8), (8, 4), (10, 4), (3, 8)])
def test_cholesky_1d_blockcyclic(nb, p, rng):
    """Explicit-collective cholesky: block-cyclic panels, psum broadcast,
    local updates — must match scipy for ragged nb/P combinations."""
    import scipy.linalg

    from numpywren_tpu.matrix_init import random_spd
    from numpywren_tpu.parallel.fabric import cholesky_1d

    mesh = make_mesh(jax.devices()[:p], shape=(1, p))
    panel = 16
    a = random_spd(nb * panel, seed=nb * 10 + p)
    l = np.asarray(cholesky_1d(a, mesh=mesh, panel=panel))
    ref = scipy.linalg.cholesky(a.astype(np.float64), lower=True)
    np.testing.assert_allclose(l, ref, rtol=5e-3, atol=5e-4)
    resid = np.linalg.norm(a - l @ l.T) / np.linalg.norm(a)
    assert resid < 1e-5
