"""Whole-program Cholesky tests vs scipy (reference tests/test_cholesky.py
pattern: build small SPD matrix, compile, execute in-process, compare)."""

import numpy as np
import pytest
import scipy.linalg

from numpywren_tpu import alg_wrappers
from numpywren_tpu.matrix_init import random_spd, shard_matrix
from numpywren_tpu.runtime import PS, run_program


def _residual(a, l):
    return np.linalg.norm(a - np.tril(l) @ np.tril(l).T) / np.linalg.norm(a)


@pytest.mark.parametrize("executor,storage", [("local", "host"), ("jax", "hbm")])
def test_cholesky_small(executor, storage):
    a = random_spd(128, seed=0)
    prog, out, meta = alg_wrappers.cholesky(a, tile=(32, 32), storage=storage)
    status = run_program(prog, executor=executor)
    assert status == PS.SUCCESS
    l = out.numpy()
    assert np.allclose(np.triu(l, 1), 0, atol=1e-5)
    ref = scipy.linalg.cholesky(a.astype(np.float64), lower=True)
    assert _residual(a, l) < 5e-6
    np.testing.assert_allclose(l, ref, rtol=5e-3, atol=5e-4)


def test_cholesky_executors_agree():
    a = random_spd(96, seed=3)
    p1, o1, _ = alg_wrappers.cholesky(a, tile=(32, 32), storage="host")
    run_program(p1, executor="local")
    p2, o2, _ = alg_wrappers.cholesky(a, tile=(32, 32), storage="hbm")
    run_program(p2, executor="jax")
    np.testing.assert_allclose(o1.numpy(), o2.numpy(), rtol=1e-4, atol=1e-5)


def test_cholesky_nondivisible_shape():
    """Logical N not divisible by tile: identity padding keeps tiles SPD."""
    a = random_spd(100, seed=4)
    prog, out, _ = alg_wrappers.cholesky(a, tile=(32, 32), storage="hbm")
    run_program(prog, executor="jax")
    l = out.numpy()
    assert l.shape == (100, 100)
    assert _residual(a, l) < 5e-6


def test_cholesky_tiled_input():
    a = random_spd(128, seed=5)
    x = shard_matrix(a, tile=(64, 64), storage="hbm")
    prog, out, _ = alg_wrappers.cholesky(x)
    run_program(prog, executor="jax")
    assert _residual(a, out.numpy()) < 5e-6


def test_cholesky_truncate():
    """Prefix runs (reference truncate param): first k panels are final."""
    a = random_spd(128, seed=6)
    prog, out, _ = alg_wrappers.cholesky(a, tile=(32, 32), storage="hbm", truncate=2)
    run_program(prog, executor="jax")
    full = scipy.linalg.cholesky(a.astype(np.float64), lower=True)
    l = out.numpy()
    # completed panel columns (first N - truncate tile columns) match the
    # full factorization; untouched columns stay zero
    np.testing.assert_allclose(np.tril(l)[:, :64], np.tril(full)[:, :64], rtol=5e-3, atol=5e-4)
    assert np.allclose(l[:, 64:], 0)


def test_fp64_parity_via_local_executor():
    """The reference stores float64 blocks and computes in fp64 (LAPACK).
    Full parity path here: float64 host-tier storage + the LocalExecutor's
    numpy kernels => scipy-fp64-grade residual (~1e-15), independent of the
    TPU's fp32 hardware."""
    import numpy as np
    import scipy.linalg

    import numpywren_tpu as npw
    from numpywren_tpu.matrix_init import random_spd, shard_matrix

    a = random_spd(128, seed=42, dtype=np.float64)
    at = shard_matrix(a, tile=(32, 32), storage="host", dtype=np.float64)
    prog, l, _ = npw.cholesky(at, tile=(32, 32), storage="host")
    npw.run_program(prog, executor="local")
    ln = np.tril(l.numpy())
    assert ln.dtype == np.float64
    resid = np.linalg.norm(a - ln @ ln.T) / np.linalg.norm(a)
    assert resid < 1e-14, resid
    ref = scipy.linalg.cholesky(a, lower=True)
    np.testing.assert_allclose(ln, ref, rtol=1e-12, atol=1e-12)


def test_cholesky_solve():
    import numpy as np

    import numpywren_tpu as npw
    from numpywren_tpu.matrix_init import random_spd

    a = random_spd(160, seed=5)  # padded to 192 with tile 64 (pad path)
    prog, l, _ = npw.cholesky(a, tile=(64, 64))
    npw.run_program(prog)
    rng = np.random.default_rng(0)
    b = rng.standard_normal((160, 3)).astype(np.float32)
    x = npw.cholesky_solve(l, b)
    np.testing.assert_allclose(a @ x, b, rtol=1e-3, atol=1e-3)
    x1 = npw.cholesky_solve(l, b[:, 0])
    assert x1.shape == (160,)
    np.testing.assert_allclose(a @ x1, b[:, 0], rtol=1e-3, atol=1e-3)
