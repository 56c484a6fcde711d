"""Blockwise-op tests (reference: tests/test_binops.py — small GEMM through
the local pywren executor vs np.dot, SURVEY §4.2)."""

import numpy as np
import pytest

from numpywren_tpu import binops
from numpywren_tpu.matrix_init import shard_matrix


@pytest.mark.parametrize("storage", ["host", "hbm"])
def test_gemm_matches_numpy(rng, storage):
    a = rng.standard_normal((192, 256)).astype(np.float32)
    b = rng.standard_normal((256, 128)).astype(np.float32)
    at = shard_matrix(a, tile=(64, 64), storage=storage)
    bt = shard_matrix(b, tile=(64, 64), storage=storage)
    pwex = binops.default_executor(4)
    c = binops.gemm(pwex, at, bt)
    np.testing.assert_allclose(c.numpy(), a @ b, rtol=1e-4, atol=1e-4)
    pwex.shutdown()


def test_gemm_ragged_edges(rng):
    # shapes not multiples of the tile: padded tiles must not pollute output
    a = rng.standard_normal((100, 70)).astype(np.float32)
    b = rng.standard_normal((70, 90)).astype(np.float32)
    at = shard_matrix(a, tile=(64, 64), storage="host")
    bt = shard_matrix(b, tile=(64, 64), storage="host")
    c = binops.gemm(None, at, bt)
    assert c.shape == (100, 90)
    np.testing.assert_allclose(c.numpy(), a @ b, rtol=1e-4, atol=1e-4)


def test_gemm_tasks_per_job(rng):
    a = rng.standard_normal((128, 128)).astype(np.float32)
    b = rng.standard_normal((128, 128)).astype(np.float32)
    at = shard_matrix(a, tile=(32, 32), storage="host")
    bt = shard_matrix(b, tile=(32, 32), storage="host")
    c = binops.gemm(None, at, bt, tasks_per_job=5)
    np.testing.assert_allclose(c.numpy(), a @ b, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("storage", ["host", "hbm"])
def test_add_sub(rng, storage):
    a = rng.standard_normal((96, 96)).astype(np.float32)
    b = rng.standard_normal((96, 96)).astype(np.float32)
    at = shard_matrix(a, tile=(32, 32), storage=storage)
    bt = shard_matrix(b, tile=(32, 32), storage=storage)
    np.testing.assert_allclose(binops.add(None, at, bt).numpy(), a + b, rtol=1e-6)
    np.testing.assert_allclose(binops.sub(None, at, bt).numpy(), a - b, rtol=1e-6)


def test_uop(rng):
    a = np.abs(rng.standard_normal((64, 64))).astype(np.float32) + 1.0
    at = shard_matrix(a, tile=(32, 32), storage="host")
    c = binops.elemwise_uop(None, at, np.sqrt, name="sqrt")
    np.testing.assert_allclose(c.numpy(), np.sqrt(a), rtol=1e-6)


def test_output_key_deterministic(rng):
    a = rng.standard_normal((64, 64)).astype(np.float32)
    at = shard_matrix(a, tile=(32, 32), storage="host", key="A")
    bt = shard_matrix(a, tile=(32, 32), storage="host", key="B")
    c1 = binops.gemm(None, at, bt)
    c2 = binops.gemm(None, at, bt)
    assert c1.key == c2.key  # deterministic naming (idempotent re-execution)
