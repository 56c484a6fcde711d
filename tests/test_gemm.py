"""Whole-program blocked GEMM vs numpy (BASELINE config #1 semantics)."""

import numpy as np
import pytest

from numpywren_tpu import alg_wrappers
from numpywren_tpu.runtime import PS, run_program


@pytest.mark.parametrize("executor,storage", [("local", "host"), ("jax", "hbm")])
def test_gemm_square(executor, storage, rng):
    a = rng.standard_normal((128, 96)).astype(np.float32)
    b = rng.standard_normal((96, 64)).astype(np.float32)
    prog, c, meta = alg_wrappers.gemm(a, b, tile=(32, 32), storage=storage)
    assert run_program(prog, executor=executor) == PS.SUCCESS
    np.testing.assert_allclose(c.numpy(), a @ b, rtol=1e-4, atol=1e-4)


def test_gemm_single_tile(rng):
    a = rng.standard_normal((32, 32)).astype(np.float32)
    b = rng.standard_normal((32, 32)).astype(np.float32)
    prog, c, _ = alg_wrappers.gemm(a, b, tile=(32, 32), storage="hbm")
    run_program(prog, executor="jax")
    np.testing.assert_allclose(c.numpy(), a @ b, rtol=1e-4, atol=1e-4)
