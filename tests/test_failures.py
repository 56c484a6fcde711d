"""Fault-tolerance tests (reference tests/test_failures.py pattern via
lambdapack_run_with_failures): kill a fraction of tasks mid-flight and
duplicate messages, assert the program still converges to SUCCESS with a
correct numerical result — exercising redelivery + idempotent writes + CAS.
"""

import numpy as np
import scipy.linalg

from numpywren_tpu import alg_wrappers
from numpywren_tpu.runtime import PS, LocalExecutor


def test_cholesky_with_failures():
    a_dim = 96
    rng = np.random.default_rng(7)
    x = rng.standard_normal((a_dim, a_dim)).astype(np.float64)
    a = (x @ x.T / a_dim + 2 * np.eye(a_dim)).astype(np.float32)
    prog, out, _ = alg_wrappers.cholesky(a, tile=(32, 32), storage="host")
    ex = LocalExecutor(prog, num_workers=4, fault_rate=0.2, seed=123)
    assert ex.run(timeout=60) == PS.SUCCESS
    ref = scipy.linalg.cholesky(a.astype(np.float64), lower=True)
    np.testing.assert_allclose(out.numpy(), ref, rtol=5e-3, atol=5e-4)


def test_gemm_with_duplicate_delivery():
    rng = np.random.default_rng(8)
    a = rng.standard_normal((96, 96)).astype(np.float32)
    b = rng.standard_normal((96, 96)).astype(np.float32)
    prog, c, _ = alg_wrappers.gemm(a, b, tile=(32, 32), storage="host")
    ex = LocalExecutor(prog, num_workers=4, fault_rate=0.1, duplicate_rate=0.3, seed=5)
    assert ex.run(timeout=60) == PS.SUCCESS
    np.testing.assert_allclose(c.numpy(), a @ b, rtol=1e-4, atol=1e-4)


def test_tsqr_with_failures():
    rng = np.random.default_rng(9)
    x = rng.standard_normal((320, 32)).astype(np.float32)
    prog, outputs, _ = alg_wrappers.tsqr(x, tile_rows=64, storage="host")
    ex = LocalExecutor(prog, num_workers=4, fault_rate=0.25, seed=99)
    assert ex.run(timeout=60) == PS.SUCCESS
    r = alg_wrappers.tsqr_r_factor(outputs)
    r_ref = np.linalg.qr(x.astype(np.float64), mode="r")
    s = np.sign(np.diag(r)); s[s == 0] = 1
    sr = np.sign(np.diag(r_ref)); sr[sr == 0] = 1
    np.testing.assert_allclose(s[:, None] * r, sr[:, None] * r_ref, rtol=5e-3, atol=5e-4)
