"""Whole-program TSQR vs numpy QR (reference tests/test_tsqr.py pattern;
parity up to column sign conventions)."""

import numpy as np
import pytest

from numpywren_tpu import alg_wrappers
from numpywren_tpu.alg_wrappers import tsqr_r_factor
from numpywren_tpu.runtime import PS, run_program


def _canon_sign(r):
    """Fix sign convention: make R's diagonal non-negative."""
    s = np.sign(np.diag(r))
    s[s == 0] = 1.0
    return s


@pytest.mark.parametrize("executor,storage", [("local", "host"), ("jax", "hbm")])
@pytest.mark.parametrize("n_rows", [256, 320])  # 320/64 = 5 leaves: ragged tree
def test_tsqr_r(executor, storage, n_rows, rng):
    x = rng.standard_normal((n_rows, 32)).astype(np.float32)
    prog, outputs, meta = alg_wrappers.tsqr(x, tile_rows=64, storage=storage)
    assert run_program(prog, executor=executor) == PS.SUCCESS
    r = tsqr_r_factor(outputs)
    r_ref = np.linalg.qr(x.astype(np.float64), mode="r")
    s, s_ref = _canon_sign(r), _canon_sign(r_ref)
    np.testing.assert_allclose(s[:, None] * r, s_ref[:, None] * r_ref, rtol=5e-3, atol=5e-4)


@pytest.mark.parametrize("executor,storage", [("local", "host"), ("jax", "hbm")])
def test_tsqr_with_q(executor, storage, rng):
    x = rng.standard_normal((320, 32)).astype(np.float32)
    prog, outputs, meta = alg_wrappers.tsqr(x, tile_rows=64, storage=storage, compute_q=True)
    assert run_program(prog, executor=executor) == PS.SUCCESS
    q = outputs["Q"].numpy()
    r = tsqr_r_factor(outputs)
    # Q R = X and Q orthonormal — sign-free checks
    np.testing.assert_allclose(q @ r, x, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(q.T @ q, np.eye(32), atol=5e-4)


@pytest.mark.parametrize("executor,storage", [("local", "host"), ("jax", "hbm")])
@pytest.mark.parametrize("n_rows,b_fac", [(320, 4), (576, 3), (1152, 4)])
def test_tsqr_r_kary(executor, storage, n_rows, b_fac, rng):
    """k-ary reducer (reference reducer's b_fac): wider tree nodes, fewer
    levels, same R. 320/64 = 5 leaves at b_fac=4 exercises the ragged
    tail (5 -> 2 -> 1); 1152/64 = 18 leaves gives depth 3."""
    x = rng.standard_normal((n_rows, 32)).astype(np.float32)
    prog, outputs, meta = alg_wrappers.tsqr(x, tile_rows=64, storage=storage,
                                            b_fac=b_fac)
    assert meta["b_fac"] == b_fac
    import math
    assert meta["depth"] == math.ceil(math.log(meta["n_leaves"], b_fac))
    assert run_program(prog, executor=executor) == PS.SUCCESS
    r = tsqr_r_factor(outputs)
    r_ref = np.linalg.qr(x.astype(np.float64), mode="r")
    s, s_ref = _canon_sign(r), _canon_sign(r_ref)
    np.testing.assert_allclose(s[:, None] * r, s_ref[:, None] * r_ref,
                               rtol=5e-3, atol=5e-4)


def test_tsqr_kary_depth_shrinks(rng):
    """b_fac=4 halves the tree depth vs binary (the point of k-ary trees:
    fewer sequential combine levels on wide leaf counts)."""
    x = rng.standard_normal((16 * 64, 32)).astype(np.float32)
    _, _, m2 = alg_wrappers.tsqr(x, tile_rows=64, storage="host", b_fac=2)
    _, _, m4 = alg_wrappers.tsqr(x, tile_rows=64, storage="host", b_fac=4)
    assert (m2["depth"], m4["depth"]) == (4, 2)


def test_tsqr_kary_compute_q_rejected(rng):
    from numpywren_tpu.exceptions import ShapeError
    x = rng.standard_normal((320, 32)).astype(np.float32)
    with pytest.raises(ShapeError):
        alg_wrappers.tsqr(x, tile_rows=64, compute_q=True, b_fac=4)


def test_tsqr_single_leaf(rng):
    x = rng.standard_normal((48, 16)).astype(np.float32)
    prog, outputs, meta = alg_wrappers.tsqr(x, tile_rows=64, storage="hbm", compute_q=True)
    assert meta["n_leaves"] == 1
    run_program(prog, executor="jax")
    q = outputs["Q"].numpy()
    r = tsqr_r_factor(outputs)
    np.testing.assert_allclose(q @ r, x, rtol=5e-3, atol=5e-3)
