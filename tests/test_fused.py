"""Region-fused lowering tests (compiler.lower): the fused fast path must
agree with scipy/numpy references AND with the generic executor paths, per
the reference test strategy (whole-program tests on small N, SURVEY §4.3)."""

import numpy as np
import pytest
import scipy.linalg

import numpywren_tpu as npw
from numpywren_tpu.compiler.lower import fused_cholesky, fused_gemm, fused_tsqr
from numpywren_tpu.matrix_init import random_spd


# ---------------------------------------------------------------------------
# array-level fused kernels
# ---------------------------------------------------------------------------

def test_fused_cholesky_matches_scipy():
    a = random_spd(256, seed=1)
    import jax.numpy as jnp

    l = np.asarray(fused_cholesky(jnp.asarray(a), tile=64))
    ref = scipy.linalg.cholesky(a.astype(np.float64), lower=True)
    resid = np.linalg.norm(a - l @ l.T) / np.linalg.norm(a)
    ref_resid = np.linalg.norm(a.astype(np.float64) - ref @ ref.T) / np.linalg.norm(a)
    assert resid < max(1e-5, 100 * ref_resid)
    np.testing.assert_allclose(l, ref, rtol=5e-3, atol=5e-4)


@pytest.mark.parametrize("syrk_depth", [0, 1, 3])
def test_fused_cholesky_syrk_depth(syrk_depth):
    a = random_spd(192, seed=2)
    import jax.numpy as jnp

    l = np.asarray(fused_cholesky(jnp.asarray(a), tile=64, syrk_depth=syrk_depth))
    resid = np.linalg.norm(a - l @ l.T) / np.linalg.norm(a)
    assert resid < 1e-5


@pytest.mark.parametrize("inv_panel", [True, False])
def test_fused_cholesky_split_straddles_tile(inv_panel):
    """Regression: recursive syrk splits must land on tile boundaries — a
    split through a diagonal tile leaves stale upper-triangle values that a
    non-symmetrizing potrf must never read. leaf_rows shrunk so the
    recursion actually splits, with odd row counts at several levels."""
    a = random_spd(1280, seed=11)
    import jax.numpy as jnp

    l = np.asarray(fused_cholesky(jnp.asarray(a), tile=128, syrk_depth=3,
                                  leaf_rows=256, inv_panel=inv_panel))
    resid = np.linalg.norm(a - l @ l.T) / np.linalg.norm(a)
    assert resid < 1e-5


def test_fused_gemm():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((192, 128)).astype(np.float32)
    b = rng.standard_normal((128, 256)).astype(np.float32)
    import jax.numpy as jnp

    c = np.asarray(fused_gemm(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(c, a @ b, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n_leaves", [1, 2, 3, 7, 8])
def test_fused_tsqr_r(n_leaves):
    rng = np.random.default_rng(3)
    a = rng.standard_normal((n_leaves * 64, 32)).astype(np.float32)
    import jax.numpy as jnp

    r = np.asarray(fused_tsqr(jnp.asarray(a), tile_rows=64))
    # R is unique up to row signs; compare Gram matrices
    np.testing.assert_allclose(
        r.T @ r, (a.T @ a).astype(np.float32), rtol=1e-3, atol=1e-2
    )


@pytest.mark.parametrize("n_leaves", [2, 5])
def test_fused_tsqr_q(n_leaves):
    rng = np.random.default_rng(4)
    a = rng.standard_normal((n_leaves * 64, 32)).astype(np.float32)
    import jax.numpy as jnp

    q, r = fused_tsqr(jnp.asarray(a), tile_rows=64, compute_q=True)
    q, r = np.asarray(q), np.asarray(r)
    np.testing.assert_allclose(q @ r, a, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(q.T @ q, np.eye(32), atol=1e-4)


@pytest.mark.parametrize("n_leaves,b_fac", [(5, 4), (9, 3), (16, 4), (7, 8)])
def test_fused_tsqr_r_kary(n_leaves, b_fac):
    """b-ary fused combine tree (reducer b_fac parity): ragged tails are
    zero-padded into one static batched QR per level; R must match."""
    rng = np.random.default_rng(31)
    a = rng.standard_normal((n_leaves * 64, 32)).astype(np.float32)
    import jax.numpy as jnp

    r = np.asarray(fused_tsqr(jnp.asarray(a), tile_rows=64, b_fac=b_fac))
    np.testing.assert_allclose(
        r.T @ r, (a.T @ a).astype(np.float32), rtol=1e-3, atol=1e-2
    )


@pytest.mark.parametrize("n_leaves,b_fac", [(5, 4), (10, 3)])
def test_fused_tsqr_q_kary(n_leaves, b_fac):
    """Q reconstruction through the b-ary downward sweep: padded combine-Q
    slices must be discarded, leaving an exactly orthonormal thin Q."""
    rng = np.random.default_rng(32)
    a = rng.standard_normal((n_leaves * 64, 32)).astype(np.float32)
    import jax.numpy as jnp

    q, r = fused_tsqr(jnp.asarray(a), tile_rows=64, compute_q=True, b_fac=b_fac)
    q, r = np.asarray(q), np.asarray(r)
    np.testing.assert_allclose(q @ r, a, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(q.T @ q, np.eye(32), atol=1e-4)


def test_program_tsqr_kary_fused():
    rng = np.random.default_rng(33)
    a = rng.standard_normal((6 * 64, 32)).astype(np.float32)
    prog, outs, meta = npw.tsqr(a, tile_rows=64, b_fac=4)
    npw.run_program(prog, executor="fused")
    from numpywren_tpu.alg_wrappers import tsqr_r_factor

    r = tsqr_r_factor(outs)
    np.testing.assert_allclose(r.T @ r, a.T @ a, rtol=1e-3, atol=1e-2)


# ---------------------------------------------------------------------------
# program-level dispatch: run_program(executor="fused") == generic paths
# ---------------------------------------------------------------------------

def test_program_cholesky_fused_vs_jax():
    a = random_spd(160, seed=5)
    prog_f, l_f, _ = npw.cholesky(a, tile=(32, 32))
    npw.run_program(prog_f, executor="fused")
    prog_j, l_j, _ = npw.cholesky(a, tile=(32, 32))
    npw.run_program(prog_j, executor="jax")
    np.testing.assert_allclose(l_f.numpy(), l_j.numpy(), rtol=1e-4, atol=1e-4)


def test_program_gemm_fused():
    rng = np.random.default_rng(6)
    a = rng.standard_normal((96, 64)).astype(np.float32)
    b = rng.standard_normal((64, 96)).astype(np.float32)
    prog, c, _ = npw.gemm(a, b, tile=(32, 32))
    npw.run_program(prog, executor="fused")
    np.testing.assert_allclose(c.numpy(), a @ b, rtol=1e-4, atol=1e-4)


def test_program_tsqr_fused():
    rng = np.random.default_rng(7)
    a = rng.standard_normal((6 * 64, 32)).astype(np.float32)
    prog, outs, meta = npw.tsqr(a, tile_rows=64)
    npw.run_program(prog, executor="fused")
    from numpywren_tpu.alg_wrappers import tsqr_r_factor

    r = tsqr_r_factor(outs)
    np.testing.assert_allclose(r.T @ r, a.T @ a, rtol=1e-3, atol=1e-2)


def test_program_tsqr_q_fused():
    rng = np.random.default_rng(8)
    a = rng.standard_normal((5 * 64, 32)).astype(np.float32)
    prog, outs, meta = npw.tsqr(a, tile_rows=64, compute_q=True)
    npw.run_program(prog, executor="fused")
    q = outs["Q"].numpy()[: a.shape[0]]
    from numpywren_tpu.alg_wrappers import tsqr_r_factor

    r = tsqr_r_factor(outs)
    np.testing.assert_allclose(q @ r, a, rtol=1e-3, atol=1e-3)


def test_cholesky_truncate_prefix():
    """truncate=t runs only the first g-t panels (reference algs.cholesky
    truncate parity); the factored prefix must match the full factor."""
    a = random_spd(160, seed=9)
    prog, l, meta = npw.cholesky(a, tile=(32, 32), truncate=2)
    npw.run_program(prog, executor="fused")
    full = scipy.linalg.cholesky(a.astype(np.float64), lower=True)
    done = (meta["grid"] - 2) * 32
    np.testing.assert_allclose(
        l.numpy()[:, :done], full[:, :done], rtol=5e-3, atol=5e-4
    )


def test_auto_falls_back_to_generic():
    """A program with no fused specialization must still run via auto."""
    from numpywren_tpu.frontend import lpcompile
    from numpywren_tpu.tiled import TiledMatrix

    src = """
def scale_all(A, B, N):
    for i in range(0, N):
        for j in range(0, N):
            B[i, j] = copy(A[i, j])
"""
    t = lpcompile(src)
    rng = np.random.default_rng(10)
    arr = rng.standard_normal((64, 64)).astype(np.float32)
    from numpywren_tpu.matrix_init import shard_matrix

    a = shard_matrix(arr, tile=(32, 32))
    b = TiledMatrix(shape=(64, 64), tile=(32, 32), storage="hbm")
    prog = t.bind(A=a, B=b, N=2)
    npw.run_program(prog, executor="auto")
    np.testing.assert_allclose(b.numpy(), arr)


@pytest.mark.parametrize("compute_q", [False, True])
def test_cholqr2(rng, compute_q):
    """CholeskyQR2 path: Gram parity + orthogonality on well-conditioned
    input (the MXU-native tall-skinny QR; tree path covers ill-conditioned)."""
    import jax.numpy as jnp

    a = rng.standard_normal((8 * 64, 32)).astype(np.float32)
    out = fused_tsqr(jnp.asarray(a), tile_rows=64, compute_q=compute_q,
                     method="cholqr2")
    if compute_q:
        q, r = (np.asarray(x) for x in out)
        np.testing.assert_allclose(q @ r, a, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(q.T @ q, np.eye(32), atol=1e-4)
    else:
        r = np.asarray(out)
        np.testing.assert_allclose(r.T @ r, a.T @ a, rtol=1e-3, atol=1e-2)


def test_program_tsqr_cholqr2(rng):
    a = rng.standard_normal((6 * 64, 32)).astype(np.float32)
    prog, outs, meta = npw.tsqr(a, tile_rows=64, method="cholqr2", compute_q=True)
    npw.run_program(prog, executor="fused")
    from numpywren_tpu.alg_wrappers import tsqr_r_factor

    q = outs["Q"].numpy()[: a.shape[0]]
    r = tsqr_r_factor(outs)
    np.testing.assert_allclose(q @ r, a, rtol=1e-3, atol=1e-3)


def test_gemm3_interpret_path(rng):
    """bf16x3 kernel falls back to exact fp32 matmul on the CPU backend."""
    from numpywren_tpu.ops.gemm3 import matmul3
    import jax.numpy as jnp

    a = rng.standard_normal((128, 64)).astype(np.float32)
    b = rng.standard_normal((128, 64)).astype(np.float32)
    c = rng.standard_normal((128, 128)).astype(np.float32)
    out = np.asarray(matmul3(jnp.asarray(a), jnp.asarray(b), tb=True))
    np.testing.assert_allclose(out, a @ b.T, rtol=1e-5, atol=1e-5)
    out2 = np.asarray(matmul3(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), tb=True))
    np.testing.assert_allclose(out2, c - a @ b.T, rtol=1e-5, atol=1e-5)


def test_compensated_mode_cholesky(monkeypatch):
    """NpwConfig.compensated routes HIGH matmuls through the bf16x3 kernel;
    on CPU both paths are plain fp32 — this exercises the dispatch."""
    from numpywren_tpu import config

    monkeypatch.setattr(config, "_default", config.NpwConfig(compensated=True))
    a = random_spd(160, seed=12)
    prog, l, _ = npw.cholesky(a, tile=(32, 32))
    npw.run_program(prog, executor="fused")
    ln = l.numpy()
    resid = np.linalg.norm(a - ln @ ln.T) / np.linalg.norm(a)
    assert resid < 1e-5


@pytest.mark.parametrize("n", [96, 160, 224, 288, 416, 544])
def test_fused_cholesky_odd_geometries(n):
    """Edge geometry sweep: sizes that pad, straddle super-panels, and leave
    ragged last column blocks must all match scipy."""
    a = random_spd(n, seed=n)
    prog, l, _ = npw.cholesky(a, tile=(64, 64))
    npw.run_program(prog, executor="fused")
    ln = l.numpy()
    ref = scipy.linalg.cholesky(a.astype(np.float64), lower=True)
    np.testing.assert_allclose(ln, ref, rtol=5e-3, atol=5e-4)
