"""BDFAC tests (reference: tests/test_bdfac.py — SURVEY §4.3): the block
bidiagonal result must preserve singular values (orthogonal invariance) and
Frobenius norm, through both the local (numpy) and jax executors."""

import numpy as np
import pytest

import numpywren_tpu as npw
from numpywren_tpu import kernels


# ---------------------------------------------------------------------------
# kernel-level unit tests
# ---------------------------------------------------------------------------

def test_qr_factor2_reconstructs(rng):
    t = 16
    top = rng.standard_normal((t, t)).astype(np.float32)
    bot = rng.standard_normal((t, t)).astype(np.float32)
    qtt, qtb, qbt, qbb, r = kernels.qr_factor2(top, bot)
    q = np.block([[qtt, qtb], [qbt, qbb]])
    np.testing.assert_allclose(q.T @ q, np.eye(2 * t), atol=1e-5)
    rec = q @ np.vstack([r, np.zeros_like(r)])
    np.testing.assert_allclose(rec, np.vstack([top, bot]), atol=1e-4)
    # qr_apply2 applied to the panel itself must give [r; 0]
    yt, yb = kernels.qr_apply2(qtt, qtb, qbt, qbb, top, bot)
    np.testing.assert_allclose(yt, r, atol=1e-4)
    np.testing.assert_allclose(yb, np.zeros_like(yb), atol=1e-4)


def test_lq_factor2_reconstructs(rng):
    t = 16
    left = rng.standard_normal((t, t)).astype(np.float32)
    right = rng.standard_normal((t, t)).astype(np.float32)
    qtt, qtb, qbt, qbb, l = kernels.lq_factor2(left, right)
    q = np.block([[qtt, qtb], [qbt, qbb]])
    np.testing.assert_allclose(q @ q.T, np.eye(2 * t), atol=1e-5)
    rec = np.hstack([l, np.zeros_like(l)]) @ q
    np.testing.assert_allclose(rec, np.hstack([left, right]), atol=1e-4)
    np.testing.assert_allclose(np.triu(l, 1), 0, atol=1e-5)
    yl, yr = kernels.lq_apply2(qtt, qtb, qbt, qbb, left, right)
    np.testing.assert_allclose(yl, l, atol=1e-4)
    np.testing.assert_allclose(yr, np.zeros_like(yr), atol=1e-4)


def test_jax_kernels_match_numpy(rng):
    from numpywren_tpu.ops import factor

    t = 16
    top = rng.standard_normal((t, t)).astype(np.float32)
    bot = rng.standard_normal((t, t)).astype(np.float32)
    outs_np = kernels.qr_factor2(top, bot)
    outs_jx = factor.qr_factor2(top, bot)
    # Q blocks can differ by column signs; compare |R| and reconstruction
    np.testing.assert_allclose(np.abs(outs_np[4]), np.abs(np.asarray(outs_jx[4])), atol=1e-3)
    q = np.block([[np.asarray(outs_jx[0]), np.asarray(outs_jx[1])],
                  [np.asarray(outs_jx[2]), np.asarray(outs_jx[3])]])
    rec = q @ np.vstack([np.asarray(outs_jx[4]), np.zeros((t, t), np.float32)])
    np.testing.assert_allclose(rec, np.vstack([top, bot]), atol=1e-4)


# ---------------------------------------------------------------------------
# whole-program tests
# ---------------------------------------------------------------------------

def _bidiag_checks(b_mat, x, n_tiles, t):
    bd = b_mat.numpy()
    # block structure: zero outside diagonal + superdiagonal blocks
    for i in range(n_tiles):
        for j in range(n_tiles):
            if j not in (i, i + 1):
                blk = bd[i * t : (i + 1) * t, j * t : (j + 1) * t]
                np.testing.assert_allclose(blk, 0, atol=1e-4)
    # singular values preserved (orthogonal transforms)
    sv_in = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    sv_out = np.linalg.svd(bd.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(sv_out, sv_in, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("executor", ["local", "jax"])
@pytest.mark.parametrize("n_tiles", [1, 2, 3, 4])
def test_bdfac_preserves_singular_values(rng, executor, n_tiles):
    t = 16
    x = rng.standard_normal((n_tiles * t, n_tiles * t)).astype(np.float32)
    storage = "host" if executor == "local" else "hbm"
    prog, b, meta = npw.bdfac(x, tile=(t, t), storage=storage)
    npw.run_program(prog, executor=executor)
    _bidiag_checks(b, x, n_tiles, t)


def test_bdfac_rejects_nonsquare(rng):
    x = rng.standard_normal((64, 32)).astype(np.float32)
    from numpywren_tpu.exceptions import ShapeError

    with pytest.raises(ShapeError):
        npw.bdfac(x, tile=(32, 32))


@pytest.mark.parametrize("n_tiles", [1, 2, 3, 5])
def test_bdfac_fused(rng, n_tiles):
    """The fused compact-WY lowering preserves singular values and the
    block-bidiagonal structure (lower_fused path)."""
    t = 16
    x = rng.standard_normal((n_tiles * t, n_tiles * t)).astype(np.float32)
    prog, b, meta = npw.bdfac(x, tile=(t, t))
    npw.run_program(prog, executor="fused")
    _bidiag_checks(b, x, n_tiles, t)


def test_fused_bdfac_array_level(rng):
    from numpywren_tpu.compiler.lower import fused_bdfac
    import jax.numpy as jnp

    x = rng.standard_normal((128, 128)).astype(np.float32)
    bd = np.asarray(fused_bdfac(jnp.asarray(x), tile=32))
    sv_in = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    sv_out = np.linalg.svd(bd.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(sv_out, sv_in, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# GEMM-only inverse primitives (NPW_GEMM_INV custom-call elimination)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("b", [16, 48, 64, 512])
def test_trtri_gemm_matches_inverse(rng, b):
    """Nilpotent-doubling triangular inverse == exact inverse for the
    conditioning regime the shifted chain guarantees (kappa(L) <= ~33)."""
    from numpywren_tpu.compiler.lower import _trtri_gemm
    import jax
    import jax.numpy as jnp

    # build an L like a shifted-Gram chol factor: SPD with bounded cond
    q, _ = np.linalg.qr(rng.standard_normal((b, b)))
    s = np.geomspace(1.0, 1e-3, b)  # cond(G)=1e3 -> cond(L)~33
    g = (q * s) @ q.T
    l = np.linalg.cholesky(g + 1e-9 * np.eye(b)).astype(np.float32)
    linv = np.asarray(_trtri_gemm(jnp.asarray(l),
                                  jax.lax.Precision.HIGHEST))
    err = np.abs(linv @ l - np.eye(b)).max()
    assert err < 5e-5, err


def test_ns_inv_matches_inverse(rng):
    """Newton-Schulz inverse converges for cond <= ~25 (the W1 regime)."""
    from numpywren_tpu.compiler.lower import _ns_inv
    import jax
    import jax.numpy as jnp

    b = 96
    u, _ = np.linalg.qr(rng.standard_normal((b, b)))
    v, _ = np.linalg.qr(rng.standard_normal((b, b)))
    s = np.geomspace(2.0, 2.0 / 25.0, b)  # cond = 25
    a = ((u * s) @ v.T).astype(np.float32)
    x = np.asarray(_ns_inv(jnp.asarray(a), jax.lax.Precision.HIGHEST))
    err = np.abs(x @ a - np.eye(b)).max()
    assert err < 5e-5, err


def test_fused_bdfac_gemm_inv_parity(rng, monkeypatch):
    """NPW_GEMM_INV=1 (GEMM-only panel algebra) preserves singular values
    to the same bar as the custom-call path. Distinct (n, tile) signature:
    the flag is read at trace time and _jitted_bdfac caches by shape."""
    from numpywren_tpu.compiler import lower
    import jax.numpy as jnp

    monkeypatch.setenv("NPW_GEMM_INV", "1")
    x = rng.standard_normal((192, 192)).astype(np.float32)
    bd = np.asarray(lower.fused_bdfac(jnp.asarray(x), tile=48))
    sv_in = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    sv_out = np.linalg.svd(bd.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(sv_out, sv_in, rtol=1e-3, atol=1e-3)
    # bidiagonal block structure intact (band <= 2*tile - 1)
    assert np.abs(np.tril(bd, -1)).max() < 1e-3 * np.abs(bd).max()
