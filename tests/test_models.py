"""models/: finished SVD + least-squares families built on the fused
factorizations (the reference stops at the precursors; SURVEY §2 algs)."""

import numpy as np
import pytest

from numpywren_tpu import models


def _logspace_matrix(rng, m, n, kappa):
    """Random matrix with logspace spectrum and condition number kappa."""
    k = min(m, n)
    u, _ = np.linalg.qr(rng.standard_normal((m, k)))
    v, _ = np.linalg.qr(rng.standard_normal((n, k)))
    s = np.logspace(0, -np.log10(kappa), k)
    return (u * s) @ v.T, s


# ---------------------------------------------------------------------------
# singular_values: two-stage BDFAC + banded Golub-Kahan finish
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("finish", ["band", "dense"])
@pytest.mark.parametrize("n,tile", [(64, 16), (96, 32)])
def test_singular_values(rng, finish, n, tile):
    x = rng.standard_normal((n, n)).astype(np.float32)
    s = models.singular_values(x, tile=tile, finish=finish)
    s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    assert s.shape == (n,)
    np.testing.assert_allclose(s, s_ref, rtol=1e-3, atol=1e-3)


def test_singular_values_pad(rng):
    """n not a multiple of tile: zero-padding must not perturb sigma."""
    x = rng.standard_normal((70, 70)).astype(np.float32)
    s = models.singular_values(x, tile=32)
    s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(s, s_ref, rtol=1e-3, atol=1e-3)


def test_singular_values_small_sigma_accuracy(rng):
    """The GK banded finish must not square the condition number: small
    singular values of a kappa=1e4 matrix keep relative accuracy."""
    x, s_true = _logspace_matrix(rng, 64, 64, kappa=1e4)
    x = x.astype(np.float32)
    s = models.singular_values(x, tile=16)
    np.testing.assert_allclose(s, s_true, rtol=5e-3, atol=1e-6)


def test_singular_values_rectangular(rng):
    """Non-square input: one CholeskyQR pass reduces to the square R
    (sigma-preserving), then the two-stage path."""
    for shape in ((128, 48), (48, 128)):
        x = rng.standard_normal(shape).astype(np.float32)
        s = models.singular_values(x, tile=16)
        s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
        assert s.shape == (min(shape),)
        np.testing.assert_allclose(s, s_ref, rtol=1e-3, atol=1e-3)


def test_singular_values_rejects_non_matrix(rng):
    with pytest.raises(ValueError):
        models.singular_values(rng.standard_normal(32))


def test_singular_values_rank_deficient_square(rng):
    """Exactly rank-deficient UNPADDED square input: the default CholeskyQR
    panels can exhaust their shifted passes; the ||B||_F = ||A||_F
    invariant check must detect it and rerun with Householder panels
    (ADVICE r2 #4)."""
    n, r = 64, 20
    x = (rng.standard_normal((n, r)) @ rng.standard_normal((r, n))).astype(np.float32)
    s = models.singular_values(x, tile=16)
    s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(s, s_ref, rtol=2e-3, atol=2e-3 * s_ref[0])


# ---------------------------------------------------------------------------
# banded finish (LAPACK dgbbrd/dbdsdc via ctypes)
# ---------------------------------------------------------------------------

def test_singular_values_tiled_routes_fused(rng, monkeypatch):
    """A tiled input that fits the HBM budget must run through the FUSED
    bdfac lowering (not the generic per-level executor) — VERDICT r2
    weak #5: correctness-grade routing only when it must be."""
    import numpywren_tpu.compiler.lower as lower_mod
    from numpywren_tpu.matrix_init import shard_matrix

    calls = {"fused": 0}
    real = lower_mod.fused_bdfac

    def spy(*a, **kw):
        calls["fused"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(lower_mod, "fused_bdfac", spy)
    x = rng.standard_normal((96, 96)).astype(np.float32)
    m = shard_matrix(x, tile=(32, 32), storage="host")
    s = models.singular_values(m, tile=32)
    s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(s, s_ref, rtol=1e-3, atol=1e-3)
    assert calls["fused"] == 1


def test_band_sigma_lapack(rng):
    from numpywren_tpu.models.band import band_sigma_lapack, lapack_available

    if not lapack_available():
        pytest.skip("no LAPACK shared library on this host")
    n, ku = 200, 17
    a = np.triu(np.tril(rng.standard_normal((n, n)).astype(np.float64), ku).T).T
    a = np.triu(a) - np.triu(a, ku + 1)  # upper banded, bandwidth ku
    s = band_sigma_lapack(a, ku=ku)
    s_ref = np.linalg.svd(a, compute_uv=False)
    np.testing.assert_allclose(s, s_ref, rtol=1e-10, atol=1e-12)


def test_band_sigma_packed_matches_gk(rng):
    """The packed-from-blocks LAPACK path must agree with the GK
    eigensolve fallback on a real block-bidiagonal program output."""
    import numpywren_tpu as npw
    from numpywren_tpu.matrix_init import shard_matrix
    from numpywren_tpu.models.band import band_sigma_packed, lapack_available
    from numpywren_tpu.models.svd import (
        _gk_band_from_blocks,
        _packed_band_from_blocks,
    )

    if not lapack_available():
        pytest.skip("no LAPACK shared library on this host")
    x = rng.standard_normal((96, 96)).astype(np.float32)
    m = shard_matrix(x, tile=(32, 32), storage="host")
    prog, b_mat, _ = npw.bdfac(m)
    npw.run_program(prog)
    ab, nn, ku = _packed_band_from_blocks(b_mat)
    s_lapack = band_sigma_packed(ab, nn, nn, 0, ku)[:96]
    s_gk = _gk_band_from_blocks(b_mat)[:96]
    s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(s_lapack, s_ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(s_lapack, s_gk, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# svd: full singular vectors (two-stage with transform accumulation)
# ---------------------------------------------------------------------------

def _check_svd(x, u, s, vt, rtol=1e-4):
    """Factor-level checks (sign/rotation-free): reconstruction,
    orthogonality, sigma match."""
    x64 = x.astype(np.float64)
    k = min(x.shape)
    assert u.shape == (x.shape[0], k) and vt.shape == (k, x.shape[1])
    s_ref = np.linalg.svd(x64, compute_uv=False)
    np.testing.assert_allclose(s, s_ref, rtol=1e-3, atol=1e-3 * s_ref[0])
    rec = (u.astype(np.float64) * s) @ vt.astype(np.float64)
    err = np.linalg.norm(rec - x64) / np.linalg.norm(x64)
    assert err < rtol, f"reconstruction error {err}"
    np.testing.assert_allclose(u.T @ u, np.eye(k), atol=5e-4)
    np.testing.assert_allclose(vt @ vt.T, np.eye(k), atol=5e-4)


@pytest.mark.parametrize("n,tile", [(64, 16), (96, 32), (70, 32)])
def test_svd_square(rng, n, tile):
    x = rng.standard_normal((n, n)).astype(np.float32)
    u, s, vt = models.svd(x, tile=tile)
    _check_svd(x, u, s, vt)


def test_svd_vectors_match_numpy_up_to_sign(rng):
    """Well-separated spectrum: each singular vector must match
    np.linalg.svd up to a consistent (u_i, v_i) sign flip (VERDICT r2 #3
    'matching np.linalg.svd to 1e-4 (up to sign)')."""
    x, _ = _logspace_matrix(rng, 64, 64, kappa=1e3)
    x = x.astype(np.float32)
    u, s, vt = models.svd(x, tile=16)
    u_ref, s_ref, vt_ref = np.linalg.svd(x.astype(np.float64))
    flip = np.sign(np.sum(u * u_ref, axis=0))
    np.testing.assert_allclose(u * flip, u_ref, atol=1e-4)
    np.testing.assert_allclose(vt * flip[:, None], vt_ref, atol=1e-4)
    np.testing.assert_allclose(s, s_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shape", [(160, 48), (48, 160)])
def test_svd_rectangular(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    u, s, vt = models.svd(x, tile=16)
    _check_svd(x, u, s, vt)


@pytest.mark.parametrize("shape", [(192, 192), (256, 96)])
def test_svd_refine_opt_in(rng, shape):
    """svd(refine=N) is opt-in (models/svd.py docstring: it targets the
    on-chip accumulator recon floor but trades gesdd's fp64-exact sigmas
    for fp32 Rayleigh estimates). Contract here: refined factors stay
    valid — recon within 2x of the unrefined path and orthogonality at
    working precision."""
    x = rng.standard_normal(shape).astype(np.float32)
    u0, s0, vt0 = models.svd(x, tile=32, method="bdfac", refine=0)
    u1, s1, vt1 = models.svd(x, tile=32, method="bdfac", refine=2)
    x64 = np.asarray(x, np.float64)
    na = np.linalg.norm(x64)

    def recon(u, s, vt):
        u, s, vt = map(lambda a: np.asarray(a, np.float64), (u, s, vt))
        return np.linalg.norm(x64 - (u * s) @ vt) / na

    assert recon(u1, s1, vt1) < 2.0 * recon(u0, s0, vt0) + 1e-6
    k = min(shape)
    ou = np.linalg.norm(u1.astype(np.float64).T @ u1.astype(np.float64)
                        - np.eye(k)) / np.sqrt(k)
    assert ou < 2e-6, ou
    np.testing.assert_allclose(s1, s0, rtol=5e-4, atol=5e-5)


def test_svd_tiled_input(rng):
    from numpywren_tpu.matrix_init import shard_matrix

    x = rng.standard_normal((96, 96)).astype(np.float32)
    m = shard_matrix(x, tile=(32, 32), storage="host")
    u, s, vt = models.svd(m, tile=32)
    _check_svd(x, u, s, vt)


def test_svd_house_panels(rng):
    x = rng.standard_normal((64, 64)).astype(np.float32)
    u, s, vt = models.svd(x, tile=16, panel_method="house")
    _check_svd(x, u, s, vt)


# ---------------------------------------------------------------------------
# svd_tall / randomized_svd
# ---------------------------------------------------------------------------

def test_svd_tall(rng):
    x = rng.standard_normal((512, 24)).astype(np.float32)
    u, s, vt = models.svd_tall(x)
    s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(s, s_ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(u.T @ u, np.eye(24), atol=1e-3)
    np.testing.assert_allclose((u * s) @ vt, x, rtol=1e-3, atol=1e-2)


def test_svd_tall_ill_conditioned(rng):
    """cholqr3s default handles kappa far beyond plain CholeskyQR2."""
    x, s_true = _logspace_matrix(rng, 1024, 16, kappa=1e5)
    x = x.astype(np.float32)
    u, s, vt = models.svd_tall(x)
    np.testing.assert_allclose(s, s_true, rtol=5e-3, atol=1e-7)
    np.testing.assert_allclose(u.T @ u, np.eye(16), atol=1e-3)


def test_randomized_svd_low_rank(rng):
    """Exactly rank-r input: recovered factors reproduce it to fp32 grade."""
    r = 6
    u0, _ = np.linalg.qr(rng.standard_normal((200, r)))
    v0, _ = np.linalg.qr(rng.standard_normal((80, r)))
    s0 = np.linspace(5.0, 1.0, r)
    x = ((u0 * s0) @ v0.T).astype(np.float32)
    u, s, vt = models.randomized_svd(x, rank=r, power_iters=1)
    assert u.shape == (200, r) and s.shape == (r,) and vt.shape == (r, 80)
    np.testing.assert_allclose(s, s0, rtol=1e-3)
    np.testing.assert_allclose((u * s) @ vt, x, atol=1e-3)
    np.testing.assert_allclose(u.T @ u, np.eye(r), atol=1e-3)


def test_randomized_svd_decaying_spectrum(rng):
    """Full-rank input with fast decay: top-k sigma within a few percent
    (the HMT bound with power iteration)."""
    x, s_true = _logspace_matrix(rng, 256, 128, kappa=1e6)
    x = x.astype(np.float32)
    u, s, vt = models.randomized_svd(x, rank=10, power_iters=2)
    np.testing.assert_allclose(s, s_true[:10], rtol=0.05)


# ---------------------------------------------------------------------------
# least squares
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method", ["qr", "normal"])
def test_least_squares(rng, method):
    a = rng.standard_normal((300, 20)).astype(np.float32)
    b = rng.standard_normal((300,)).astype(np.float32)
    x = models.least_squares(a, b, method=method)
    x_ref, *_ = np.linalg.lstsq(a.astype(np.float64), b.astype(np.float64),
                                rcond=None)
    np.testing.assert_allclose(x, x_ref, rtol=1e-3, atol=1e-3)


def test_least_squares_multi_rhs(rng):
    a = rng.standard_normal((200, 16)).astype(np.float32)
    b = rng.standard_normal((200, 3)).astype(np.float32)
    x = models.least_squares(a, b)
    x_ref, *_ = np.linalg.lstsq(a.astype(np.float64), b.astype(np.float64),
                                rcond=None)
    assert x.shape == (16, 3)
    np.testing.assert_allclose(x, x_ref, rtol=1e-3, atol=1e-3)


def test_least_squares_qr_beats_normal_when_ill_conditioned(rng):
    """kappa ~ 3e3: the normal equations square it past fp32; the QR path
    stays accurate — the reason method='qr' is the default."""
    a, _ = _logspace_matrix(rng, 400, 12, kappa=3e3)
    a = a.astype(np.float32)
    x_true = rng.standard_normal(12).astype(np.float32)
    b = (a.astype(np.float64) @ x_true).astype(np.float32)
    x_qr = models.least_squares(a, b, method="qr")
    x_ne = models.least_squares(a, b, method="normal")
    err_qr = np.linalg.norm(x_qr - x_true) / np.linalg.norm(x_true)
    err_ne = np.linalg.norm(x_ne - x_true) / np.linalg.norm(x_true)
    assert err_qr < 1e-3
    assert err_qr < err_ne


def test_ridge_regression(rng):
    a = rng.standard_normal((150, 10)).astype(np.float32)
    b = rng.standard_normal((150,)).astype(np.float32)
    alpha = 0.7
    x = models.ridge_regression(a, b, alpha=alpha)
    a64 = a.astype(np.float64)
    x_ref = np.linalg.solve(a64.T @ a64 + alpha * np.eye(10),
                            a64.T @ b.astype(np.float64))
    np.testing.assert_allclose(x, x_ref, rtol=1e-3, atol=1e-3)
    with pytest.raises(ValueError):
        models.ridge_regression(a, b, alpha=0.0)


def test_least_squares_shape_errors(rng):
    with pytest.raises(ValueError):
        models.least_squares(rng.standard_normal((10, 20)), np.zeros(10))
    with pytest.raises(ValueError):
        models.least_squares(rng.standard_normal((20, 10)), np.zeros(21))


# ---------------------------------------------------------------------------
# PCA
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method", ["tall", "randomized"])
def test_pca_matches_sklearn_definition(rng, method):
    """components/explained_variance/scores vs the direct SVD of the
    centered data (the sklearn convention)."""
    x = rng.standard_normal((300, 40)).astype(np.float32)
    k = 5
    comps, ev, scores = models.pca(x, n_components=k, method=method)
    assert comps.shape == (k, 40) and ev.shape == (k,) and scores.shape == (300, k)
    xc = x - x.mean(axis=0)
    u, s, vt = np.linalg.svd(xc.astype(np.float64), full_matrices=False)
    # the tall path is an exact thin SVD; the randomized path is the HMT
    # approximation, whose worst case is exactly this (flat-spectrum) input
    rtol = 2e-2 if method == "tall" else 1e-1
    np.testing.assert_allclose(ev, s[:k] ** 2 / (300 - 1), rtol=rtol)
    if method == "tall":
        # axes match up to sign (only identifiable when sigma are exact)
        dots = np.abs(np.sum(comps * vt[:k].astype(np.float32), axis=1))
        np.testing.assert_allclose(dots, 1.0, atol=2e-2)
        np.testing.assert_allclose(scores, xc @ comps.T,
                                   atol=0.05 * np.abs(xc).max())
    else:
        # approximate factors are still orthonormal, and the variance the
        # scores carry matches the claimed explained_variance
        np.testing.assert_allclose(comps @ comps.T, np.eye(k), atol=1e-3)
        np.testing.assert_allclose(scores.var(axis=0, ddof=1), ev, rtol=1e-2)


def test_pca_low_rank_structure(rng):
    """Data with 3 dominant directions: PCA finds them and the variance
    ratio collapses after rank 3."""
    basis, _ = np.linalg.qr(rng.standard_normal((30, 3)))
    latent = rng.standard_normal((500, 3)) * np.array([10.0, 5.0, 2.0])
    x = (latent @ basis.T + 0.01 * rng.standard_normal((500, 30))).astype(np.float32)
    comps, ev, _ = models.pca(x, n_components=5)
    assert ev[2] > 100 * ev[3]


def test_pca_errors(rng):
    with pytest.raises(ValueError):
        models.pca(rng.standard_normal((10, 5)), n_components=6)
    with pytest.raises(ValueError):
        models.pca(rng.standard_normal(10), n_components=1)


def test_singular_values_tiled_input(rng):
    """Tiled (storage-tier) input: BDFAC runs through the program/executor
    stack and sigma is read from ONLY the diagonal/superdiagonal blocks —
    the path for matrices that never exist as one dense square."""
    from numpywren_tpu.matrix_init import shard_matrix

    x = rng.standard_normal((96, 96)).astype(np.float32)
    xt = shard_matrix(x, tile=(32, 32), storage="host")
    s = models.singular_values(xt)
    s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(s, s_ref, rtol=1e-3, atol=1e-3)


def test_singular_values_tiled_hbm(rng):
    from numpywren_tpu.matrix_init import shard_matrix

    x = rng.standard_normal((64, 64)).astype(np.float32)
    xt = shard_matrix(x, tile=(16, 16), storage="hbm")
    s = models.singular_values(xt)
    s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(s, s_ref, rtol=1e-3, atol=1e-3)


def test_packed_band_corner_tightened(rng):
    """Uniform grids corner-tighten the last block pair: ku == tile, not
    2*tile-1 (halves dgbbrd's Givens-chasing cost), sigma unchanged."""
    import numpywren_tpu as npw
    from numpywren_tpu.matrix_init import shard_matrix
    from numpywren_tpu.models.svd import _packed_band_from_blocks

    x = rng.standard_normal((96, 96)).astype(np.float32)
    m = shard_matrix(x, tile=(32, 32), storage="host")
    prog, b_mat, _ = npw.bdfac(m)
    npw.run_program(prog)
    ab, nn, ku = _packed_band_from_blocks(b_mat)
    assert ku == 32  # tightened; un-tightened would be 63
    # the band content still carries sigma(x) exactly
    dense = np.zeros((nn, nn))
    for j in range(nn):
        i0 = max(0, j - ku)
        dense[i0 : j + 1, j] = ab[ku + i0 - j : ku + 1, j]
    s = np.linalg.svd(dense, compute_uv=False)[:96]
    s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(s, s_ref, rtol=1e-3, atol=1e-3)


def test_singular_values_band_finish_tightened_ku(rng, monkeypatch):
    """The square-array band finish passes the tightened ku (= tile) to
    the LAPACK band routine, and sigma stays correct."""
    import numpywren_tpu.models.svd as svd_mod
    from numpywren_tpu.models import band as band_mod

    if not band_mod.lapack_available():
        pytest.skip("no LAPACK shared library on this host")
    seen = {}
    real = band_mod.band_sigma_lapack

    def spy(a, ku, kl=0):
        seen["ku"] = ku
        return real(a, ku=ku, kl=kl)

    monkeypatch.setattr(band_mod, "band_sigma_lapack", spy)
    x = rng.standard_normal((512, 512)).astype(np.float32)
    s = models.singular_values(x, tile=128, finish="band")
    assert seen["ku"] == 128
    s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(s, s_ref, rtol=1e-3, atol=1e-3 * s_ref[0])


def test_singular_values_auto_tile(rng):
    """tile=None picks a size-appropriate default and stays correct."""
    x = rng.standard_normal((300, 300)).astype(np.float32)
    s = models.singular_values(x)
    s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(s, s_ref, rtol=1e-3, atol=1e-3 * s_ref[0])


def test_singular_values_mesh_distributed(rng):
    """mesh= routes stage 1 through the distributed bdfac_1d reduction."""
    import jax

    from numpywren_tpu.parallel.mesh import make_mesh

    x = rng.standard_normal((192, 192)).astype(np.float32)
    s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    for shape in ((1, 4), (2, 2)):  # flat -> bdfac_1d, 2-D -> bdfac_2d
        mesh = make_mesh(jax.devices()[:4], shape=shape)
        s = models.singular_values(x, tile=32, mesh=mesh)
        np.testing.assert_allclose(s, s_ref, rtol=2e-3, atol=2e-3 * s_ref[0])
    with pytest.raises(ValueError):
        models.singular_values(rng.standard_normal((190, 190)).astype(
            np.float32), tile=32, mesh=mesh)


def test_svd_qdwh_method():
    """All-device full SVD (method='qdwh': QDWH polar + spectral D&C —
    no host O(n^3) stage; the with-vectors path for large n)."""
    import numpy as np

    from numpywren_tpu import models

    rng = np.random.default_rng(31)
    for shape in [(192, 192), (256, 128), (96, 160)]:
        x = rng.standard_normal(shape).astype(np.float32)
        u, s, vt = models.svd(x, method="qdwh")
        k = min(shape)
        assert u.shape == (shape[0], k) and vt.shape == (k, shape[1])
        rec = (u * s) @ vt
        assert np.linalg.norm(rec - x) / np.linalg.norm(x) < 1e-5
        assert np.max(np.abs(u.T @ u - np.eye(k))) < 1e-5
        assert np.max(np.abs(vt @ vt.T - np.eye(k))) < 1e-5
        s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
        assert np.max(np.abs(s - s_ref)) / s_ref[0] < 1e-5


def test_svd_uv_finish_device():
    """bdfac pipeline with the device QDWH finish on B: vectors never
    touch the host gesdd."""
    import numpy as np

    from numpywren_tpu import models

    rng = np.random.default_rng(32)
    n = 192
    x = rng.standard_normal((n, n)).astype(np.float32)
    u, s, vt = models.svd(x, tile=64, uv_finish="device")
    rec = (u[:, :n] * s) @ vt
    assert np.linalg.norm(rec - x) / np.linalg.norm(x) < 1e-4
    s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    assert np.max(np.abs(s - s_ref)) / s_ref[0] < 1e-4


def test_singular_values_qdwh_finish():
    import numpy as np

    from numpywren_tpu import models

    rng = np.random.default_rng(33)
    x = rng.standard_normal((200, 200)).astype(np.float32)
    s = models.singular_values(x, finish="qdwh")
    s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    assert np.max(np.abs(s - s_ref)) / s_ref[0] < 1e-5
