"""Band reduction (models.band_reduce): blocked bulge-chasing reduction of
an upper-banded matrix to bandwidth 2w - 1, sigma-preserving — stage 1.5 of
the two-stage SVD (VERDICT r3 next #4: it replaces the ~520 s dense gesdd
host finish at n=8192 with an on-device O(n^2 d) chase + narrow dgbbrd)."""

import numpy as np
import pytest

from numpywren_tpu.models.band_reduce import band_reduce, band_reduce_sigma_prep


def _band_mat(n, d, seed=0):
    rng = np.random.default_rng(seed)
    a = np.triu(rng.standard_normal((n, n)).astype(np.float32))
    return a - np.triu(a, d + 1)


@pytest.mark.parametrize("n,d,w", [(256, 64, 32), (512, 128, 32), (384, 96, 32)])
def test_band_reduce_sigma_parity(n, d, w):
    a = _band_mat(n, d)
    s_ref = np.linalg.svd(a.astype(np.float64), compute_uv=False)
    red, ku2 = band_reduce(a, ku=d, w=w)
    assert ku2 == 2 * w - 1
    # band contract: nothing below the diagonal or beyond the new band
    # (fp32 roundoff-scale leakage allowed)
    scale = np.abs(red).max()
    assert np.abs(np.tril(red, -1)).max() < 1e-4 * scale
    assert np.abs(np.triu(red, ku2 + 1)).max() < 1e-4 * scale
    s2 = np.sort(np.linalg.svd(red.astype(np.float64),
                               compute_uv=False))[::-1][: n]
    np.testing.assert_allclose(s2, s_ref, atol=2e-5 * s_ref[0], rtol=0)


def test_band_reduce_noop_when_narrow():
    a = _band_mat(128, 30)
    red, ku2 = band_reduce(a, ku=30, w=32)
    assert red is a and ku2 == 30  # already within 2w - 1


def test_band_reduce_nonsquare_raises():
    with pytest.raises(ValueError, match="square"):
        band_reduce(np.zeros((4, 8), np.float32), ku=3)


def test_band_reduce_prep_guard_passes():
    a = _band_mat(256, 64, seed=3)
    red, ku2, n = band_reduce_sigma_prep(a, 64, w=16)
    assert ku2 == 31 and n == 256


def test_singular_values_routes_wide_band_through_reduce():
    """End-to-end: a tile size that leaves band > 256 must route through
    the band reducer (not dense gesdd) and still match numpy sigma."""
    import unittest.mock as mock

    import numpywren_tpu.models.band_reduce as br
    from numpywren_tpu import models

    rng = np.random.default_rng(5)
    n = 1024
    x = rng.standard_normal((n, n)).astype(np.float32)
    calls = {"reduce": 0}
    real_prep = br.band_reduce_packed

    def spy(bd, ku, w=64):
        calls["reduce"] += 1
        return real_prep(bd, ku, w=w)

    # svd._band_sigma imports the symbol at call time, so patching the
    # module attribute intercepts the routing decision
    with mock.patch.object(br, "band_reduce_packed", side_effect=spy):
        s = models.singular_values(x, tile=512)  # band 512 > 256
    assert calls["reduce"] == 1, "wide band did not route through band_reduce"
    s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    assert np.max(np.abs(s - s_ref)) / s_ref[0] < 1e-4


def test_band_reduce_packed_matches_full():
    """Packed on-device extraction == packing the full reduced matrix on
    host, and its sigma finish matches the dense reference."""
    from numpywren_tpu.models.band_reduce import band_reduce_packed

    n, d, w = 256, 64, 16
    a = _band_mat(n, d, seed=3)
    red, ku2 = band_reduce(a, ku=d, w=w)
    ab, ku2p, m = band_reduce_packed(a, ku=d, w=w)
    assert ku2p == ku2 and m == red.shape[0]
    ref = np.zeros((ku2 + 1, m), dtype=red.dtype)
    for r in range(ku2 + 1):
        off = ku2 - r
        ref[r, off:] = np.diagonal(red, offset=off)
    np.testing.assert_allclose(ab, ref, rtol=0, atol=1e-6)
    s_ref = np.linalg.svd(a.astype(np.float64), compute_uv=False)
    from numpywren_tpu.models.band import band_sigma_packed, lapack_available

    if lapack_available():
        s = band_sigma_packed(ab.astype(np.float64), m, m, 0, ku2)[:n]
        np.testing.assert_allclose(s, s_ref, rtol=1e-4, atol=1e-4)


def test_band_reduce_packed_narrow_noop():
    """ku <= 2w-1: packed path packs the input unchanged."""
    from numpywren_tpu.models.band_reduce import band_reduce_packed

    n, d = 128, 16
    a = _band_mat(n, d, seed=4)
    ab, ku2, m = band_reduce_packed(a, ku=d, w=16)
    assert ku2 == d and m == n
    for r in range(ku2 + 1):
        off = ku2 - r
        np.testing.assert_array_equal(ab[r, off:], np.diagonal(a, offset=off))
