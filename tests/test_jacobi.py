"""One-sided block-Jacobi SVD (models/jacobi.py): the all-device
with-vectors path. The reference's SVD story stops at the BDFAC precursor
(upstream:numpywren/algs.py::bdfac); these tests hold the finished
factorization to LAPACK-at-fp32 grade: reconstruction, BOTH factor
orthogonalities (the trailing-vector polish), sigma accuracy, ragged /
rectangular / rank-deficient shapes, and the round-robin schedule's
every-pair-once contract."""

import numpy as np
import pytest

from numpywren_tpu.models.jacobi import roundrobin_schedule, svd_jacobi


def _logspace_matrix(rng, m, n, kappa):
    k = min(m, n)
    u, _ = np.linalg.qr(rng.standard_normal((m, k)))
    v, _ = np.linalg.qr(rng.standard_normal((n, k)))
    s = np.logspace(0, -np.log10(kappa), k)
    return (u * s) @ v.T, s


def _check(x, u, s, vt, recon_tol=1e-4, ortho_tol=1e-5, s_atol=1e-4):
    x64 = np.asarray(x, np.float64)
    u, s, vt = map(lambda a: np.asarray(a, np.float64), (u, s, vt))
    m, n = x.shape
    k = min(m, n)
    assert u.shape == (m, k) and s.shape == (k,) and vt.shape == (k, n)
    assert np.all(np.diff(s) <= 1e-6 * s[0])          # descending
    recon = np.linalg.norm(u * s @ vt - x64) / max(np.linalg.norm(x64), 1e-30)
    assert recon < recon_tol, recon
    ou = np.linalg.norm(u.T @ u - np.eye(k)) / np.sqrt(k)
    ov = np.linalg.norm(vt @ vt.T - np.eye(k)) / np.sqrt(k)
    assert ou < ortho_tol, ou
    assert ov < ortho_tol, ov
    s_ref = np.linalg.svd(x64, compute_uv=False)
    np.testing.assert_allclose(s, s_ref, rtol=2e-3, atol=s_atol * s_ref[0])


@pytest.mark.parametrize("g", [2, 4, 6, 8, 10])
def test_roundrobin_every_pair_once(g):
    sched = roundrobin_schedule(g)
    assert sched.shape == (g - 1, g)
    seen = set()
    for row in sched:
        assert sorted(row) == list(range(g))          # a permutation
        for k in range(g // 2):
            pair = frozenset((int(row[2 * k]), int(row[2 * k + 1])))
            assert len(pair) == 2
            assert pair not in seen
            seen.add(pair)
    assert len(seen) == g * (g - 1) // 2


def test_roundrobin_odd_raises():
    with pytest.raises(ValueError):
        roundrobin_schedule(5)


def test_threshold_sweep_is_bitexact_noop_when_converged(rng):
    """A matrix whose column blocks are already orthogonal must pass
    through a thresholded sweep BIT-EXACTLY: the skip path substitutes
    the EXACT identity for converged pairs, and multiplying by an exact
    identity is exact in floating point — that exactness is the whole
    point of the roundoff firewall (models/jacobi.py::_sweep skip_rel)."""
    import jax.numpy as jnp

    from numpywren_tpu.models.jacobi import _sweep

    n, b = 128, 16
    g = n // b
    q, _ = np.linalg.qr(rng.standard_normal((n, n)).astype(np.float32))
    w0 = (q * np.linspace(2.0, 1.0, n, dtype=np.float32)).astype(np.float32)
    w = jnp.asarray(w0.T.reshape(g, b, n).transpose(0, 2, 1))
    v = jnp.asarray(np.eye(n, dtype=np.float32).T
                    .reshape(g, b, n).transpose(0, 2, 1))
    perms = jnp.asarray(roundrobin_schedule(g))
    w_np, v_np = np.asarray(w), np.asarray(v)  # _sweep donates its inputs
    import jax

    w1, v1 = _sweep(w, v, perms, g=g, b=b,
                    prec=jax.lax.Precision.HIGHEST, skip_rel=1e-5)
    assert np.array_equal(np.asarray(w1), w_np)
    assert np.array_equal(np.asarray(v1), v_np)


def test_threshold_does_not_hurt_accuracy(rng):
    """Default (auto) thresholding must not degrade recon vs skip_rel=0
    on an ill-conditioned input, and should not need more sweeps (the
    exact-identity stationarity lets the stagnation exit fire earlier)."""
    x, _ = _logspace_matrix(rng, 384, 384, 1e4)
    x = x.astype(np.float32)
    tr0, tr1 = [], []
    u0, s0, vt0 = svd_jacobi(x, block=64, skip_rel=0.0, _sweep_trace=tr0)
    u1, s1, vt1 = svd_jacobi(x, block=64, _sweep_trace=tr1)
    r0 = np.linalg.norm(np.asarray(u0) * np.asarray(s0) @ np.asarray(vt0)
                        - x) / np.linalg.norm(x)
    r1 = np.linalg.norm(np.asarray(u1) * np.asarray(s1) @ np.asarray(vt1)
                        - x) / np.linalg.norm(x)
    assert r1 <= 2.0 * r0 + 1e-6
    assert len(tr1) <= len(tr0)


@pytest.mark.parametrize("n,block", [(96, 16), (128, 32), (256, 64)])
def test_square(rng, n, block):
    x = rng.standard_normal((n, n)).astype(np.float32)
    u, s, vt = svd_jacobi(x, block=block)
    _check(x, u, s, vt)


def test_ragged_padding(rng):
    """n not a block multiple: zero-pad columns must not perturb the
    factorization (the padding stays in the zero eigenspace)."""
    x = rng.standard_normal((150, 150)).astype(np.float32)
    u, s, vt = svd_jacobi(x, block=32)
    _check(x, u, s, vt)


@pytest.mark.parametrize("shape", [(256, 96), (96, 256)])
def test_rectangular(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    u, s, vt = svd_jacobi(x, block=32)
    _check(x, u, s, vt)


def test_ill_conditioned_vectors(rng):
    """kappa=1e4 (past the ~1/sqrt(eps) fp32 boundary): the graded
    sigma-window polish (VERDICT r4 #4) holds BOTH orthogonalities at
    working precision AND the reconstruction near the raw Jacobi floor
    (~3e-6 measured; the bare CholeskyQR2 polish paid ~5e-4 here)."""
    x, s_true = _logspace_matrix(rng, 128, 128, kappa=1e4)
    x = x.astype(np.float32)
    u, s, vt = svd_jacobi(x, block=32)
    _check(x, u, s, vt, recon_tol=2e-5, s_atol=1e-5)
    np.testing.assert_allclose(np.asarray(s), s_true, rtol=5e-3, atol=1e-5)


@pytest.mark.parametrize("kappa", [1e2, 1e4, 1e6])
def test_refine_tightens_recon(rng, kappa):
    """Iterative refinement (models/jacobi.py::_refine_step, default
    refine=2) must beat the unrefined factors' recon by >= 3x at every
    kappa rung — including 1e6, where the noise-floor mask (cut_c) is
    what prevents the tiny-sigma 2x2 solves from amplifying A's own
    storage roundoff (measured divergence to recon ~1 without it) —
    while holding BOTH orthogonalities at working precision. Measured
    n=1024 fp32: 6.5-7.4e-6 -> 0.8-1.1e-6 across the ladder."""
    x, _ = _logspace_matrix(rng, 256, 256, kappa=kappa)
    x = x.astype(np.float32)
    u0, s0, vt0 = svd_jacobi(x, block=64, refine=0)
    u1, s1, vt1 = svd_jacobi(x, block=64)          # default refine=2
    x64 = np.asarray(x, np.float64)
    na = np.linalg.norm(x64)

    def recon(u, s, vt):
        u, s, vt = map(lambda a: np.asarray(a, np.float64), (u, s, vt))
        return np.linalg.norm(x64 - (u * s) @ vt) / na

    r0, r1 = recon(u0, s0, vt0), recon(u1, s1, vt1)
    assert r1 < max(r0 / 3.0, 1e-6), (r0, r1)
    k = 256
    ou = np.linalg.norm(np.asarray(u1, np.float64).T
                        @ np.asarray(u1, np.float64) - np.eye(k)) / np.sqrt(k)
    ov = np.linalg.norm(np.asarray(vt1, np.float64)
                        @ np.asarray(vt1, np.float64).T - np.eye(k)) / np.sqrt(k)
    assert ou < 1e-6 and ov < 1e-6, (ou, ov)


def test_svd_refine_recovers_perturbed_factors(rng):
    """Public svd_refine: factors perturbed at 1e-4 must contract back
    to near working precision in two steps (quadratic), on factors from
    ANY source — here an exact fp64 construction. Caller arrays must
    stay valid (the wrapper copies before the donating step)."""
    from numpywren_tpu.models import svd_refine

    n = 192
    s_true = np.logspace(0, -3, n)
    qu, _ = np.linalg.qr(rng.standard_normal((n, n)))
    qv, _ = np.linalg.qr(rng.standard_normal((n, n)))
    x = ((qu * s_true) @ qv.T).astype(np.float32)
    u0 = (qu + 1e-4 * rng.standard_normal((n, n))).astype(np.float32)
    vt0 = (qv + 1e-4 * rng.standard_normal((n, n))).astype(np.float32).T
    s0 = s_true.astype(np.float32)
    x64 = np.asarray(x, np.float64)
    na = np.linalg.norm(x64)

    def recon(u, s, vt):
        u, s, vt = map(lambda a: np.asarray(a, np.float64), (u, s, vt))
        return np.linalg.norm(x64 - (u * s) @ vt) / na

    r_before = recon(u0, s0, vt0)
    assert r_before > 1e-4  # the perturbation is material
    import jax.numpy as jnp

    u_in, vt_in = jnp.asarray(u0), jnp.asarray(vt0)
    u1, s1, vt1 = svd_refine(x, u_in, s0, vt_in, steps=2)
    assert recon(u1, s1, vt1) < 5e-6
    ou = np.linalg.norm(np.asarray(u1, np.float64).T
                        @ np.asarray(u1, np.float64) - np.eye(n))
    assert ou / np.sqrt(n) < 1e-6
    # caller's arrays were not donated out from under it
    np.testing.assert_array_equal(np.asarray(u_in), u0)
    np.testing.assert_array_equal(np.asarray(vt_in), vt0)


@pytest.mark.parametrize("kappa", [1e2, 1e3, 1e4, 1e5, 1e6])
def test_kappa_ladder_recon(rng, kappa):
    """The full ladder (VERDICT r4 #4 'kappa-ladder test'): recon stays
    at the refined floor at every rung, with factors orthonormal at
    working precision. Measured sub-1e-6 across the ladder with the
    default refine=2 (2-3e-6 unrefined); bound 5e-6 for cross-host
    slack."""
    x, _ = _logspace_matrix(rng, 128, 128, kappa=kappa)
    x = x.astype(np.float32)
    u, s, vt = svd_jacobi(x, block=32)
    _check(x, u, s, vt, recon_tol=5e-6, s_atol=2e-5)


def test_wide_polish_and_rank_completion(rng):
    """ADVICE r4 #1: polish=False must be honoured through the wide-input
    recursion, and rank_tol must complete U (not Vt) for wide inputs."""
    import numpywren_tpu.models.jacobi as jac

    calls = []
    orig = jac._polish_u

    def counting(u, *, prec):
        calls.append(u.shape)
        return orig(u, prec=prec)

    jac._polish_u = counting
    try:
        x = rng.standard_normal((48, 96)).astype(np.float32)
        svd_jacobi(x, block=16, polish=False)
        assert not calls, f"polish ran on a wide input: {calls}"
    finally:
        jac._polish_u = orig

    # rank-deficient wide input: completion must land on U (m x m)
    r = 20
    a = rng.standard_normal((40, r)).astype(np.float32)
    x = a @ rng.standard_normal((r, 80)).astype(np.float32)
    u, s, vt = map(np.asarray, svd_jacobi(x, block=16, rank_tol=1e-5))
    u64 = u.astype(np.float64)
    ou = np.linalg.norm(u64.T @ u64 - np.eye(40))
    assert ou < 1e-4, ou


def test_nonconvergence_warns(rng):
    """ADVICE r4 #2: exhausting max_sweeps with a large off-norm must
    surface a RuntimeWarning instead of silently returning factors."""
    x = rng.standard_normal((96, 96)).astype(np.float32)
    with pytest.warns(RuntimeWarning, match="did not converge"):
        svd_jacobi(x, block=16, max_sweeps=1, tol=1e-12)


def test_matches_numpy_up_to_sign(rng):
    x = rng.standard_normal((64, 64)).astype(np.float32)
    u, s, vt = map(np.asarray, svd_jacobi(x, block=16))
    u_ref, s_ref, vt_ref = np.linalg.svd(x.astype(np.float64))
    np.testing.assert_allclose(s, s_ref, rtol=1e-4, atol=1e-5)
    sgn = np.sign(np.sum(u * u_ref, axis=0))
    np.testing.assert_allclose(u * sgn, u_ref, atol=5e-3)
    np.testing.assert_allclose(vt * sgn[:, None], vt_ref, atol=5e-3)


def test_sigma_only(rng):
    x = rng.standard_normal((128, 128)).astype(np.float32)
    s = svd_jacobi(x, block=32, compute_uv=False)
    s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-3, atol=1e-4)


def test_rank_deficient_zero_columns(rng):
    """Exact rank deficiency: the zero-sigma U columns come back as
    exact zeros at rank_tol=0 (reconstruction still holds)."""
    r = 40
    a = rng.standard_normal((96, r)).astype(np.float32)
    b = rng.standard_normal((r, 96)).astype(np.float32)
    x = a @ b
    u, s, vt = map(np.asarray, svd_jacobi(x, block=32))
    assert np.all(s[r:] < 1e-3 * s[0])
    recon = np.linalg.norm(u * s @ vt - x) / np.linalg.norm(x)
    assert recon < 1e-4
    # the leading-r factors are orthonormal even if trailing cols are 0
    ou = np.linalg.norm(u[:, :r].T @ u[:, :r] - np.eye(r))
    assert ou < 1e-4


def test_rank_completion(rng):
    """rank_tol > 0 replaces the zero-sigma U columns with an orthonormal
    completion: U comes back fully orthogonal."""
    r = 24
    a = rng.standard_normal((64, r)).astype(np.float32)
    x = a @ rng.standard_normal((r, 64)).astype(np.float32)
    u, s, vt = svd_jacobi(x, block=16, rank_tol=1e-5)
    u = np.asarray(u, np.float64)
    ou = np.linalg.norm(u.T @ u - np.eye(64)) / 8.0
    assert ou < 1e-5, ou


def test_tiny_fallback(rng):
    x = rng.standard_normal((5, 3)).astype(np.float32)
    u, s, vt = svd_jacobi(x)
    _check(x, u, s, vt, recon_tol=1e-5, ortho_tol=1e-5)


def test_convergence_is_quadratic(rng):
    """The closest-to-identity rotation ordering restores global
    convergence (the sorted ordering stalls in a permutation cycle —
    measured; see _sweep's docstring): the off-norm trace must contract
    to the fp32 floor, with a super-linear tail."""
    x = rng.standard_normal((192, 192)).astype(np.float32)
    trace = []
    svd_jacobi(x, block=32, _sweep_trace=trace)
    assert trace[-1] < 5e-6 or trace[-2] < 5e-6
    # super-linear tail: some step contracts by > 10x
    ratios = [trace[i + 1] / trace[i] for i in range(len(trace) - 1)]
    assert min(ratios) < 0.1


def test_svd_method_jacobi_dispatch(rng):
    """models.svd(method='jacobi') routes through svd_jacobi and honours
    the host-array (U, s, Vt) contract of svd()."""
    from numpywren_tpu import models

    x = rng.standard_normal((96, 96)).astype(np.float32)
    u, s, vt = models.svd(x, method="jacobi", tile=32)
    assert isinstance(u, np.ndarray)
    _check(x, u, s, vt)


def test_default_routing_large_tpu():
    """VERDICT r4 #2: svd(method=None) routes large with-vectors inputs
    to the Jacobi path on a TPU backend, keeps bdfac on CPU/small."""
    from numpywren_tpu.models.svd import _route_default_method

    assert _route_default_method((8192, 8192), "tpu") == "jacobi"
    assert _route_default_method((4096, 8192), "tpu") == "jacobi"
    assert _route_default_method((2048, 2048), "tpu") == "bdfac"
    assert _route_default_method((8192, 8192), "cpu") == "bdfac"
    assert _route_default_method((8192, 512), "tpu") == "bdfac"


def test_default_routing_scales_with_host_speed(monkeypatch):
    """VERDICT r4 weak #6: the jacobi-vs-bdfac crossover scales with the
    measured host GEMM speed (the 520 s gesdd estimate was calibrated on
    a ~15 GF/s 1-core host) instead of silently inheriting it."""
    from numpywren_tpu.models.svd import _route_default_method
    from numpywren_tpu.utils import host_gflops

    monkeypatch.setenv("NPW_HOST_GFLOPS", "15")
    host_gflops.cache_clear()
    assert host_gflops() == 15.0
    assert _route_default_method((8192, 8192), "tpu") == "jacobi"
    # a threaded-LAPACK host ~40x this one: gesdd(8192) ~13 s beats the
    # measured 39.4 s device jacobi -> bdfac again
    monkeypatch.setenv("NPW_HOST_GFLOPS", "600")
    host_gflops.cache_clear()
    assert _route_default_method((8192, 8192), "tpu") == "bdfac"
    host_gflops.cache_clear()  # drop the pinned value for later tests


def test_host_gflops_probe_positive(monkeypatch):
    from numpywren_tpu.utils import host_gflops

    monkeypatch.delenv("NPW_HOST_GFLOPS", raising=False)
    host_gflops.cache_clear()
    g = host_gflops()
    assert 0.1 < g < 1e4  # a real measurement, sane on any host
    host_gflops.cache_clear()
