"""One-sided block-Jacobi SVD — full SVD with vectors, entirely on device.

The reference's SVD story stops at BDFAC (upstream:numpywren/algs.py::bdfac,
"the SVD precursor"); finishing with vectors was this framework's last
host-bound stage: LAPACK gesdd on the banded B costs ~520 s at n=8192 on a
1-core host, and every banded-finish alternative measured as a dead end
(TODO.md gap #1: dgbbrd VECT='B' is unblocked Givens against dense
accumulators; jax's QDWH spectral D&C is flat-latency-bound through this
runtime at 140+ s for n=2048).

This module takes the classical route that IS shaped like a TPU: one-sided
block Jacobi (Hestenes; block form a la Drmac). Maintain W <- A and an
accumulator V <- I. Sweep a round-robin tournament over column-block pairs;
for each pair, the 2b x 2b Gram G = [Wi Wj]^T [Wi Wj] is eigendecomposed
and the rotation applied to [Wi Wj] and [Vi Vj]. At convergence W's columns
are mutually orthogonal: W = U diag(s), A = U diag(s) V^T.

Why this maps to the hardware (measured 2026-08-19, TPU v5e via axon):

- every heavy op is a batched GEMM (pair Grams + rotations: O(m b^2) each,
  MXU work at HIGHEST precision) or a BATCHED small eigh — and XLA TPU's
  batched eigh is fast where its big one-shot D&C is not: p=1024 batch=8
  runs in ~290 ms warm (vs 140+ s for the monolithic QDWH SVD at 2048).
- all g/2 disjoint pairs of a round rotate in ONE jit call (vmap over the
  pair axis): per-round dispatch latency is paid once per round, not once
  per pair, and no host round trip happens inside a sweep (the tunnel's
  ~1 s scalar-fetch cost is paid once per CONVERGENCE CHECK, i.e. once per
  sweep).
- column blocks are stored as a (g, m, b) tensor, so a round's pair gather/
  scatter is a block-index permutation (static-shape dynamic gather), never
  a reshape of the full matrix.

Accuracy: the rotations are applied to A itself (the pair Gram only steers
them, and an inexact rotation is still exactly orthogonal to eigh grade),
so there is no GLOBAL Gram squaring — measured at kappa=1e4 fp32 the small
sigmas carry ~6e-5 * sigma_max absolute error where an eig(A^T A) route
would carry ~1e-3. The pair solve does square LOCALLY (eigh of the pair
Gram orthogonalizes a sigma_i/sigma_j pair only to ~eps * ratio^2), which
a bare CholeskyQR2 polish converts into a reconstruction floor of
~sqrt(eps) * sigma_max once kappa exceeds ~1/sqrt(eps) (~3e3 at fp32):
measured 4.3e-4 at kappa=1e4. The GRADED polish (_graded_polish) removes
that floor for graded spectra: sort columns by norm, slide sigma-windows
of bounded ratio (step^span, default 8^3) down the spectrum, and within
each window apply the eigh of the window Gram as an ORTHOGONAL mirror to
both W and V — V stays exactly orthogonal and W @ Vt (= the
reconstruction) is invariant under every mirror, unlike a projection,
which deletes genuine A-mass from the trailing columns. Residual
cross-window couplings are sigma-separated by >= step^(span-1), small
enough that the final CholeskyQR2 touch-up moves only eps-level mass.
Measured on the kappa ladder (128^2 logspace, fp32): recon 2.0-3.0e-6
for kappa 1e2..1e6 (vs 1e-5..5.8e-4 with the bare CholQR2 polish),
sigma max-error ~3e-7 * sigma_max, with BOTH orthogonalities at working
precision.

Below even that floor sits the ITERATIVE-REFINEMENT finisher
(_refine_step, default refine=2): the sweep phase's accumulated rotation
roundoff (~sqrt(rounds*2b)*eps) is baked into the factors — measured
recon before the polish == after, so no orthogonalization can remove
it — but an Ogita-Aishima-style first-order correction solved from
R = I - U^T U, S = I - V^T V, T = U^T A V contracts it quadratically for
five GEMMs a step. Measured fp32 n=1024..2048: recon 6.5e-6..1.1e-5 ->
0.8-1.1e-6 across kappa 1e2..1e6, with orthogonality at working
precision (a CholQR2 touch-up + Rayleigh re-extract close the step).
The kappa=1e6 rung is only safe because of the noise-floor mask: below
sigma ~ sqrt(m)*eps*sigma_max the 2x2 pair solves amplify A's own
storage roundoff (measured divergence to recon ~1 in one step without
the mask).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

__all__ = ["svd_jacobi", "svd_refine", "roundrobin_schedule"]


def roundrobin_schedule(g: int) -> np.ndarray:
    """(g-1, g) round-robin tournament: row r lists a block order such that
    (row[2k], row[2k+1]) are the disjoint pairs of round r; over the g-1
    rounds every unordered block pair meets exactly once (the classical
    circle method: fix block 0, rotate the rest). g must be even."""
    if g < 2 or g % 2:
        raise ValueError(f"round-robin needs an even g >= 2, got {g}")
    idx = list(range(g))
    rounds = []
    for _ in range(g - 1):
        row = []
        for k in range(g // 2):
            row += [idx[k], idx[g - 1 - k]]
        rounds.append(row)
        idx = [idx[0]] + [idx[-1]] + idx[1:-1]
    return np.asarray(rounds, dtype=np.int32)


@functools.partial(
    __import__("jax").jit,
    static_argnames=("g", "b", "prec", "skip_rel"),
    donate_argnames=("w", "v"),
)
def _sweep(w, v, perms, *, g: int, b: int, prec, skip_rel: float = 0.0):
    """One full round-robin sweep (g-1 rounds) over column-block pairs.

    w: (g, m, b) column blocks of the working matrix; v: (g, n, b) column
    blocks of the right-transform accumulator; perms: (g-1, g) int32 round
    schedules. Each round: gather the paired blocks, eigendecompose the
    2b x 2b pair Grams (batched over the g/2 disjoint pairs), rotate.

    The rotation must be the one CLOSEST TO IDENTITY, not eigh's
    eigenvalue-sorted one: a sorted full-pair diagonalization degenerates
    into a bare permutation once the pair Gram is nearly diagonal, and the
    periodic permutation churn then shuffles the remaining cross-block
    mass so it always dodges the visited pair — a measured fixed CYCLE of
    the sweep map (off-norm stalls at ~0.5 forever). Reordering Q's
    columns so eigenvalue ranks follow the rank order of the Gram's
    diagonal (plus positive-diagonal signs) makes Q -> I for near-diagonal
    pairs, which restores the classical global convergence (quadratic
    once sorted; sigma ordering is recovered by one argsort at the end).

    skip_rel > 0 enables classical Jacobi THRESHOLDING, re-purposed here
    as a roundoff firewall: a pair whose relative off-mass
    sqrt(off2/diag2) is already below skip_rel gets the EXACT identity
    instead of eigh's near-identity Q. Multiplying by an exact identity
    is exact in floating point (each dot product is one value plus exact
    zeros), so converged pairs stop re-absorbing the ~sqrt(2b)*eps GEMM
    roundoff that every real rotation injects — that injection is what
    floors both the off-norm (~1.4e-6 measured at fp32) and the
    accumulated reconstruction error (~sqrt(rounds*2b)*eps: 2.4e-5 at
    n=8192/16 sweeps). It engages in the MANY-SWEEP regime where the
    loop keeps churning past individual pair convergence (measured CPU
    n=2048 b=256 kappa=1e4: 24 -> 16 sweeps, recon 1.03e-5 -> 9.2e-6);
    at flagship sizes the stagnation exit fires first and the A/B is a
    measured no-op (on-chip n=4096 b=512: 12 sweeps, recon 1.329e-5 vs
    1.331e-5, wall 6.6 s both arms — onchip_r05.jsonl jskip)."""
    import jax
    import jax.numpy as jnp

    def round_body(r, carry):
        w, v = carry
        perm = perms[r]
        wp = jnp.take(w, perm, axis=0)               # (g, m, b)
        vp = jnp.take(v, perm, axis=0)               # (g, n, b)
        m, n = wp.shape[1], vp.shape[1]
        pair_w = wp.reshape(g // 2, 2, m, b).transpose(0, 2, 1, 3)
        pair_w = pair_w.reshape(g // 2, m, 2 * b)    # (g/2, m, 2b)
        gram = jnp.einsum("kmi,kmj->kij", pair_w, pair_w, precision=prec)
        _, q = jnp.linalg.eigh(gram)                 # ascending
        d = jnp.diagonal(gram, axis1=1, axis2=2)
        rank = jnp.argsort(jnp.argsort(d, axis=1), axis=1)
        q = jnp.take_along_axis(q, rank[:, None, :], axis=2)
        sgn = jnp.sign(jnp.diagonal(q, axis1=1, axis2=2))
        sgn = jnp.where(sgn == 0, 1.0, sgn).astype(q.dtype)
        q = q * sgn[:, None, :]
        if skip_rel > 0.0:
            # diagonal zeroed BEFORE summing (same fp32-cancellation trap
            # as _off_rel); comparison squared to avoid the sqrt
            dmat = jax.vmap(jnp.diag)(d)
            off2 = jnp.sum(jnp.square(gram - dmat), axis=(1, 2))
            den2 = jnp.sum(jnp.square(d), axis=1)
            conv = off2 <= (skip_rel * skip_rel) * den2
            eye2b = jnp.eye(2 * b, dtype=q.dtype)
            q = jnp.where(conv[:, None, None], eye2b[None], q)
        pair_w = jnp.einsum("kmi,kij->kmj", pair_w, q, precision=prec)
        pair_v = vp.reshape(g // 2, 2, n, b).transpose(0, 2, 1, 3)
        pair_v = pair_v.reshape(g // 2, n, 2 * b)
        pair_v = jnp.einsum("kmi,kij->kmj", pair_v, q, precision=prec)
        wn = pair_w.reshape(g // 2, m, 2, b).transpose(0, 2, 1, 3)
        vn = pair_v.reshape(g // 2, n, 2, b).transpose(0, 2, 1, 3)
        w = w.at[perm].set(wn.reshape(g, m, b))
        v = v.at[perm].set(vn.reshape(g, n, b))
        return w, v

    return jax.lax.fori_loop(0, g - 1, round_body, (w, v))


@functools.partial(__import__("jax").jit, static_argnames=("prec",))
def _off_rel(w, *, prec):
    """Relative off-diagonal mass of the column Gram C = W^T W:
    ||C - diag||_F / ||diag||_F — the one scalar fetched per sweep.

    This is the UNSCALED measure: it is monotone under the pair
    rotations (each annihilates exactly its pair's off-mass) and
    converges quadratically, so it makes a reliable stop criterion. It
    under-weights small-sigma pairs — but so do the Gram-eigh rotations
    themselves (the pair eigh orthogonalizes a sigma_i/sigma_j pair only
    to ~eps * (sigma_i/sigma_j)^2: local Gram squaring), so iterating on
    a SCALED correlation measure was measured to wander near its
    eps*kappa^2 floor without converging; trailing-vector orthogonality
    is restored by the CholeskyQR2 polish instead (_polish_u). fp32
    trap: sum(C^2) - sum(diag^2) cancels catastrophically once the
    off-mass is below the sums' roundoff and reads exactly 0, so the
    diagonal is zeroed BEFORE summing."""
    import jax.numpy as jnp

    g, m, b = w.shape
    wm = w.transpose(1, 0, 2).reshape(m, g * b)
    c = jnp.matmul(wm.T, wm, precision=prec)
    d = jnp.diagonal(c)
    off2 = jnp.sum(jnp.square(c - jnp.diag(d)))
    den = jnp.sum(jnp.square(d))
    return jnp.sqrt(off2 / jnp.maximum(den, 1e-30))


@functools.partial(__import__("jax").jit, static_argnames=("prec",))
def _cholqr_pass(u, *, prec):
    import jax.numpy as jnp
    from jax.scipy.linalg import solve_triangular

    c = jnp.matmul(u.T, u, precision=prec)
    l = jnp.linalg.cholesky(c)
    return solve_triangular(l, u.T, lower=True).T, l


@functools.partial(__import__("jax").jit, static_argnames=("prec",))
def _polish_u(u, *, prec):
    """CholeskyQR2 re-orthonormalization of U. After Jacobi convergence
    (and the graded mirrors, when they ran) U is orthonormal except for
    eps-to-small couplings, so kappa(U) is modest and CholeskyQR is
    stable: two passes land at working-precision orthogonality for two
    n^2 m GEMM-flops passes plus two flat-latency custom calls — nothing
    like a full QR. Columns are sigma-sorted DESCENDING, so the
    triangular solve orthogonalizes each trailing (garbage-prone) column
    against the leading (accurate) ones, never the reverse; the
    perturbation to A ~ U S Vt is sigma-weighted and stays at the recon
    floor. Falls back to Householder QR (sign-fixed) if a pass's
    Cholesky breaks (near-parallel garbage columns) — the fallback is a
    lax.cond branch so the whole polish stays on device: the previous
    per-pass host fetch of the breakdown flag cost ~1 s each through the
    axon tunnel (ADVICE r4 #3)."""
    import jax
    import jax.numpy as jnp

    def qr_fix(u):
        q, r = jnp.linalg.qr(u, mode="reduced")
        sgn = jnp.sign(jnp.diagonal(r))
        sgn = jnp.where(sgn == 0, 1.0, sgn).astype(u.dtype)
        return q * sgn[None, :]

    def one_pass(u):
        u2, l = _cholqr_pass(u, prec=prec)
        ok = jnp.all(jnp.isfinite(jnp.diagonal(l)))
        return jax.lax.cond(ok, lambda op: op[0], lambda op: qr_fix(op[1]),
                            (u2, u))

    return one_pass(one_pass(u))


def _sigma_boundaries(s_host: np.ndarray, step: float, quantum: int):
    """Column indices where sigma first drops below the previous
    boundary's sigma / step, rounded DOWN to `quantum` multiples so the
    set of jitted window shapes stays bounded across inputs (each
    distinct (lo, hi) pair is one compile)."""
    k = len(s_host)
    bounds = [0]
    t0 = float(s_host[0])
    for j in range(1, k):
        if s_host[j] < t0 / step:
            jq = (j // quantum) * quantum
            if jq > bounds[-1]:
                bounds.append(jq)
            t0 = float(s_host[j])
    bounds.append(k)
    return bounds


@functools.partial(
    __import__("jax").jit,
    static_argnames=("lo", "hi", "prec"),
    donate_argnames=("w", "vt"),
)
def _window_eigh_mirror(w, vt, *, lo: int, hi: int, prec):
    """Orthogonal mirror on a sigma-window: Q = eigh(W_w^T W_w)
    (descending), W_w <- W_w Q, Vt_w <- Q^T Vt_w. Q is orthogonal, so V
    stays exactly orthogonal and W @ Vt is invariant — the mirror fixes
    the window's internal orthogonality without touching the
    reconstruction, which is what a projection-style deflation cannot do
    (measured: mirrored-projection recon 1.1e-4 vs 3.3e-6 here at
    kappa=1e4). The window's sigma ratio is bounded by step^span, so the
    window Gram's eigh resolves its pairs far better than the sweep
    phase's full-spectrum pair blocks."""
    import jax
    import jax.numpy as jnp

    ww = jax.lax.dynamic_slice(w, (0, lo), (w.shape[0], hi - lo))
    g = jnp.matmul(ww.T, ww, precision=prec)
    _, q = jnp.linalg.eigh(g)
    q = q[:, ::-1]                                   # descending sigma
    ww = jnp.matmul(ww, q, precision=prec)
    w = jax.lax.dynamic_update_slice(w, ww, (0, lo))
    vw = jax.lax.dynamic_slice(vt, (lo, 0), (hi - lo, vt.shape[1]))
    vw = jnp.matmul(q.T, vw, precision=prec)
    vt = jax.lax.dynamic_update_slice(vt, vw, (lo, 0))
    return w, vt


@functools.partial(__import__("jax").jit, donate_argnames=("w", "vt"))
def _resort_by_norm(w, vt):
    import jax.numpy as jnp

    s = jnp.sqrt(jnp.sum(jnp.square(w), axis=0))
    order = jnp.argsort(-s)
    return jnp.take(w, order, axis=1), jnp.take(vt, order, axis=0), \
        jnp.take(s, order)


def _graded_polish(u, s, s_host, vt, prec, *, step=8.0, span=3, passes=2,
                   quantum=32, s_keep=0.1):
    """Sliding sigma-window orthogonal mirrors over W = U diag(s): see
    the module docstring. Windows are [b_i, b_{i+span}) over the
    step-ratio boundaries, TRIMMED at the top to the damaged region
    sigma < s_keep * sigma_max: a pair's CholQR recon damage is
    eps * sigma_max^2 / sigma_i, which only clears the ~1e-6 budget when
    BOTH sigmas are small, so pairs with a large-sigma member never need
    the mirror. The trim is what keeps this path cheap on benign
    spectra: a random Gaussian matrix (kappa ~ 5n, but only a few
    percent of columns below s_keep) gets a couple of tiny windows
    (measured: two 32-column eighs at k=128) while a logspace spectrum
    gets the full slide. Measured ladder at 128^2 fp32: recon 2-3e-6 and
    sigma max-err ~3e-7 for kappa 1e2..1e6 (bare CholQR2: 1e-5..6e-4).

    The whole pass repeats `passes` times with a descending re-sort and
    boundary recompute in between (mirrors reorder columns within a
    window); each extra pass costs one host fetch of the norms (~1 s
    through the axon tunnel). Returns (u, s, vt) with U re-normalized;
    the caller still runs the CholeskyQR2 touch-up, which now only moves
    eps-level mass."""
    import jax.numpy as jnp

    w = u * s[None, :]
    for p in range(passes):
        if p > 0:
            w, vt, s_dev = _resort_by_norm(w, vt)
            s_host = np.asarray(s_dev)
        if not float(s_host[0]) > 0:
            break
        cut = int(np.searchsorted(-s_host, -s_keep * float(s_host[0])))
        cut = (cut // quantum) * quantum
        bounds = _sigma_boundaries(s_host, step, quantum)
        nb = len(bounds) - 1
        done = set()
        for bi in range(nb):
            lo = max(bounds[bi], cut)
            hi = bounds[min(bi + span, nb)]
            if hi - lo < 2 or (lo, hi) in done:
                continue
            done.add((lo, hi))
            w, vt = _window_eigh_mirror(w, vt, lo=int(lo), hi=int(hi),
                                        prec=prec)
    w, vt, s_new = _resort_by_norm(w, vt)
    u = w / jnp.maximum(s_new, 1e-30)[None, :]
    return u, s_new, vt


@functools.partial(
    __import__("jax").jit,
    static_argnames=("n_keep",),
    donate_argnames=("w", "v"),
)
def _finish(w, v, *, n_keep: int):
    """sigma = column norms, U = W / sigma, global descending sort, crop
    the zero-padding columns (U to n_keep columns, Vt to n_keep rows AND
    columns — V's padded coordinates only carry null-space directions).
    Columns with sigma ~ 0 come back as ZERO U columns (handled by the
    caller's rank completion)."""
    import jax.numpy as jnp

    g, m, b = w.shape
    n_full = g * b
    wm = w.transpose(1, 0, 2).reshape(m, n_full)
    vm = v.transpose(1, 0, 2).reshape(v.shape[1], n_full)
    s = jnp.sqrt(jnp.sum(jnp.square(wm), axis=0))
    order = jnp.argsort(-s)[:n_keep]
    s = jnp.take(s, order)
    u = jnp.take(wm, order, axis=1) / jnp.maximum(s, 1e-30)[None, :]
    vt = jnp.take(vm, order, axis=1).T[:, :n_keep]
    # columns whose norm is at the underflow floor carry no direction:
    # zero them so the caller's completion sees exact zeros, not noise
    good = (s > 1e-30).astype(u.dtype)
    return u * good[None, :], s * good, vt * good[:, None]


def _complete_rank_deficient(u, s, rank_tol: float, prec):
    """Replace the U columns of (near-)zero singular values with an
    orthonormal completion of the leading columns' span: QR of
    [U_good | PRNG noise] — one device QR, no host round trip. R's
    diagonal signs are folded back so the leading r columns stay EQUAL to
    U_good (QR's sign convention would otherwise flip some)."""
    import jax
    import jax.numpy as jnp

    m, k = u.shape
    smax = s[0] if s.shape[0] else jnp.float32(0)
    good = np.asarray(s > rank_tol * np.maximum(np.asarray(smax), 1e-30))
    r = int(good.sum())
    if r == k:
        return u
    noise = jax.random.normal(jax.random.PRNGKey(0), (m, k - r), u.dtype)
    q, rr = jnp.linalg.qr(jnp.concatenate([u[:, :r], noise], axis=1),
                          mode="reduced")
    sign = jnp.sign(jnp.diagonal(rr))
    sign = jnp.where(sign == 0, 1.0, sign).astype(u.dtype)
    return q * sign[None, :]


@functools.partial(
    __import__("jax").jit,
    static_argnames=("tau", "cut_c", "prec"),
    donate_argnames=("u", "vt"),
)
def _refine_step(x, u, s, vt, *, tau: float, cut_c: float, prec):
    """One Ogita-Aishima-style SVD iterative-refinement step — the
    quadratic-contraction finisher that takes the factors from the
    sweep phase's accumulated-roundoff floor (~sqrt(rounds*2b)*eps, the
    dominant recon term at large n: the polish probe measured recon
    BEFORE the polish == after, so the error is baked in by the sweeps)
    down to the one-GEMM-rounding floor. First-order conditions for
    U' = U(I+E), V' = V(I+F) with U'^T U' = I, V'^T V' = I and
    U'^T A V' diagonal:

        E + E^T = R := I - U^T U,   F + F^T = S := I - V^T V,
        T_ij + sigma_j E_ji + sigma_i F_ij = 0  (i != j), T := U^T A V

    which is a per-(i,j)-pair 2x2 solve with determinant
    sigma_j^2 - sigma_i^2 — everything is five n^3 GEMMs plus
    elementwise algebra, so one step costs ~2% of the sweep phase.

    Two masks guard the 1/(sigma_j^2 - sigma_i^2) amplification, both
    falling back to the pure symmetrizers E = R/2, F = S/2 (which fix
    orthogonality and never touch the reconstruction):
    - tau: relative-gap mask for CLUSTERED pairs (|den| must exceed
      tau * (s_i^2+s_j^2)); for a cluster any orthonormal basis
      reconstructs equally well, so skipping costs nothing.
    - cut_c: noise-floor mask for TINY-sigma pairs: below
      sigma ~ sqrt(m)*eps*sigma_max, A's own stored rounding dominates
      A v_j, and the solve amplifies that noise by 1/sigma_tiny^2 —
      measured kappa=1e6 fp32 without this mask: recon 7e-6 -> 1.1e0
      in ONE step (divergent). Pairs with one LARGE sigma are safe
      (amplification ~ noise/sigma_big) and stay refined, so the
      graded-spectrum win survives: the mask only freezes tiny-tiny
      couplings, whose absolute off-mass is below the recon floor
      anyway."""
    import jax.numpy as jnp

    k = u.shape[1]
    eye = jnp.eye(k, dtype=u.dtype)
    r = eye - jnp.matmul(u.T, u, precision=prec)
    sm = eye - jnp.matmul(vt, vt.T, precision=prec)
    t = jnp.matmul(u.T, jnp.matmul(x, vt.T, precision=prec), precision=prec)
    sj = s[None, :]
    si = s[:, None]
    denom = sj * sj - si * si
    num_e = sj * (t + sj * r) + si * (t.T + sj * sm)
    num_f = si * (t + sj * r) + sj * (t.T + sj * sm)
    cut = cut_c * float(jnp.finfo(u.dtype).eps) * (u.shape[0] ** 0.5)
    pair2 = si * si + sj * sj
    safe = (jnp.abs(denom) > tau * pair2) & (pair2 > (cut * s[0]) ** 2)
    den_safe = jnp.where(safe, denom, 1.0)
    e = jnp.where(safe, num_e / den_safe, r * 0.5)
    f = jnp.where(safe, num_f / den_safe, sm * 0.5)
    u = u + jnp.matmul(u, e, precision=prec)
    vt = vt + jnp.matmul(f.T, vt, precision=prec)
    s2 = jnp.maximum(jnp.einsum(
        "mi,mi->i", u, jnp.matmul(x, vt.T, precision=prec),
        precision=prec), 0.0)
    order = jnp.argsort(-s2)
    return (jnp.take(u, order, axis=1), jnp.take(s2, order),
            jnp.take(vt, order, axis=0))


def svd_refine(x, u, s, vt, steps: int = 1, precision=None,
               tau: float = 3e-4, cut_c: float = 10.0):
    """Refine ANY thin SVD factors of x toward the true factorization:
    (U, s, Vt) -> (U', s', Vt') with quadratically smaller factor error
    per step (see _refine_step for the math and the two safety masks).
    Five n^3 GEMMs per step, entirely on device.

    Works on factors from any source — svd_jacobi (where it runs by
    default), the bdfac+host-gesdd `svd` path, `svd_tall`, or a
    deliberately perturbed factorization — as long as the factor error
    is small (first-order method: needs near-orthonormal U, V and
    near-diagonal U^T x V; errors up to ~1e-3 contract, ~1e-1 may
    diverge). The inputs are copied, not donated: the caller's arrays
    stay valid."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(x)
    # _refine_step donates its u/vt operands; copy so the caller's
    # arrays are not invalidated under them
    u = jnp.array(u)
    vt = jnp.array(vt)
    s = jnp.asarray(s)
    prec = precision if precision is not None else jax.lax.Precision.HIGHEST
    for _ in range(int(steps)):
        u, s, vt = _refine_step(x, u, s, vt, tau=float(tau),
                                cut_c=float(cut_c), prec=prec)
    return u, s, vt


@functools.partial(__import__("jax").jit, static_argnames=("prec",))
def _rayleigh_s(x, u, vt, *, prec):
    """Re-extract sigma as diag(U^T A V) after the polish — the
    reconstruction-OPTIMAL diagonal for orthonormal U, V (minimizes
    ||A - U diag(s) Vt||_F), and a second-order-accurate sigma: the
    polish removed U's leakage onto the leading true directions, so the
    cross terms sigma_i * c_i * d_i that floor the column-norm estimate
    at ~1e-4 * sigma_max (measured, kappa=1e4) collapse to
    ~eps * sigma_max. Returns sigma clamped at 0 and the descending
    re-sort order (refinement can swap near-equal neighbours)."""
    import jax.numpy as jnp

    av = jnp.matmul(x, vt.T, precision=prec)
    s = jnp.maximum(jnp.einsum("mi,mi->i", u, av, precision=prec), 0.0)
    order = jnp.argsort(-s)
    return jnp.take(s, order), order


def svd_jacobi(
    x,
    block: int = 512,
    max_sweeps: int = 24,
    tol: float = 2e-6,
    precision=None,
    compute_uv: bool = True,
    polish: bool = True,
    rank_tol: float = 0.0,
    skip_rel: Optional[float] = None,
    refine: int = 2,
    _sweep_trace: Optional[list] = None,
) -> Tuple:
    """Full SVD with vectors, no host O(n^3) stage: (U, s, Vt) DEVICE
    arrays with x = U @ diag(s) @ Vt (thin factors, k = min(m, n)), or
    just s (descending) when compute_uv=False.

    This closes the framework's with-vectors gap at n >= 8192 (TODO.md
    gap #1): the bdfac pipeline's host gesdd finish costs ~520 s there,
    while every stage here — batched pair Grams, batched 2b x 2b eighs,
    batched rotations — runs on the MXU/XLA, sized by `block` so one
    round's g/2 pairs go in one jit call.

    block: column-block width b (pair eighs are 2b x 2b; 512 pairs the
    measured sweet spot of batched eigh vs GEMM ratio on v5e). Inputs are
    zero-padded to an even number of blocks; zero columns are invariant
    under the pair rotations (eigh of [[G,0],[0,0]] leaves the zero
    eigenspace in place) and are cropped before returning.

    tol: converged when ||offdiag(W^T W)||_F / ||diag||_F falls below
    tol (fp32-HIGHEST floors at ~1.4e-6, typically in 6-9 sweeps —
    quadratic contraction once small); the loop also stops on stagnation
    (off-norm no longer shrinking: the roundoff floor).

    precision: MXU precision for Grams/rotations; defaults to HIGHEST
    (true-fp32 grade) because the batched eigh dominates the round's
    wall time anyway — HIGH only pays when m >> n makes the rotations
    dominant.

    polish: CholeskyQR2-reorthonormalize U before returning (~two GEMM
    passes). The Gram-eigh pair rotations orthogonalize an extreme-
    sigma-ratio column pair only to ~eps * ratio^2 (local Gram
    squaring), so for ill-conditioned inputs the trailing U columns
    drift; the polish restores working-precision U^T U = I while
    perturbing the reconstruction only at its existing floor (see
    _polish_u). V needs no polish — it accumulates exactly orthogonal
    rotations.

    rank_tol: > 0 replaces the U columns of singular values below
    rank_tol * s[0] with an orthonormal completion (one device QR);
    at 0 those columns return as exact zeros (x = U diag(s) Vt still
    holds — the zeroed columns multiply zero sigmas).

    skip_rel: per-pair convergence threshold below which a pair's
    rotation is replaced by the EXACT identity (see _sweep: identity
    multiplication is exact, so converged pairs stop re-absorbing GEMM
    roundoff — the dominant term in the accumulated reconstruction error
    at large n). None -> 1.5 * sqrt(2b) * u (1.5x the per-pair
    application-noise floor, u = eps/2): below 1x nothing ever measures
    converged so no pair skips; much above it, genuinely unconverged
    pairs freeze and recon degrades. Measured n=2048 b=256 kappa=1e4
    fp32 (floor 1.35e-6): skip 2e-6 -> 16 sweeps / recon 9.2e-6 vs
    0 -> 24 sweeps / 1.03e-5, while 4e-6 -> 1.27e-5 and 8e-6 -> 2.0e-5.
    0 disables thresholding.

    refine: number of Ogita-Aishima-style iterative-refinement steps
    applied to the polished factors (see _refine_step) — five GEMMs per
    step (~2% of the sweep wall), quadratic contraction of the factor
    error. This is what takes the reconstruction below the sweep
    phase's accumulated-roundoff floor: measured CPU fp32 n=2048,
    recon 1.13e-5 -> 9.8e-7 (random) / 1.10e-5 -> 8.8e-7 (kappa=1e4)
    at 2 steps, with orthogonality restored to working precision by a
    final CholeskyQR2 touch-up. Requires polish=True (the step is
    first-order: it needs near-orthonormal input); 0 disables.

    Wide inputs run on x.T (factors swapped back). Tall inputs run
    directly — one-sided Jacobi never forms an m x m object, so cost
    scales linearly in m and no QR pre-reduction is required (callers
    with m >> n can still pre-reduce via fused_tsqr and multiply Q back).
    """
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(x)
    if x.ndim != 2:
        raise ValueError(f"svd_jacobi expects a matrix, got {x.shape}")
    m, n = x.shape
    if m < n:
        # run on x.T and swap the factors back. polish is forwarded and
        # rank_tol is applied HERE, to the swapped-back U (the recursion's
        # V side) — forwarding it would complete the wide problem's Vt
        # instead, contrary to the contract (ADVICE r4 #1)
        res = svd_jacobi(x.T, block=block, max_sweeps=max_sweeps, tol=tol,
                         precision=precision, compute_uv=compute_uv,
                         polish=polish, rank_tol=0.0, skip_rel=skip_rel,
                         refine=refine, _sweep_trace=_sweep_trace)
        if not compute_uv:
            return res
        u, s, vt = res
        u_wide, vt_wide = vt.T, u.T
        if rank_tol > 0:
            prec_w = precision
            if prec_w is None:
                prec_w = jax.lax.Precision.HIGHEST
            u_wide = _complete_rank_deficient(u_wide, s, rank_tol, prec_w)
        return u_wide, s, vt_wide
    if n <= 8:
        # tiny problems: one host LAPACK call beats any device dispatch
        un, sn, vtn = np.linalg.svd(np.asarray(x), full_matrices=False)
        if not compute_uv:
            return jnp.asarray(sn)
        return jnp.asarray(un), jnp.asarray(sn), jnp.asarray(vtn)

    if x.dtype not in (jnp.float32, jnp.float64):
        x = x.astype(jnp.float32)
    prec = precision
    if prec is None:
        prec = jax.lax.Precision.HIGHEST

    b = min(block, -(-n // 2))
    g = -(-n // b)
    if g % 2:
        g += 1
    n_pad = g * b
    wm = x if n_pad == n else jnp.pad(x, ((0, 0), (0, n_pad - n)))
    w = wm.T.reshape(g, b, m).transpose(0, 2, 1)          # (g, m, b)
    eye = jnp.eye(n_pad, dtype=x.dtype)
    v = eye.T.reshape(g, b, n_pad).transpose(0, 2, 1)     # (g, n_pad, b)
    perms = jnp.asarray(roundrobin_schedule(g))

    if skip_rel is None:
        u_round = float(jnp.finfo(x.dtype).eps) / 2.0
        skip_rel = 1.5 * (2.0 * b) ** 0.5 * u_round
    prev = float("inf")
    off = 0.0
    for _ in range(max_sweeps):
        w, v = _sweep(w, v, perms, g=g, b=b, prec=prec,
                      skip_rel=float(skip_rel))
        off = float(_off_rel(w, prec=prec))
        if _sweep_trace is not None:
            _sweep_trace.append(off)
        if off <= tol or off >= 0.9 * prev:
            # converged, or the off-norm stopped contracting (the measure
            # is monotone under the rotations, so a near-1x step means
            # the fp roundoff floor — more sweeps only burn time)
            break
        prev = off
    if off > tol ** 0.5:
        # surface non-convergence instead of silently returning factors
        # whose off-norm is far above tol (ADVICE r4 #2): the polish
        # would force U^T U = I and mask a bad reconstruction. The
        # sqrt(tol) bar leaves the normal stagnation exit (roundoff
        # floor, a decade or so above tol) quiet.
        import warnings

        warnings.warn(
            f"svd_jacobi did not converge: off-norm {off:.2e} > "
            f"sqrt(tol) = {tol ** 0.5:.2e} after the sweep loop "
            f"(max_sweeps={max_sweeps}); factors may reconstruct poorly",
            RuntimeWarning, stacklevel=2)

    u, s, vt = _finish(w, v, n_keep=n)
    if not compute_uv:
        return s
    if polish:
        s_host = np.asarray(s)
        r = int(np.count_nonzero(s_host))
        # graded mirrors first, whenever any column sits below the
        # damaged-region cut (sigma < s_keep * sigma_max) — the bare
        # CholeskyQR2 would otherwise pay up to its sqrt(eps)*sigma_max
        # recon floor on those columns' noise angles. The window trim
        # makes this near-free for benign spectra (see _graded_polish).
        if r >= 2 and float(s_host[0]) > 0 and \
                float(s_host[0]) / float(s_host[r - 1]) > 10.0:
            if r == s.shape[0]:
                u, s, vt = _graded_polish(u, s, s_host, vt, prec)
            else:
                u2, s2g, vt2 = _graded_polish(
                    u[:, :r], s[:r], s_host[:r], vt[:r], prec)
                u = jnp.concatenate([u2, u[:, r:]], axis=1)
                s = jnp.concatenate([s2g, s[r:]])
                vt = jnp.concatenate([vt2, vt[r:]], axis=0)
            polish_vt = True   # the mirrors' GEMM roundoff on Vt rows
        else:
            # cropping the padded V coordinates loses the mass that
            # near-degenerate small-sigma pairs leaked into them
            # (eigh mixes sigma_min^2 with the padding zeros at
            # ~eps*lambda_max/sigma_min^2) — restore row
            # orthonormality the same way
            polish_vt = n_pad != n
        if r == s.shape[0]:
            u = _polish_u(u, prec=prec)
            if polish_vt:
                vt = _polish_u(vt.T, prec=prec).T
        elif r:
            # zero columns would make the polish Gram exactly singular;
            # polish the nonzero prefix only (sigma is sorted descending)
            u = jnp.concatenate([_polish_u(u[:, :r], prec=prec), u[:, r:]],
                                axis=1)
            if polish_vt:
                vt = jnp.concatenate(
                    [_polish_u(vt[:r].T, prec=prec).T, vt[r:]], axis=0)
        if r:
            s2, order = _rayleigh_s(x, u, vt, prec=prec)
            s = s2
            u = jnp.take(u, order, axis=1)
            vt = jnp.take(vt, order, axis=0)
        if refine and r >= 2:
            # quadratic-contraction finisher (see _refine_step): the
            # sweeps' accumulated rotation roundoff is baked into the
            # factors and no orthogonalization can remove it — this can.
            # Gated on polish (first-order step, needs near-orthonormal
            # input). Zero-sigma columns are frozen by the noise mask.
            for _ in range(int(refine)):
                u, s, vt = _refine_step(x, u, s, vt, tau=3e-4,
                                        cut_c=10.0, prec=prec)
            # the step leaves a ~1e-5-level symmetric orthogonality
            # residue; CholeskyQR2 restores working precision without
            # moving the refined reconstruction (measured), and the
            # Rayleigh re-extract keeps sigma recon-optimal
            if r == s.shape[0]:
                u = _polish_u(u, prec=prec)
                vt = _polish_u(vt.T, prec=prec).T
            else:
                u = jnp.concatenate(
                    [_polish_u(u[:, :r], prec=prec), u[:, r:]], axis=1)
                vt = jnp.concatenate(
                    [_polish_u(vt[:r].T, prec=prec).T, vt[r:]], axis=0)
            s2, order = _rayleigh_s(x, u, vt, prec=prec)
            s = s2
            u = jnp.take(u, order, axis=1)
            vt = jnp.take(vt, order, axis=0)
    if rank_tol > 0:
        u = _complete_rank_deficient(u, s, rank_tol, prec)
    return u, s, vt
