"""Pallas factorization tile kernels (SURVEY §2: "every tile kernel gets a
real Pallas implementation" — these are the potrf/trtri/trsm members of the
family; the GEMM members live in ops/gemm.py / ops/gemm3.py).

Reference semantics: kernels.potrf / kernels.trsm
(upstream:numpywren/kernels.py wrap LAPACK); these are their MXU/VPU-native
equivalents for VMEM-resident tiles (n <= 1024 fp32 — the tile sizes the
framework's blocked algorithms actually use).

Design (potrf): the whole tile lives in VMEM; per 128-wide diagonal block a
`fori_loop` runs the unblocked right-looking factorization, accumulating the
block's INVERSE row-by-row in the same loop (forward substitution against
the already-built columns) so the below-panel solve is ONE MXU dot
X = A21 W^T instead of a sequential substitution, and the trailing update is
one more dot — the MAGMA explicit-inverse trick, entirely on-chip. XLA's
cholesky custom-call costs ~0.3 ms nearly flat in tile size inside a fused
program; this kernel replaces it where the latency matters (many small
panel factorizations, e.g. CholeskyQR Gram chains).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

_B = 128  # unblocked-factor width: one MXU/VPU native tile


def _factor_block_with_inverse(d):
    """Unblocked Cholesky of the (B, B) SPD block `d`, returning (l, w) with
    l lower-triangular, l l^T = d, and w = l^{-1} (accumulated row-by-row in
    the same loop: W[j, :] = (e_j - L[j, :j] W) / piv).

    All indexing is mask-select (Mosaic cannot lower dynamic_slice on
    values): extracting row/column j is a masked reduction, inserting is a
    masked where — each a (B, B) VPU op, B = 128."""
    b = d.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = lax.broadcasted_iota(jnp.int32, (b, b), 1)
    hp = lax.Precision.HIGHEST

    def body(j, carry):
        d, l, w = carry
        piv = jnp.sqrt(jnp.sum(jnp.where((rows == j) & (cols == j), d, 0.0)))
        col = jnp.sum(jnp.where(cols == j, d, 0.0), axis=1, keepdims=True) / piv
        colm = jnp.where(rows[:, :1] >= j, col, 0.0)        # (b, 1)
        # inverse row j BEFORE inserting column j into l: row j of l holds
        # exactly L[j, :j] (later columns still zero)
        lrow = jnp.sum(jnp.where(rows == j, l, 0.0), axis=0, keepdims=True)
        ej = (cols[:1, :] == j).astype(d.dtype)              # (1, b)
        wrow = (ej - jnp.matmul(lrow, w, precision=hp)) / piv
        w = jnp.where(rows == j, wrow, w)
        l = jnp.where(cols == j, colm, l)
        d = d - colm * colm.reshape(1, b)  # rank-1 trailing update (VPU)
        return d, l, w

    zero = jnp.zeros_like(d)
    _, l, w = lax.fori_loop(0, b, body, (d, zero, zero))
    return l, w


def _potrf_kernel(a_ref, l_ref, *, n):
    l_ref[:] = a_ref[:]
    hp = lax.Precision.HIGHEST
    for j0 in range(0, n, _B):
        l_blk, w = _factor_block_with_inverse(l_ref[j0:j0 + _B, j0:j0 + _B])
        l_ref[j0:j0 + _B, j0:j0 + _B] = l_blk
        if j0 + _B < n:
            below = l_ref[j0 + _B:, j0:j0 + _B]
            x = jnp.matmul(below, w.T, precision=hp)  # A21 L11^{-T}
            l_ref[j0 + _B:, j0:j0 + _B] = x
            trail = l_ref[j0 + _B:, j0 + _B:]
            l_ref[j0 + _B:, j0 + _B:] = trail - jnp.matmul(x, x.T, precision=hp)
    # zero the strict upper triangle (the loop leaves stale values there)
    r = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    l_ref[:] = jnp.where(r >= c, l_ref[:], 0.0)


def _potrf_inv_kernel(a_ref, l_ref, w_ref, *, n):
    """Fused Cholesky + full triangular inverse in ONE VMEM kernel:
    l l^T = a and w = l^{-1}. The per-128-block inverse falls out of the
    factor loop for free (_factor_block_with_inverse), and the
    off-diagonal inverse blocks are pure MXU GEMMs — so the kernel's
    sequential depth is the FACTOR's alone. The adaptive CholeskyQR chain
    consumes exactly (L, L^{-1}) per panel; XLA's separate
    cholesky + triangular_solve custom calls each pay their own blocked
    diag-invert machinery (profiled ~0.28 ms/panel combined at b=512
    inside fused bdfac)."""
    l_ref[:] = a_ref[:]
    _potrf_inv_into(l_ref, w_ref, n=n)


def _potrf_inv_into(l_ref, w_ref, *, n):
    """Ref-based blocked (L, L^{-1}): expects l_ref PRELOADED with the SPD
    operand; factors in place (strict upper zeroed) and leaves the inverse
    in w_ref. Static ref-slice writes only — the update form Mosaic
    lowers (dynamic_update_slice on VALUES inside a kernel does not)."""
    hp = lax.Precision.HIGHEST
    w_ref[:] = jnp.zeros((n, n), l_ref.dtype)
    nb = n // _B
    for j0 in range(0, n, _B):
        l_blk, w = _factor_block_with_inverse(l_ref[j0:j0 + _B, j0:j0 + _B])
        l_ref[j0:j0 + _B, j0:j0 + _B] = l_blk
        w_ref[j0:j0 + _B, j0:j0 + _B] = w
        if j0 + _B < n:
            below = l_ref[j0 + _B:, j0:j0 + _B]
            x = jnp.matmul(below, w.T, precision=hp)  # A21 L11^{-T}
            l_ref[j0 + _B:, j0:j0 + _B] = x
            trail = l_ref[j0 + _B:, j0 + _B:]
            l_ref[j0 + _B:, j0 + _B:] = trail - jnp.matmul(x, x.T, precision=hp)
    # zero the strict upper triangle (the loop leaves stale values there).
    # NB per-128-row-stripe masking measured WORSE on VMEM stack than the
    # full-matrix form (Mosaic appears not to reuse the per-stripe
    # temporaries): 20.4M vs 16.4M total in the chain kernel at n=512
    r = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    l_ref[:] = jnp.where(r >= c, l_ref[:], 0.0)
    # off-diagonal inverse blocks: W[i,j] = -W[i,i] (sum_k L[i,k] W[k,j])
    for j in range(nb):
        for i in range(j + 1, nb):
            acc = jnp.zeros((_B, _B), l_ref.dtype)
            for k in range(j, i):
                acc = acc + jnp.matmul(
                    l_ref[i * _B:(i + 1) * _B, k * _B:(k + 1) * _B],
                    w_ref[k * _B:(k + 1) * _B, j * _B:(j + 1) * _B],
                    precision=hp)
            w_ref[i * _B:(i + 1) * _B, j * _B:(j + 1) * _B] = -jnp.matmul(
                w_ref[i * _B:(i + 1) * _B, i * _B:(i + 1) * _B], acc,
                precision=hp)


def _trtri_kernel(l_ref, w_ref, *, n):
    """w = l^{-1} for lower-triangular l: per-diagonal-block inverses by
    direct row-wise forward substitution (the same masked-select loop shape
    as _factor_block_with_inverse), then the strictly-lower blocks by the
    blocked identity W[i, j] = -W[i, i] (sum_k L[i, k] W[k, j])."""
    hp = lax.Precision.HIGHEST
    nb = n // _B
    w_ref[:] = jnp.zeros((n, n), l_ref.dtype)  # out refs start uninitialized
    rows = lax.broadcasted_iota(jnp.int32, (_B, _B), 0)
    cols = lax.broadcasted_iota(jnp.int32, (_B, _B), 1)

    def invert_block(lb):
        def body(j, w):
            piv = jnp.sum(jnp.where((rows == j) & (cols == j), lb, 0.0))
            lrow = jnp.sum(jnp.where((rows == j) & (cols < j), lb, 0.0),
                           axis=0, keepdims=True)
            ej = (cols[:1, :] == j).astype(lb.dtype)
            wrow = (ej - jnp.matmul(lrow, w, precision=hp)) / piv
            return jnp.where(rows == j, wrow, w)
        return lax.fori_loop(0, _B, body, jnp.zeros_like(lb))

    for i in range(nb):
        w_ref[i * _B:(i + 1) * _B, i * _B:(i + 1) * _B] = invert_block(
            l_ref[i * _B:(i + 1) * _B, i * _B:(i + 1) * _B])
    for j in range(nb):
        for i in range(j + 1, nb):
            acc = jnp.zeros((_B, _B), l_ref.dtype)
            for k in range(j, i):
                acc = acc + jnp.matmul(
                    l_ref[i * _B:(i + 1) * _B, k * _B:(k + 1) * _B],
                    w_ref[k * _B:(k + 1) * _B, j * _B:(j + 1) * _B],
                    precision=hp)
            w_ref[i * _B:(i + 1) * _B, j * _B:(j + 1) * _B] = -jnp.matmul(
                w_ref[i * _B:(i + 1) * _B, i * _B:(i + 1) * _B], acc,
                precision=hp)


def _supported(n: int, dtype) -> bool:
    return (n % _B == 0 and n <= 1024 and dtype == jnp.float32)


@functools.lru_cache(maxsize=8)
def _potrf_call(n: int, interpret: bool):
    return jax.jit(pl.pallas_call(
        functools.partial(_potrf_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        interpret=interpret,
    ))


@functools.lru_cache(maxsize=8)
def _potrf_inv_call(n: int, interpret: bool):
    return jax.jit(pl.pallas_call(
        functools.partial(_potrf_inv_kernel, n=n),
        out_shape=(jax.ShapeDtypeStruct((n, n), jnp.float32),
                   jax.ShapeDtypeStruct((n, n), jnp.float32)),
        interpret=interpret,
    ))


@functools.lru_cache(maxsize=8)
def _trtri_call(n: int, interpret: bool):
    return jax.jit(pl.pallas_call(
        functools.partial(_trtri_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        interpret=interpret,
    ))


def potrf_pallas(a: jax.Array, *, interpret: bool = None) -> jax.Array:
    """Lower Cholesky factor of an SPD VMEM-sized tile (n <= 1024, n % 128
    == 0, fp32). Falls back to lax.linalg.cholesky outside that envelope."""
    n = a.shape[0]
    if interpret is None:
        from numpywren_tpu.ops.common import on_tpu

        interpret = not on_tpu()
    if not _supported(n, a.dtype):
        return lax.linalg.cholesky(a, symmetrize_input=False)
    return _potrf_call(n, interpret)(a)


def potrf_inv_pallas(a: jax.Array, *, interpret: bool = None):
    """(L, L^{-1}) of an SPD VMEM-sized tile in one fused kernel (n <=
    1024, n % 128 == 0, fp32); falls back to cholesky + triangular_solve
    outside that envelope."""
    n = a.shape[0]
    if interpret is None:
        from numpywren_tpu.ops.common import on_tpu

        interpret = not on_tpu()
    if not _supported(n, a.dtype):
        l = lax.linalg.cholesky(a, symmetrize_input=False)
        w = lax.linalg.triangular_solve(l, jnp.eye(n, dtype=l.dtype),
                                        left_side=True, lower=True)
        return l, w
    return _potrf_inv_call(n, interpret)(a)


def trtri_pallas(l: jax.Array, *, interpret: bool = None) -> jax.Array:
    """Inverse of a lower-triangular VMEM-sized tile (same envelope)."""
    n = l.shape[0]
    if interpret is None:
        from numpywren_tpu.ops.common import on_tpu

        interpret = not on_tpu()
    if not _supported(n, l.dtype):
        eye = jnp.eye(n, dtype=l.dtype)
        return lax.linalg.triangular_solve(l, eye, left_side=True, lower=True)
    return _trtri_call(n, interpret)(l)


def trsm_pallas(a: jax.Array, l: jax.Array, *, precision=None) -> jax.Array:
    """Solve X L^T = A (the Cholesky panel op, kernels.trsm semantics) via
    the explicit tile inverse + one MXU GEMM."""
    from numpywren_tpu.ops.common import default_precision

    if precision is None:
        precision = default_precision(a.dtype)
    w = trtri_pallas(l)
    return jnp.matmul(a, w.T, precision=precision)


# ---------------------------------------------------------------------------
# Blocked-Householder QR (the qr_factor/qr_leaf member of the family)
# ---------------------------------------------------------------------------

def _householder_panel(pan, j0, m):
    """Unblocked Householder QR of the (m, B) panel whose global column
    offset is j0 (rows < j0 + jj are already reduced and must not move).

    Returns (pan, v, tau_row): pan with the R rows in place (subdiagonal
    left as roundoff garbage — masked later), v the unit-lower Householder
    vectors (zero above the diagonal, 1 on it), tau_row (1, B).

    All indexing is mask-select (Mosaic cannot lower dynamic_slice on
    values). LAPACK geqrf conventions: beta = -sign(alpha) ||x||, v
    normalized to v[diag] = 1, tau = (beta - alpha)/beta in [1, 2]; a
    zero column yields tau = 1 with v = 0 (H = I) so the compact-WY
    T-inverse below stays finite."""
    b = pan.shape[1]
    rows = lax.broadcasted_iota(jnp.int32, (m, b), 0)
    cols = lax.broadcasted_iota(jnp.int32, (m, b), 1)
    hp = lax.Precision.HIGHEST

    def body(jj, carry):
        pan, v, taus = carry
        jg = j0 + jj
        x = jnp.sum(jnp.where((cols == jj) & (rows >= jg), pan, 0.0),
                    axis=1, keepdims=True)                     # (m, 1)
        sigma = jnp.sum(x * x)
        alpha = jnp.sum(jnp.where(rows[:, :1] == jg, x, 0.0))
        nrm = jnp.sqrt(sigma)
        beta = jnp.where(alpha >= 0, -nrm, nrm)
        good = sigma > 0
        denom = jnp.where(good, alpha - beta, 1.0)  # |denom| >= nrm > 0
        vcol = jnp.where(rows[:, :1] > jg, x, 0.0) / denom
        vcol = jnp.where(rows[:, :1] == jg, 1.0, vcol)
        vcol = jnp.where(good, vcol, 0.0)
        tau = jnp.where(good, (beta - alpha) / jnp.where(good, beta, 1.0),
                        1.0)
        # apply H = I - tau v v^T to the whole panel (v is zero above the
        # diagonal, so finished rows are untouched; already-reduced columns
        # only change in their roundoff-grade subdiagonal garbage)
        w = jnp.matmul(vcol.T, pan, precision=hp) * tau        # (1, b)
        pan = pan - vcol * w
        # R[jg, jj] = beta exactly (the rank-1 update leaves roundoff)
        pan = jnp.where((rows == jg) & (cols == jj), beta, pan)
        v = jnp.where(cols == jj, vcol, v)
        taus = jnp.where(cols[:1, :] == jj, tau, taus)
        return pan, v, taus

    zero_v = jnp.zeros_like(pan)
    zero_t = jnp.zeros((1, b), pan.dtype)
    return lax.fori_loop(0, b, body, (pan, zero_v, zero_t))


def _invert_upper(tinv, taus):
    """T = inv(T^{-1}) for the compact-WY factor, where
    T^{-1} = strict_upper(V^T V) + diag(1/tau) (verify at b=2: T =
    [[t1, -t1 t2 s12], [0, t2]] inverts to [[1/t1, s12], [0, 1/t2]]).
    Row-wise back-substitution with masked selects, upper-triangular
    mirror of _trtri_kernel's loop."""
    b = tinv.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = lax.broadcasted_iota(jnp.int32, (b, b), 1)
    hp = lax.Precision.HIGHEST
    tinv = jnp.where(rows == cols, 1.0 / taus, jnp.where(rows < cols, tinv, 0.0))

    def body(jr, t):
        j = b - 1 - jr  # rows bottom-up: row j needs rows > j complete
        piv = jnp.sum(jnp.where((rows == j) & (cols == j), tinv, 0.0))
        trow = jnp.sum(jnp.where((rows == j) & (cols > j), tinv, 0.0),
                       axis=0, keepdims=True)
        ej = (cols[:1, :] == j).astype(tinv.dtype)
        row = (ej - jnp.matmul(trow, t, precision=hp)) / piv
        return jnp.where(rows == j, row, t)

    return lax.fori_loop(0, b, body, jnp.zeros_like(tinv))


def _qr_kernel(a_ref, q_ref, r_ref, s_ref, *, m, n):
    """Thin Householder QR of the (m, n) VMEM tile: q (m, n) with
    orthonormal columns, r (n, n) upper triangular, a = q r to working
    precision. Blocked compact-WY by 128 columns: per panel an unblocked
    masked-select factor loop, T from the T^{-1} = strict_upper(V^T V) +
    diag(1/tau) identity, trailing update and Q reconstruction as MXU
    GEMMs — the kernel's sequential depth is the n-column factor loop
    alone."""
    hp = lax.Precision.HIGHEST
    s_ref[:] = a_ref[:]
    panels = []  # (j0, T) — V panels live in q_ref until the rebuild
    q_ref[:] = jnp.zeros((m, n), a_ref.dtype)
    for j0 in range(0, n, _B):
        pan, v, taus = _householder_panel(s_ref[:, j0:j0 + _B], j0, m)
        s_ref[:, j0:j0 + _B] = pan
        q_ref[:, j0:j0 + _B] = v
        s = jnp.matmul(v.T, v, precision=hp)
        t = _invert_upper(s, taus)
        panels.append((j0, t))
        if j0 + _B < n:
            body = s_ref[:, j0 + _B:]
            w1 = jnp.matmul(v.T, body, precision=hp)        # (B, cols)
            s_ref[:, j0 + _B:] = body - jnp.matmul(
                v, jnp.matmul(t.T, w1, precision=hp), precision=hp)
    rows_n = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols_n = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    r_ref[:] = jnp.where(rows_n <= cols_n, s_ref[:n, :], 0.0)
    # Q = (I - V1 T1 V1^T) ... (I - Vp Tp Vp^T) E, applied right-to-left
    rows_m = lax.broadcasted_iota(jnp.int32, (m, n), 0)
    cols_m = lax.broadcasted_iota(jnp.int32, (m, n), 1)
    q = jnp.where(rows_m == cols_m, 1.0, 0.0).astype(a_ref.dtype)
    for j0, t in reversed(panels):
        v = q_ref[:, j0:j0 + _B]
        w1 = jnp.matmul(v.T, q, precision=hp)
        q = q - jnp.matmul(v, jnp.matmul(t, w1, precision=hp), precision=hp)
    q_ref[:] = q


def _qr_supported(m: int, n: int, dtype) -> bool:
    # three (m, n) fp32 buffers + the (m, n) Q value must sit in VMEM:
    # the scoped limit is 16M on v5e, and m*n = 2^19 measured 17.45M
    # (compile-time vmem OOM on-chip), so the envelope stops at 2^18
    return (m % _B == 0 and n % _B == 0 and m >= n and n <= 512
            and m * n <= (1 << 18) and dtype == jnp.float32)


@functools.lru_cache(maxsize=8)
def _qr_call(m: int, n: int, interpret: bool):
    from jax.experimental.pallas import tpu as pltpu

    scratch = (pltpu.VMEM((m, n), jnp.float32),)
    return jax.jit(pl.pallas_call(
        functools.partial(_qr_kernel, m=m, n=n),
        out_shape=(jax.ShapeDtypeStruct((m, n), jnp.float32),
                   jax.ShapeDtypeStruct((n, n), jnp.float32)),
        scratch_shapes=scratch,
        interpret=interpret,
    ))


def qr_pallas(a: jax.Array, *, interpret: bool = None):
    """Thin Householder QR of a VMEM-sized tile — the Pallas qr_factor /
    qr_leaf member of the tile-kernel family (reference semantics:
    upstream:numpywren/kernels.py qr_factor wraps LAPACK geqrf).

    (q, r) with a = q r, q orthonormal to working precision, r upper
    triangular — unconditionally stable (no Gram matrix anywhere), the
    Pallas counterpart of the XLA geqrf custom call for Householder-grade
    panels. Envelope: fp32, 128 | m, 128 | n, m >= n, n <= 512,
    m * n <= 256K (VMEM residency: 512K measured 17.45M > the 16M scoped
    limit on v5e); falls back to jnp.linalg.qr outside it. Like potrf_pallas, the sequential n-column factor loop puts this
    at custom-call-comparable latency on current hardware — it exists to
    complete the Pallas kernel family and for fusion opportunities, not
    as a default (the perf path for well-conditioned panels remains the
    GEMM-only adaptive CholeskyQR chain in compiler/lower.py)."""
    m, n = a.shape
    if interpret is None:
        from numpywren_tpu.ops.common import on_tpu

        interpret = not on_tpu()
    if not _qr_supported(m, n, a.dtype):
        return jnp.linalg.qr(a, mode="reduced")
    return _qr_call(m, n, interpret)(a)


# ---------------------------------------------------------------------------
# One-launch CholeskyQR2 panel chain (VERDICT r4 #5: the whole
# factor + small-inv + apply chain in a single kernel)
# ---------------------------------------------------------------------------

def _cholqr2_chain_kernel(g_ref, x_ref, q_ref, total_ref, stat_ref,
                          l1_scr, w1_scr, linv_scr,
                          *, n, tm, rows, shift_c, conv_gate, apply_prec):
    """Grid step 0 runs the ENTIRE small-algebra chain of
    compiler.lower._cholqr_adaptive's pass-1-2 fold path in VMEM:
    always-shifted factor + explicit inverse (pass 1), analytic Gram
    update, pass 2 as the first-order Neumann cleanup (identity fold on
    the rare dev >= 0.1 panel — the caller's extras loop converges it),
    folded inverse into scratch, folded R into `total`, (dev2, conv)
    into `stat`. Steps >= 1 stream the (m, n) operand through VMEM tiles
    applying the folded inverse — so ONE launch replaces the chain's two
    custom calls plus every small GEMM and the big apply between them.
    All factor updates are static ref-slice writes (_potrf_inv_into):
    Mosaic lowers neither .at[].set scatters nor dynamic_update_slice on
    values inside a kernel."""
    i = pl.program_id(0)
    hp = lax.Precision.HIGHEST

    @pl.when(i == 0)
    def _():
        eye = jnp.eye(n, dtype=jnp.float32)
        g = g_ref[:]  # read ONCE: every ref read materializes its own
        # VMEM copy (two g reads measured +3-4M of scoped stack)
        rs_g = jnp.max(jnp.sum(jnp.abs(g), axis=1))
        floor = shift_c * rs_g
        l1_scr[:] = g + floor * eye
        _potrf_inv_into(l1_scr, w1_scr, n=n)
        w1 = w1_scr[:]
        # analytic pass-2 Gram via the EXACT identity
        # G2 = W1 (Gs - floor I) W1^T = I - floor W1 W1^T: one symmetric
        # (n, n) GEMM instead of two and G2 itself never materializes
        # (the cleanup consumes only E2). The floor-leak term dominates
        # the factor-roundoff term this form drops (both ~ kappa^2, the
        # leak carries the extra 4 sqrt(mb) factor), so the conv gate
        # stays conservative.
        e2 = (-floor) * jnp.matmul(w1, w1.T, precision=hp)
        dev2 = jnp.max(jnp.abs(e2))

        def write_fold(l2, li2):
            # folded inverse for the apply; folded R into total (l2/li2
            # never persist — scoped-VMEM stack is the binding constraint:
            # v5e has 16M and this kernel measured 16.4-23.5M in its
            # larger-scratch/straight-line variants)
            linv_scr[:] = jnp.matmul(li2, w1, precision=hp)
            if rows:
                total_ref[:] = jnp.matmul(l1_scr[:], l2, precision=hp)
            else:
                total_ref[:] = jnp.matmul(l2.T, l1_scr[:].T, precision=hp)

        # pass 2: first-order Neumann cleanup, valid for dev2 < 0.1. On
        # the RARE dev2 >= 0.1 panel the fold is the IDENTITY (pass 2
        # skipped) and conv stays false, so the caller's extras
        # while_loop runs real-Gram passes on the valid pass-1 iterate —
        # same convergence policy as the XLA path's shifted analytic
        # pass 2 + extras, at most one extra real pass there. (A second
        # in-kernel factor for that branch does not fit the VMEM stack.)
        @pl.when(dev2 < 1e-1)
        def _():
            m_ = jnp.tril(e2, -1) + jnp.diag(0.5 * jnp.diagonal(e2))
            m2 = jnp.matmul(m_, m_, precision=hp)
            ip2 = eye + m2
            li2 = ip2 - jnp.matmul(ip2, m_, precision=hp)
            m4 = jnp.matmul(m2, m2, precision=hp)
            write_fold(jnp.matmul(eye + m4, eye + m_, precision=hp), li2)

        @pl.when(dev2 >= 1e-1)
        def _():
            write_fold(eye, eye)

        conv = (dev2 < conv_gate).astype(jnp.float32)
        stat_ref[:] = jnp.concatenate(
            [dev2.reshape(1, 1), conv.reshape(1, 1)], axis=1)

    # every step (including 0, whose body above runs first) applies the
    # folded inverse to its (tm, n) stream block — same-step ordering is
    # sequential inside the kernel, so block 0 sees the fresh linv
    if rows:
        q_ref[:] = jnp.matmul(linv_scr[:], x_ref[:], precision=apply_prec)
    else:
        q_ref[:] = jnp.matmul(x_ref[:], linv_scr[:].T, precision=apply_prec)


def _chain_tm(m: int, n: int) -> int:
    # x + q stream tiles at 1 MB each: the kernel's VMEM bill is already
    # ~7 MB of (n, n) buffers at n=512 (measured 23.5M > the 16M scoped
    # limit with 5 scratch + 2 MB tiles)
    for tm in (2048, 1024, 512, 256, 128):
        if m % tm == 0 and tm * n * 4 <= (1 << 18):
            return tm
    return 0


def _chain_supported(m: int, n: int, dtype) -> bool:
    # n <= 256: at n=512 the step-0 body's temporaries SUM to 16.4-23.5M
    # of scoped-VMEM stack (Mosaic allocates one buffer per value, no
    # reuse — measured across six restructurings, 2026-08-19) against the
    # 16M v5e limit; b=256 panels fit
    return (n % _B == 0 and n <= 256 and m >= n and dtype == jnp.float32
            and _chain_tm(m, n) > 0)


@functools.lru_cache(maxsize=16)
def _chain_call(m: int, n: int, rows: bool, shift_c: float,
                conv_gate: float, apply_prec, interpret: bool):
    from jax.experimental.pallas import tpu as pltpu

    tm = _chain_tm(m, n)
    steps = m // tm
    if rows:
        x_spec = pl.BlockSpec((n, tm), lambda i: (0, i))
        q_spec = pl.BlockSpec((n, tm), lambda i: (0, i))
        x_shape, q_shape = (n, m), (n, m)
    else:
        x_spec = pl.BlockSpec((tm, n), lambda i: (i, 0))
        q_spec = pl.BlockSpec((tm, n), lambda i: (i, 0))
        x_shape, q_shape = (m, n), (m, n)
    return jax.jit(pl.pallas_call(
        functools.partial(_cholqr2_chain_kernel, n=n, tm=tm, rows=rows,
                          shift_c=shift_c, conv_gate=conv_gate,
                          apply_prec=apply_prec),
        grid=(steps,),
        in_specs=[pl.BlockSpec((n, n), lambda i: (0, 0)), x_spec],
        out_specs=(q_spec,
                   pl.BlockSpec((n, n), lambda i: (0, 0)),
                   pl.BlockSpec((1, 2), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct(q_shape, jnp.float32),
                   jax.ShapeDtypeStruct((n, n), jnp.float32),
                   jax.ShapeDtypeStruct((1, 2), jnp.float32)),
        scratch_shapes=tuple(pltpu.VMEM((n, n), jnp.float32)
                             for _ in range(3)),
        interpret=interpret,
    ))


def cholqr2_chain_pallas(g, p, *, rows: bool, shift_c: float,
                         conv_gate: float, precision=None,
                         interpret: bool = None):
    """One-launch CholeskyQR2 pass-1-2 chain (see _cholqr2_chain_kernel):
    returns (q, total, conv, dev2) with p = q @ total (rows=False) or
    p = total @ q (rows=True), matching compiler.lower._cholqr_adaptive's
    fold-path semantics exactly — the extras while_loop stays with the
    caller. Raises ValueError outside the envelope (fp32, n <= 512,
    128 | n, 128-divisible m >= n); callers gate on _chain_supported via
    this module's chain_supported()."""
    # Mosaic lowers only DEFAULT/HIGHEST dots ("Unsupported dot precision:
    # HIGH", measured on-chip): coerce the apply up to HIGHEST — at
    # (m, b)x(b, b) size the extra passes are microseconds
    if precision is None or precision == lax.Precision.HIGH:
        precision = lax.Precision.HIGHEST
    if interpret is None:
        from numpywren_tpu.ops.common import on_tpu

        interpret = not on_tpu()
    b = p.shape[0] if rows else p.shape[1]
    m = p.shape[1] if rows else p.shape[0]
    if not _chain_supported(m, b, p.dtype) or g.shape != (b, b):
        raise ValueError(f"cholqr2_chain_pallas: unsupported shapes "
                         f"m={m} b={b} dtype={p.dtype}")
    q, total, stat = _chain_call(m, b, bool(rows), float(shift_c),
                                 float(conv_gate), precision,
                                 interpret)(g, p)
    return q, total, stat[0, 1] > 0.5, stat[0, 0]


def chain_supported(m: int, n: int, dtype) -> bool:
    """Public envelope check for cholqr2_chain_pallas."""
    return _chain_supported(m, n, dtype)
