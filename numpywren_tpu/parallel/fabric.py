"""Fabric: explicit ICI collectives under shard_map (SURVEY §7 layer 3).

This is the rebuild of the reference's communication layer. There, ALL
communication is storage: a panel is "broadcast" by every Lambda reading the
same S3 blocks, and a reduction is a tree of tasks writing partial blocks
(numpywren/binops.py, algs.py `reducer`). Here the same two primitives are
explicit XLA collectives over the device mesh:

- panel broadcast  -> `psum` of a masked operand along a mesh axis
  (one-to-all over ICI; used by SUMMA's k-step panels)
- tree reduction   -> butterfly exchange via `ppermute` (the TSQR combine
  tree, log2(P) rounds, each a pairwise stacked QR)

`parallel.sharded` gets the same data movement implicitly from GSPMD; this
module is the hand-scheduled path for when the compiler's choices are not
good enough, and the reference point for what GSPMD must beat.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from numpywren_tpu.exceptions import ShapeError
from numpywren_tpu.ops.common import default_precision
from numpywren_tpu.parallel.mesh import make_mesh


def _as_host(x):
    """Pass device arrays through; keep host arrays HOST-side so
    device_put shards them per device directly — jnp.asarray first would
    stage a full copy on the default device (an OOM at sizes near one
    chip's HBM, the regime the mesh paths exist for)."""
    import numpy as _np

    return x if isinstance(x, jax.Array) else _np.asarray(x)


def broadcast_along(x, axis_name: str, root):
    """One-to-all broadcast along a mesh axis inside shard_map: mask + psum.
    (The S3-read analog: every device 'reads' the root's panel.)"""
    idx = lax.axis_index(axis_name)
    return lax.psum(jnp.where(idx == root, x, jnp.zeros_like(x)), axis_name)


# ---------------------------------------------------------------------------
# SUMMA GEMM
# ---------------------------------------------------------------------------

def summa_gemm(a, b, mesh: Optional[Mesh] = None, *, precision=None) -> jax.Array:
    """C = A @ B by SUMMA over a SQUARE (s x s) mesh: s k-steps, each
    broadcasting one block-column of A along mesh rows and one block-row of
    B along mesh columns, accumulating local MXU partials. All operands and
    the result are 2-D block-sharded."""
    mesh = mesh or make_mesh()
    rows_ax, cols_ax = mesh.axis_names
    r, c = mesh.devices.shape
    if r != c:
        raise ShapeError(f"summa_gemm needs a square mesh, got {mesh.devices.shape}")
    s = r
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ShapeError(f"gemm shape mismatch: {a.shape} @ {b.shape}")
    if m % s or k % s or n % s:
        raise ShapeError(f"shapes {a.shape} @ {b.shape} must divide mesh {s}")
    if precision is None:
        precision = default_precision(jnp.asarray(a).dtype)

    spec = P(rows_ax, cols_ax)
    a = jax.device_put(_as_host(a), NamedSharding(mesh, spec))
    b = jax.device_put(_as_host(b), NamedSharding(mesh, spec))

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
    )
    def f(a_loc, b_loc):
        c0 = jnp.zeros((a_loc.shape[0], b_loc.shape[1]), a_loc.dtype)
        # mark the carry as varying over the mesh axes (shard_map VMA rule:
        # the fori carry must match the body output's varying axes)
        c0 = lax.pcast(c0, (rows_ax, cols_ax), to="varying")

        def body(t, acc):
            a_pan = broadcast_along(a_loc, cols_ax, t)   # block-col t of A
            b_pan = broadcast_along(b_loc, rows_ax, t)   # block-row t of B
            return acc + jnp.matmul(a_pan, b_pan, precision=precision).astype(acc.dtype)

        return lax.fori_loop(0, s, body, c0)

    return jax.jit(f)(a, b)


def summa_syrk(s, pan, mesh: Optional[Mesh] = None, *, precision=None,
               pallas: bool = True) -> jax.Array:
    """S := S - P P^T over a SQUARE (r x r) mesh with S 2-D block-sharded
    and P row-sharded: device (i, j) pulls P's row block j from the diagonal
    owner with ONE broadcast along the mesh-rows axis, then runs its local
    rank-w update through the Pallas MXU kernel (or the bf16x3 compensated
    kernel in compensated mode).

    This is the explicit shard_map form of the Cholesky trailing update that
    GSPMD cannot express with Pallas kernels (parallel/sharded.py forces
    pallas=False because GSPMD cannot partition an opaque pallas_call;
    shard_map hands each device a LOCAL call, so the kernel survives —
    VERDICT r1 #5 / sharded.py's stated upgrade path)."""
    mesh = mesh or make_mesh()
    rows_ax, cols_ax = mesh.axis_names
    r, c = mesh.devices.shape
    if r != c:
        raise ShapeError(f"summa_syrk needs a square mesh, got {mesh.devices.shape}")
    n = s.shape[0]
    if s.shape[1] != n:
        raise ShapeError(f"S must be square, got {s.shape}")
    if pan.shape[0] != n:
        raise ShapeError(f"panel rows {pan.shape[0]} != S rows {n}")
    if n % r:
        raise ShapeError(f"n {n} must divide mesh dim {r}")
    if precision is None:
        precision = default_precision(jnp.asarray(s).dtype)

    s_spec = P(rows_ax, cols_ax)
    p_spec = P(rows_ax, None)
    s = jax.device_put(_as_host(s), NamedSharding(mesh, s_spec))
    pan = jax.device_put(_as_host(pan), NamedSharding(mesh, p_spec))

    from numpywren_tpu.compiler.lower import _sub_matmul

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(s_spec, p_spec), out_specs=s_spec,
        check_vma=False,
    )
    def f(s_loc, p_loc):
        # p_loc is replicated along cols (spec P(rows, None)): device (i, j)
        # already holds row block i; it needs row block j, owned by device
        # row j — one broadcast along the rows axis with the root depending
        # on this device's column index.
        my_col = lax.axis_index(cols_ax)
        p_j = broadcast_along(p_loc, rows_ax, my_col)
        # local rank-w update on the MXU (Pallas / compensated capable)
        return _sub_matmul(s_loc, p_loc, p_j, tb=True, precision=precision,
                           pallas=pallas)

    return jax.jit(f)(s, pan)


# ---------------------------------------------------------------------------
# Explicit-collective Cholesky (block-cyclic panels over a 1-D mesh)
# ---------------------------------------------------------------------------

def cholesky_1d(a, mesh: Optional[Mesh] = None, *, panel: int = 512,
                precision=None, lookahead: bool = True, gather: str = "device",
                schedule_log: Optional[list] = None):
    """Right-looking blocked Cholesky with hand-scheduled collectives:
    column super-panels are distributed BLOCK-CYCLICALLY over a 1-D mesh
    (panel k lives on device k mod P — the owner of the critical path
    rotates, so no device retires early), and each step is exactly one
    collective: the current panel is broadcast along the mesh (masked psum —
    the S3-panel-read of the reference, numpywren/algs.py cholesky), every
    device factors it redundantly (W x W potrf + rtrsm: cheaper than a
    second broadcast of the factor), and trailing updates of the panels a
    device owns run entirely locally.

    lookahead=True applies the reference's headline DAG-overlap transform
    (panel k+1 overlapping trailing-update k — SURVEY §2 PP row, the paper's
    pipelining analysis) as a STATIC schedule reorder: after factoring
    panel k, the owner updates ONLY column k+1, the broadcast of panel k+1
    is issued immediately, and the bulk trailing updates (j >= k+2) are
    emitted after it — the collective and the next factor then have no data
    dependence on the bulk GEMMs, so XLA's async scheduler hides them under
    the update work instead of serializing every device behind the owner.

    schedule_log (test hook): a list that receives the emission-order
    events ("bcast", k) / ("col_update", k) / ("bulk", k, j_slot) /
    ("factor", k) while the schedule traces.

    This is the explicit shard_map counterpart of parallel.sharded's
    GSPMD-partitioned cholesky — the reference point for what the compiler's
    automatic partitioning must beat. Correctness-validated on the virtual
    CPU mesh; written for real ICI.
    """
    mesh = mesh or make_mesh()
    devs = mesh.devices.reshape(-1)
    mesh1 = Mesh(devs, ("d",))
    p = len(devs)
    n = a.shape[0]
    if a.shape[0] != a.shape[1]:
        raise ShapeError(f"cholesky needs a square matrix, got {a.shape}")
    if n % panel:
        raise ShapeError(f"n {n} must be a multiple of panel {panel}")
    nb = n // panel
    nb_local = -(-nb // p)
    if precision is None:
        precision = default_precision(jnp.asarray(a).dtype)

    # pack columns block-cyclically on HOST and place each device's shard
    # directly (local[slot] = global panel d + slot*p, stored as full
    # (n, panel) columns — zeros above the diagonal are dead): no
    # full-size device-0 staging copy, so matrices near one chip's HBM
    # capacity still distribute (the defect class fixed in bdfac_1d)
    import numpy as _np

    a_host = _np.asarray(a)
    spec = P("d", None, None)
    shards = []
    for d, dev in enumerate(devs):
        local = _np.concatenate(
            [
                (a_host[:, (d + s * p) * panel : (d + s * p + 1) * panel]
                 if d + s * p < nb
                 else _np.zeros((n, panel), a_host.dtype))
                for s in range(nb_local)
            ],
            axis=1,
        )
        shards.append(jax.device_put(local[None], dev))
    packed = jax.make_array_from_single_device_arrays(
        (p, n, nb_local * panel), NamedSharding(mesh1, spec), shards)

    def factor_panel(pan, k):
        """potrf + solve of the full (n, panel) column holding global panel
        k; rows above k*panel are dead. Runs redundantly on every device."""
        d0 = k * panel
        diag = lax.dynamic_slice(pan, (d0, 0), (panel, panel))
        ld = lax.linalg.cholesky(diag, symmetrize_input=False)
        winv = lax.linalg.triangular_solve(
            ld, jnp.eye(panel, dtype=pan.dtype), left_side=True, lower=True
        )
        below = lax.dynamic_slice(pan, (d0 + panel, 0), (n - d0 - panel, panel)) \
            if d0 + panel < n else None
        out = jnp.zeros_like(pan)
        out = lax.dynamic_update_slice(out, jnp.tril(ld), (d0, 0))
        if below is not None:
            solved = jnp.matmul(below, winv.T, precision=precision)
            out = lax.dynamic_update_slice(out, solved, (d0 + panel, 0))
        return out

    log = schedule_log if schedule_log is not None else []

    @functools.partial(shard_map, mesh=mesh1, in_specs=(spec,), out_specs=spec,
                       check_vma=False)
    def run(local):
        local = local[0]  # (n, nb_local*panel) — leading shard dim of 1
        me = lax.axis_index("d")

        def bcast_state(loc, k):
            """Broadcast the current state of panel k from its owner."""
            owner, slot = k % p, k // p
            mine = lax.dynamic_slice(loc, (0, slot * panel), (n, panel))
            log.append(("bcast", k))
            return lax.psum(
                jnp.where(me == owner, mine, jnp.zeros_like(mine)), "d"
            )

        def commit(loc, lk, k):
            owner, slot = k % p, k // p
            return jnp.where(
                me == owner,
                lax.dynamic_update_slice(loc, lk, (0, slot * panel)),
                loc,
            )

        def upd_slot(loc, lk, s):
            """loc's column slot s -= L_k @ (row block j of L_k)^T."""
            col = lax.dynamic_slice(loc, (0, s * panel), (n, panel))
            pcc = lax.dynamic_slice_in_dim(
                lk, (me + s * p) * panel, panel, axis=0
            )
            col = col - jnp.matmul(lk, pcc.T, precision=precision)
            return lax.dynamic_update_slice(loc, col, (0, s * panel))

        if not lookahead:
            for k in range(nb):
                pan_k = bcast_state(local, k)
                log.append(("factor", k))
                lk = factor_panel(pan_k, k)      # redundant on all devices
                local = commit(local, lk, k)
                # local trailing updates: every owned panel j = me + s*p
                # with j > k (lax.cond skips already-factored panels)
                for s in range(nb_local):
                    j = me + s * p
                    do = jnp.logical_and(j > k, j < nb)
                    log.append(("bulk", k, s))
                    local = lax.cond(
                        do, lambda loc, s=s: upd_slot(loc, lk, s),
                        lambda loc: loc, local,
                    )
        else:
            pan = bcast_state(local, 0)
            log.append(("factor", 0))
            lk = factor_panel(pan, 0)
            local = commit(local, lk, 0)
            for k in range(nb):
                pan_next = None
                if k + 1 < nb:
                    # critical path first: owner(k+1) updates ONLY column
                    # k+1, then its broadcast is issued — nothing below
                    # depends on the bulk updates
                    owner_next, slot_next = (k + 1) % p, (k + 1) // p
                    log.append(("col_update", k + 1))
                    local = lax.cond(
                        me == owner_next,
                        lambda loc: upd_slot(loc, lk, slot_next),
                        lambda loc: loc,
                        local,
                    )
                    pan_next = bcast_state(local, k + 1)
                # bulk trailing updates with L_k: owned j >= k + 2
                for s in range(nb_local):
                    j = me + s * p
                    do = jnp.logical_and(j > k + 1, j < nb)
                    log.append(("bulk", k, s))
                    local = lax.cond(
                        do, lambda loc, s=s: upd_slot(loc, lk, s),
                        lambda loc: loc, local,
                    )
                if pan_next is not None:
                    log.append(("factor", k + 1))
                    lk = factor_panel(pan_next, k + 1)
                    local = commit(local, lk, k + 1)
        return local[None]  # restore shard dim

    out_packed = jax.jit(run)(packed)

    # unpack block-cyclic columns back to a flat lower-triangular matrix.
    # gather="host" assembles in host RAM piece by piece — the at-scale
    # form (a factor near one chip's HBM capacity must not re-materialize
    # dense on a device); "device" returns a jax array (small inputs).
    if gather == "host":
        out_np = _np.empty((n, n), a_host.dtype)
        for j in range(nb):
            d, s = j % p, j // p
            out_np[:, j * panel:(j + 1) * panel] = _np.asarray(
                out_packed[d, :, s * panel:(s + 1) * panel])
        return _np.tril(out_np)
    cols = []
    for j in range(nb):
        d, s = j % p, j // p
        cols.append(out_packed[d, :, s * panel : (s + 1) * panel])
    l = jnp.concatenate(cols, axis=1)
    return jnp.tril(l)


# ---------------------------------------------------------------------------
# 2-D block-cyclic Cholesky (the mesh-scalable explicit-collective path)
# ---------------------------------------------------------------------------

def cholesky_2d(a, mesh: Optional[Mesh] = None, *, panel: int = 512,
                precision=None, pallas: bool = True, lookahead: bool = True,
                gather: str = "device",
                schedule_log: Optional[list] = None,
                collective_log: Optional[list] = None):
    """Right-looking blocked Cholesky over a (r x c) mesh with 2-D
    block-cyclic tiles and ScaLAPACK-shaped collectives (pdpotrf structure;
    the reference's analog is every task reading its panel blocks from S3,
    upstream:numpywren/algs.py cholesky).

    Per panel step k, exactly three collectives, each O(n*panel/mesh_dim)
    bytes per device — NOT the O(n*panel) full-panel broadcast of
    `cholesky_1d` (VERDICT r2 missing #3):

      1. ``akk``   — the panel^2 diagonal block to everyone (2 psums);
         every device then factors it redundantly (cheaper than a second
         broadcast: XLA's potrf cost is near-flat in size).
      2. ``rows``  — the k%c mesh column solves ITS row blocks locally
         (one MXU GEMM against the inverted diagonal — Pallas-capable),
         then one psum along mesh rows hands every device the panel pieces
         for the row blocks it owns: n_loc_r * panel floats = O(n*panel/r).
      3. ``cols``  — the transposed pieces: each device contributes the
         subset of its row pieces that its mesh column needs (global block
         j == pj mod c), scattered into column-slot order; one psum along
         mesh columns: O(n*panel/c).

    The trailing update is then ENTIRELY local — one
    `_sub_matmul(..., pallas=True)` per device per step, which routes
    through the Pallas MXU kernels and, under NpwConfig.compensated, the
    bf16x3 compensated kernel (ops/gemm3.py): this is the path that makes
    the BASELINE "fp32 + compensated accumulation" mode multi-chip
    (VERDICT r2 missing #2). Static conservative slicing keeps per-step
    update shapes XLA-static while wasting at most one block row/col of
    flops (masked to zero, so correctness never depends on it).

    lookahead=True applies the same critical-path-first reorder as
    `cholesky_1d`: after step k's pieces are broadcast, ONLY panel k+1's
    column strip is updated, panel k+1's solve + broadcasts are emitted,
    and the bulk trailing update of step k comes last — so the
    collectives have no data dependence on the bulk GEMMs and XLA's async
    scheduler can overlap them.

    schedule_log receives trace-time events ("akk"/"solve"/"bcast_rows"/
    "bcast_cols"/"col_update"/"bulk", k). collective_log receives
    ("<kind>", k, floats_per_device) for every collective emitted — the
    per-step volume contract is asserted in tests.
    """
    from numpywren_tpu.compiler.lower import _matmul, _sub_matmul

    mesh = mesh or make_mesh()
    rows_ax, cols_ax = mesh.axis_names
    r, c = mesh.devices.shape
    n = a.shape[0]
    if a.shape[0] != a.shape[1]:
        raise ShapeError(f"cholesky needs a square matrix, got {a.shape}")
    if n % panel:
        raise ShapeError(f"n {n} must be a multiple of panel {panel}")
    nb = n // panel
    nbr = -(-nb // r)   # local row blocks per device
    nbc = -(-nb // c)   # local col blocks per device
    n_loc_r, n_loc_c = nbr * panel, nbc * panel
    if precision is None:
        precision = default_precision(jnp.asarray(a).dtype)
    import numpy as _np

    a_host = _np.asarray(a)
    dt = jnp.asarray(a_host[:1, :1]).dtype

    # pack 2-D block-cyclic on HOST, placing each device's shard directly
    # (entry (pi, pj, s, t) = global block (pi + s*r, pj + t*c),
    # zero-padded past the grid): no full-size device-0 staging copy, so
    # matrices near one chip's HBM capacity still distribute — exactly
    # the regime the BASELINE multi-chip config targets
    def _blk(i, j):
        if i < nb and j < nb:
            return a_host[i * panel:(i + 1) * panel,
                          j * panel:(j + 1) * panel]
        return _np.zeros((panel, panel), a_host.dtype)

    spec = P(rows_ax, cols_ax, None, None)
    shards = []
    for pi in range(r):
        for pj in range(c):
            local = _np.concatenate([
                _np.concatenate([_blk(pi + s * r, pj + t * c)
                                 for t in range(nbc)], axis=1)
                for s in range(nbr)
            ], axis=0)
            shards.append(jax.device_put(local[None, None],
                                         mesh.devices[pi, pj]))
    packed = jax.make_array_from_single_device_arrays(
        (r, c, n_loc_r, n_loc_c), NamedSharding(mesh, spec), shards)

    log = schedule_log if schedule_log is not None else []
    clog = collective_log if collective_log is not None else []
    eye = jnp.eye(panel, dtype=dt)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec,
                       check_vma=False)
    def run(local):
        local = local[0, 0]  # (n_loc_r, n_loc_c)
        pi = lax.axis_index(rows_ax)
        pj = lax.axis_index(cols_ax)
        glob_r = pi + jnp.arange(nbr) * r   # local row slot -> global block
        glob_c = pj + jnp.arange(nbc) * c

        def factor_panel(local, k):
            """Diagonal broadcast + local panel solve + the two piece
            broadcasts for step k. Returns (local', my_rows, my_cols):
            my_rows[s] = L[glob_r[s], k] (zero when glob_r[s] <= k),
            my_cols[t] = L[glob_c[t], k] (zero when glob_c[t] <= k)."""
            ok_col = pj == (k % c)
            ok_row = pi == (k % r)
            s_k = jnp.clip((k - pi) // r, 0, nbr - 1)
            t_k = jnp.clip((k - pj) // c, 0, nbc - 1)
            # 1. diagonal block to everyone; redundant potrf
            akk = lax.dynamic_slice(local, (s_k * panel, t_k * panel),
                                    (panel, panel))
            akk = jnp.where(ok_row & ok_col, akk, jnp.zeros_like(akk))
            log.append(("akk", k))
            clog.append(("akk", k, panel * panel))
            akk = lax.psum(lax.psum(akk, rows_ax), cols_ax)
            lkk = lax.linalg.cholesky(akk, symmetrize_input=False)
            winv = lax.linalg.triangular_solve(lkk, eye, left_side=True,
                                               lower=True)
            # 2. local panel solve on the owning mesh column (one MXU GEMM)
            log.append(("solve", k))
            pcol = lax.dynamic_slice(local, (0, t_k * panel),
                                     (n_loc_r, panel))
            solved = _matmul(pcol, winv, tb=True, precision=precision,
                             pallas=pallas).astype(dt)
            below = jnp.repeat(glob_r > k, panel)       # (n_loc_r,)
            solved = jnp.where(below[:, None], solved, jnp.zeros_like(solved))
            # commit: factored rows + tril(diagonal) into the owner column
            newcol = jnp.where(below[:, None], solved, pcol)
            with_diag = lax.dynamic_update_slice(
                newcol, jnp.tril(lkk), (s_k * panel, 0))
            newcol = jnp.where(ok_row, with_diag, newcol)
            local = jnp.where(
                ok_col,
                lax.dynamic_update_slice(local, newcol, (0, t_k * panel)),
                local,
            )
            # 3. row pieces: one psum along the mesh row — O(n*panel/r)
            log.append(("bcast_rows", k))
            clog.append(("bcast_rows", k, n_loc_r * panel))
            my_rows = lax.psum(
                jnp.where(ok_col, solved, jnp.zeros_like(solved)), cols_ax)
            # 4. transposed pieces: scatter my rows j == pj (mod c) into
            # column-slot order, one psum along the mesh column — O(n*panel/c)
            segs = []
            for t in range(nbc):
                j = pj + t * c
                src = jnp.clip((j - pi) // r, 0, nbr - 1)
                seg = lax.dynamic_slice(my_rows, (src * panel, 0),
                                        (panel, panel))
                have = (j % r == pi) & (j > k) & (j < nb)
                segs.append(jnp.where(have, seg, jnp.zeros_like(seg)))
            log.append(("bcast_cols", k))
            clog.append(("bcast_cols", k, n_loc_c * panel))
            my_cols = lax.psum(jnp.concatenate(segs, axis=0), rows_ax)
            return local, my_rows, my_cols

        def bulk_update(local, my_rows, my_cols, k, skip_col=None):
            """local[live, live] -= my_rows @ my_cols^T, statically sliced
            to the conservative live region (masked pieces make the <=1
            stale boundary block a no-op). skip_col zeroes the piece of an
            already-updated (lookahead) column block."""
            if skip_col is not None:
                t_s = jnp.clip((skip_col - pj) // c, 0, nbc - 1)
                zero = jnp.zeros((panel, panel), dt)
                my_cols = jnp.where(
                    pj == (skip_col % c),
                    lax.dynamic_update_slice(my_cols, zero, (t_s * panel, 0)),
                    my_cols,
                )
            r0 = ((k + 1) // r) * panel   # min factored rows over devices
            c0 = ((k + 1) // c) * panel
            if n_loc_r - r0 <= 0 or n_loc_c - c0 <= 0:
                log.append(("bulk", k))
                return local
            sub = lax.dynamic_slice(local, (r0, c0),
                                    (n_loc_r - r0, n_loc_c - c0))
            log.append(("bulk", k))
            sub = _sub_matmul(sub, my_rows[r0:], my_cols[c0:], tb=True,
                              precision=precision, pallas=pallas)
            return lax.dynamic_update_slice(local, sub.astype(dt), (r0, c0))

        if not lookahead:
            for k in range(nb):
                local, my_rows, my_cols = factor_panel(local, k)
                local = bulk_update(local, my_rows, my_cols, k)
        else:
            local, my_rows, my_cols = factor_panel(local, 0)
            for k in range(nb):
                nxt = None
                if k + 1 < nb:
                    # critical path first: update ONLY column k+1's strip
                    # on its owning mesh column, then emit panel k+1's
                    # solve + broadcasts before the bulk GEMMs
                    log.append(("col_update", k + 1))
                    t_n = jnp.clip((k + 1 - pj) // c, 0, nbc - 1)
                    strip = lax.dynamic_slice(local, (0, t_n * panel),
                                              (n_loc_r, panel))
                    piece = lax.dynamic_slice(my_cols, (t_n * panel, 0),
                                              (panel, panel))
                    strip2 = _sub_matmul(strip, my_rows, piece, tb=True,
                                         precision=precision, pallas=pallas)
                    local = jnp.where(
                        pj == ((k + 1) % c),
                        lax.dynamic_update_slice(local, strip2.astype(dt),
                                                 (0, t_n * panel)),
                        local,
                    )
                    nxt = factor_panel(local, k + 1)
                    local = nxt[0]
                local = bulk_update(
                    local, my_rows, my_cols, k,
                    skip_col=(k + 1 if k + 1 < nb else None),
                )
                if nxt is not None:
                    my_rows, my_cols = nxt[1], nxt[2]
        return local[None, None]

    out = jax.jit(run)(packed)

    # unpack block-cyclic tiles back into a flat lower-triangular matrix;
    # gather="host" assembles in host RAM tile by tile (see cholesky_1d)
    if gather == "host":
        out_np = _np.empty((n, n), a_host.dtype)
        for i in range(nb):
            for j in range(i + 1):  # lower triangle only
                s, t = i // r, j // c
                out_np[i * panel:(i + 1) * panel,
                       j * panel:(j + 1) * panel] = _np.asarray(
                    out[i % r, j % c, s * panel:(s + 1) * panel,
                        t * panel:(t + 1) * panel])
        return _np.tril(out_np)
    rows = []
    for i in range(nb):
        row = []
        for j in range(nb):
            s, t = i // r, j // c
            row.append(out[i % r, j % c,
                           s * panel:(s + 1) * panel,
                           t * panel:(t + 1) * panel])
        rows.append(jnp.concatenate(row, axis=1))
    return jnp.tril(jnp.concatenate(rows, axis=0))


# ---------------------------------------------------------------------------
# Distributed BDFAC (block bidiagonalization over a 1-D mesh)
# ---------------------------------------------------------------------------

def bdfac_1d(a, mesh: Optional[Mesh] = None, *, tile: int = 256,
             precision=None, lookahead: bool = True,
             return_band: bool = False,
             collective_log: Optional[list] = None,
             schedule_log: Optional[list] = None):
    """Block bidiagonalization (algs.bdfac / compiler.lower.fused_bdfac)
    with hand-scheduled collectives over a 1-D mesh — the multi-chip path
    for the SVD flagship, whose single-chip form cannot even hold the
    BASELINE headline sizes in one HBM (65536^2 fp32 = 16 GiB before the
    working set; the reference ran bdfac across thousands of Lambdas,
    upstream:numpywren/algs.py::bdfac).

    Layout: ROW blocks of size `tile` distributed block-cyclically
    (global row block j on device j mod P), each device holding its
    blocks as a (nb_local, tile, n) stack — full column extent local, so
    all right-side (LQ) applications are collective-free.

    Per sweep step k, exactly THREE O(tile * n)-or-smaller collectives:

      1. QR panel Gram — ONE psum of the (t, t) local Grams (the
         adaptive chain of compiler.lower with psum_axes: pass 2's Gram
         is analytic, extras psums fire only on breakdown; all factors
         are replicated t x t work). The Yamamoto basis-kernel reflector
         H = I - W S W^T (lower.py _panel_qr_update_cholqr) then needs
      2. w1 = W^T @ trailing — ONE psum of (t, n - c1) partial products
         (the two-sided update's row contraction), after which the
         trailing update is entirely local; plus a (t, t) psum for the
         panel's top block Q1.
      3. LQ row panel — ONE masked-psum broadcast of the owner's
         (t, n - c1) row panel; every device then runs the row-form
         CholeskyQR2 redundantly (t x t factors; the m-contraction is
         local because columns are not sharded) and applies the row
         reflector to its own rows with zero further communication.

    The band converges IN PLACE: finished row blocks hold exactly their
    [R_k | S_k] band content and the masks exclude them from later
    updates. Returns the assembled (n, n) block-bidiagonal B with
    sigma(B) = sigma(a) — or, with return_band=True, the band CONTENT
    only as (diag_blocks, super_blocks) lists of host (t, t) arrays
    (O(n * tile) bytes fetched; nothing dense ever assembled — the
    at-scale form consumed by models.singular_values).

    Panel factorization here is plain shifted CholeskyQR2 (not the full
    adaptive chain): the fabric path targets the well-conditioned panels
    of typical inputs, matching cholesky_1d's plain-potrf stance; route
    ill-conditioned inputs through the single-chip fused path or the
    executor stack.

    collective_log (test hook) receives ("kind", k, floats_per_device)
    for every collective emitted while tracing.
    """
    from numpywren_tpu.compiler.lower import _cholqr_adaptive

    mesh = mesh or make_mesh()
    devs = mesh.devices.reshape(-1)
    mesh1 = Mesh(devs, ("d",))
    p = len(devs)
    n = a.shape[0]
    if a.shape[0] != a.shape[1]:
        raise ShapeError(f"bdfac_1d needs a square matrix, got {a.shape}")
    t = tile
    if n % t:
        raise ShapeError(f"n {n} must be a multiple of tile {t}")
    nb = n // t
    nbl = -(-nb // p)  # local row-block slots per device
    if precision is None:
        precision = default_precision(jnp.asarray(a).dtype)
    import numpy as _np

    # pack rows block-cyclically on HOST and place each device's shard
    # directly (device d, slot s = global row block d + s*p): no full-size
    # device-0 staging copy — a matrix that fits no single HBM must never
    # exist on one chip, only its (nbl, t, n) shards
    a_host = _np.asarray(a)
    dt = jnp.asarray(a_host[:1, :1]).dtype
    hp = jax.lax.Precision.HIGHEST  # replicated t x t algebra
    eye = jnp.eye(t, dtype=dt)
    clog = collective_log if collective_log is not None else []
    slog = schedule_log if schedule_log is not None else []

    spec = P("d", None, None, None)
    sharding = NamedSharding(mesh1, spec)
    shards = []
    for d, dev in enumerate(devs):
        local = _np.stack([
            (a_host[(d + s * p) * t:(d + s * p + 1) * t, :]
             if d + s * p < nb else _np.zeros((t, n), a_host.dtype))
            for s in range(nbl)
        ], axis=0)
        shards.append(jax.device_put(local[None], dev))
    packed = jax.make_array_from_single_device_arrays(
        (p, nbl, t, n), sharding, shards)

    @functools.partial(shard_map, mesh=mesh1, in_specs=(spec,),
                       out_specs=spec, check_vma=False)
    def run(local):
        local = local[0]  # (nbl, t, n)
        me = lax.axis_index("d")
        gids = me + jnp.arange(nbl) * p          # global row block per slot

        def psum_masked(x, owner):
            return lax.psum(jnp.where(me == owner, x, jnp.zeros_like(x)),
                            "d")

        for k in range(nb):
            c0, c1 = k * t, (k + 1) * t
            owner, slot = k % p, k // p
            alive = ((gids >= k) & (gids < nb)).astype(dt)[:, None, None]
            # --- QR panel: cols [c0, c1), rows >= c0 (CholeskyQR2) ---
            pan = local[:, :, c0:c1] * alive
            # the FULL adaptive shifted-CholeskyQR chain with psum'd real
            # Grams (compiler.lower._cholqr_adaptive): slot-stacking is a
            # row permutation of the global panel (Gram-invariant), dead
            # slots contribute zero rows. Well-conditioned panels cost
            # exactly two Gram psums; breakdown panels pay extras psums
            # on demand — the single-chip robustness crosses chips.
            q2d, r_mat = _cholqr_adaptive(
                pan.reshape(nbl * t, t), precision, psum_axes=("d",),
                global_m=n - c0)
            # ONE real-Gram psum in the converged chain (pass 2's Gram is
            # analytic); data-dependent extras psums are not logged
            clog.append(("qr_gram", k, t * t))
            q = q2d.reshape(nbl, t, t)
            q1 = psum_masked(q[slot], owner)      # panel top block
            clog.append(("qr_q1", k, t * t))
            sigma = -jnp.where(jnp.diagonal(q1) >= 0, 1.0, -1.0).astype(dt)
            r_signed = sigma[:, None] * r_mat
            # panel columns -> E Sigma R on the owner; finished rows
            # (alive == 0) keep their band content in these columns
            pan_new = local[:, :, c0:c1] * (1.0 - alive)
            pan_new = pan_new.at[slot].add(
                jnp.where(me == owner, r_signed, jnp.zeros_like(r_signed)))
            local = local.at[:, :, c0:c1].set(pan_new)
            if k == nb - 1:
                break
            # Yamamoto reflector applied to the trailing columns
            w = q * sigma[None, None, :]
            w = w.at[slot].add(jnp.where(me == owner, -eye,
                                         jnp.zeros_like(eye)))
            s_inv = eye - sigma[:, None] * q1.T
            st = jnp.linalg.inv(s_inv).T
            tr = local[:, :, c1:] * alive
            w1 = lax.psum(jnp.einsum("sij,sik->jk", w, tr,
                                     precision=precision), "d")
            clog.append(("qr_w1", k, t * (n - c1)))
            sw1 = jnp.matmul(st, w1, precision=hp)
            do_lq = nb - k - 1 >= 2
            if lookahead and do_lq:
                # two-sided lookahead (see bdfac_2d): update ONLY row
                # block k (the LQ panel's sole input), emit the LQ
                # broadcast, then the bulk GEMMs — the collective has no
                # data dependence on the bulk work
                slog.append(("strip", k))
                strip = local[slot, :, c1:] - jnp.matmul(
                    w[slot], sw1, precision=precision)
                local = jnp.where(
                    me == owner, local.at[slot, :, c1:].set(strip), local)
            else:
                slog.append(("qr_bulk", k))
                upd = jnp.einsum("sij,jk->sik", w, sw1, precision=precision)
                local = local.at[:, :, c1:].add(-upd * alive)
            # --- LQ row panel: row block k over cols [c1, n) ---
            if do_lq:
                slog.append(("lq_panel", k))
                row_pan = psum_masked(local[slot, :, c1:], owner)
                clog.append(("lq_rowpan", k, t * (n - c1)))
                # row-form adaptive chain, fully replicated (the row
                # panel was broadcast; its contraction axis is local)
                qr_, l_mat = _cholqr_adaptive(row_pan, precision,
                                              rows=True)
                q1r = qr_[:, :t]
                sig_r = -jnp.where(jnp.diagonal(q1r) >= 0, 1.0,
                                   -1.0).astype(dt)
                wr = qr_ * sig_r[:, None]
                wr = wr.at[:, :t].add(-eye)
                s_row = jnp.linalg.inv(eye - sig_r[:, None] * q1r)
                if lookahead:
                    # deferred bulk QR update, excluding row block k
                    slog.append(("qr_bulk", k))
                    w_bulk = w.at[slot].set(
                        jnp.where(me == owner, jnp.zeros((t, t), dt),
                                  w[slot]))
                    upd = jnp.einsum("sij,jk->sik", w_bulk, sw1,
                                     precision=precision)
                    local = local.at[:, :, c1:].add(-upd * alive)
                slog.append(("lq_body", k))
                body_mask = ((gids > k) & (gids < nb)).astype(dt)[:, None,
                                                                  None]
                body = local[:, :, c1:] * body_mask
                u1 = jnp.einsum("sij,kj->sik", body, wr, precision=precision)
                u1s = jnp.einsum("sij,jk->sik", u1, s_row, precision=hp)
                upd_r = jnp.einsum("sij,jk->sik", u1s, wr,
                                   precision=precision)
                local = local.at[:, :, c1:].add(-upd_r * body_mask)
                # owner's row block k -> [L sigma_r | 0]
                l_signed = l_mat * sig_r[None, :]
                row_new = jnp.concatenate(
                    [l_signed, jnp.zeros((t, n - c1 - t), dt)], axis=1)
                local = jnp.where(
                    me == owner, local.at[slot, :, c1:].set(row_new), local)
            # else: a single superdiagonal block lands in the band as-is
        return local[None]

    out = jax.jit(run)(packed)
    if return_band:
        # fetch ONLY each block row's band window (t, <=2t) — O(n * tile)
        # bytes total; the zero bulk of the (n, n) band never leaves the
        # mesh and no dense square is ever assembled anywhere
        import numpy as _np2

        diags, sups = [], []
        for j in range(nb):
            d, s = j % p, j // p
            win = _np2.asarray(
                out[d, s, :, j * t:min((j + 2) * t, n)])
            diags.append(win[:, :t])
            sups.append(win[:, t:] if j + 1 < nb else None)
        return diags, sups
    rows = []
    for j in range(nb):
        d, s = j % p, j // p
        rows.append(out[d, s])
    return jnp.concatenate(rows, axis=0)


# ---------------------------------------------------------------------------
# Distributed BDFAC over an (r x c) mesh (the mesh-scalable 2-D path)
# ---------------------------------------------------------------------------

def bdfac_2d(a, mesh: Optional[Mesh] = None, *, tile: int = 256,
             precision=None, pallas: bool = True, lookahead: bool = True,
             return_band: bool = False,
             collective_log: Optional[list] = None,
             schedule_log: Optional[list] = None):
    """Block bidiagonalization over an (r x c) mesh with 2-D block-cyclic
    tiles — the mesh-SCALABLE form of `bdfac_1d`, whose O(tile * n)
    per-step broadcasts are the 1-D scaling limit (the same structural
    step cholesky_1d -> cholesky_2d takes; pdgebrd's distribution).

    Per sweep step every collective is O(tile * n / mesh_dim) or
    (tile, tile)-small:

      QR phase (block column k): one (t, t) real-Gram psum (the
      adaptive chain's pass-2 Gram is analytic; extras psums fire only
      on breakdown) + a (t, t) Q1 psum, factors replicated;
      the Yamamoto W panel — resident on mesh column k%c, row-sharded —
      is broadcast along mesh COLUMNS (O(n*t/r) per device), the
      trailing contraction W^T T is psum'd along mesh ROWS (O(n*t/c)),
      and the two-sided update is then entirely local.

      LQ phase (block row k): the exact mirror — row Grams psum'd along
      columns then rows, the row basis W_r broadcast along mesh ROWS
      (O(n*t/c)), the body contraction B W_r^T psum'd along COLUMNS
      (O(n*t/r)), local update.

    The band converges in place (finished blocks hold their [R|S]
    content; alive masks exclude them). v1 applies updates over the full
    local tiles under masks rather than conservatively sliced subranges
    (correct everywhere; the cholesky_2d-style static slicing is a
    later flops optimization).

    Returns the dense (n, n) band, or with return_band=True the
    (diag_blocks, super_blocks) host lists (O(n * tile) bytes fetched,
    nothing dense assembled). collective_log receives
    ("kind", k, floats_per_device) for every collective.
    """
    from numpywren_tpu.compiler.lower import (_cholqr_adaptive,
                                              _matmul, _sub_matmul)

    mesh = mesh or make_mesh()
    rows_ax, cols_ax = mesh.axis_names
    r, c = mesh.devices.shape
    n = a.shape[0]
    if a.shape[0] != a.shape[1]:
        raise ShapeError(f"bdfac_2d needs a square matrix, got {a.shape}")
    t = tile
    if n % t:
        raise ShapeError(f"n {n} must be a multiple of tile {t}")
    nb = n // t
    nbr = -(-nb // r)
    nbc = -(-nb // c)
    n_loc_r, n_loc_c = nbr * t, nbc * t
    if precision is None:
        precision = default_precision(jnp.asarray(a).dtype)
    hp = jax.lax.Precision.HIGHEST
    import numpy as _np

    a_host = _np.asarray(a)
    dt = jnp.asarray(a_host[:1, :1]).dtype
    eye = jnp.eye(t, dtype=dt)
    clog = collective_log if collective_log is not None else []
    slog = schedule_log if schedule_log is not None else []

    # host-side 2-D block-cyclic packing, placed shard by shard (no
    # full-size single-device staging buffer — see bdfac_1d)
    def _blk(i, j):
        if i < nb and j < nb:
            return a_host[i * t:(i + 1) * t, j * t:(j + 1) * t]
        return _np.zeros((t, t), a_host.dtype)

    spec = P(rows_ax, cols_ax, None, None)
    sharding = NamedSharding(mesh, spec)
    shards = []
    dev_grid = mesh.devices
    for pi in range(r):
        for pj in range(c):
            local = _np.concatenate([
                _np.concatenate([_blk(pi + s * r, pj + q * c)
                                 for q in range(nbc)], axis=1)
                for s in range(nbr)
            ], axis=0)
            shards.append(jax.device_put(local[None, None],
                                         dev_grid[pi, pj]))
    packed = jax.make_array_from_single_device_arrays(
        (r, c, n_loc_r, n_loc_c), sharding, shards)

    def psum2(x):
        return lax.psum(lax.psum(x, rows_ax), cols_ax)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec,),
                       out_specs=spec, check_vma=False)
    def run(local):
        local = local[0, 0]  # (n_loc_r, n_loc_c)
        pi = lax.axis_index(rows_ax)
        pj = lax.axis_index(cols_ax)
        glob_r = pi + jnp.arange(nbr) * r
        glob_c = pj + jnp.arange(nbc) * c

        for k in range(nb):
            ok_col = pj == (k % c)          # mesh column holding block col k
            ok_row = pi == (k % r)          # mesh row holding block row k
            s_k = jnp.clip((k - pi) // r, 0, nbr - 1)
            t_k = jnp.clip((k - pj) // c, 0, nbc - 1)
            alive_r = jnp.repeat((glob_r >= k) & (glob_r < nb), t)
            # ---- QR phase: block column k ----
            pcol = lax.dynamic_slice(local, (0, t_k * t), (n_loc_r, t))
            pan = jnp.where(ok_col & alive_r[:, None], pcol,
                            jnp.zeros_like(pcol))
            # full adaptive chain; real Grams psum'd over BOTH mesh axes
            # (non-owner columns hold zeros) — see bdfac_1d
            q, r_mat = _cholqr_adaptive(pan, precision,
                                        psum_axes=(rows_ax, cols_ax),
                                        global_m=n - k * t)
            # ONE real-Gram psum in the converged chain (see bdfac_1d)
            clog.append(("qr_gram", k, t * t))
            q_top = lax.dynamic_slice(q, (s_k * t, 0), (t, t))
            q1 = psum2(jnp.where(ok_row & ok_col, q_top,
                                 jnp.zeros_like(q_top)))
            clog.append(("qr_q1", k, t * t))
            sigma = -jnp.where(jnp.diagonal(q1) >= 0, 1.0, -1.0).astype(dt)
            r_signed = sigma[:, None] * r_mat
            # panel column -> E Sigma R (owner block); dead rows keep band
            pcol_new = jnp.where(alive_r[:, None], jnp.zeros_like(pcol),
                                 pcol)
            pcol_new = jnp.where(
                ok_row,
                lax.dynamic_update_slice(pcol_new, r_signed, (s_k * t, 0)),
                pcol_new)
            local = jnp.where(
                ok_col,
                lax.dynamic_update_slice(local, pcol_new, (0, t_k * t)),
                local)
            if k == nb - 1:
                break
            # Yamamoto column reflector, broadcast along mesh COLUMNS
            w = q * sigma[None, :]
            neg_eye = jnp.where(ok_row & ok_col, -eye, jnp.zeros_like(eye))
            w = lax.dynamic_update_slice(
                w, lax.dynamic_slice(w, (s_k * t, 0), (t, t)) + neg_eye,
                (s_k * t, 0))
            my_w = lax.psum(w, cols_ax)             # O(n*t/r) per device
            clog.append(("qr_wbcast", k, n_loc_r * t))
            s_inv = eye - sigma[:, None] * q1.T
            st = jnp.linalg.inv(s_inv).T
            # conservative static slicing (cholesky_2d's trick): slots
            # below k//r rows / (k+1)//c cols are dead on EVERY device, so
            # the update GEMMs shrink with progress; the <=1 stale
            # boundary block per axis stays masked to a no-op
            r0s = (k // r) * t
            c1s = ((k + 1) // c) * t
            trail_c = jnp.repeat((glob_c > k) & (glob_c < nb), t)[c1s:]
            tr = jnp.where(trail_c[None, :], local[r0s:, c1s:], 0.0)
            w1 = lax.psum(_matmul(my_w[r0s:], tr, ta=True,
                                  precision=precision, pallas=pallas),
                          rows_ax)                  # O(n*t/c) per device
            clog.append(("qr_w1", k, t * (n_loc_c - c1s)))
            sw1 = jnp.matmul(st, w1, precision=hp)
            # stale boundary cols masked in the SMALL operand, so the big
            # update rides the compensated-capable fused subtract
            sw1m = jnp.where(trail_c[None, :], sw1, 0.0)
            do_lq = nb - k - 1 >= 2
            if lookahead and do_lq:
                # critical path first (the cholesky_2d lookahead applied
                # two-sidedly): the LQ panel's ONLY input is row block k,
                # so update that strip alone, emit the LQ chain's Gram
                # psums + the W_r broadcast, and only THEN the bulk
                # trailing GEMMs — the collectives have no data
                # dependence on the bulk, so XLA's async scheduler can
                # overlap them
                slog.append(("strip", k))
                strip = lax.dynamic_slice(local, (s_k * t, c1s),
                                          (t, n_loc_c - c1s))
                w_k = lax.dynamic_slice(my_w, (s_k * t, 0), (t, t))
                strip2 = strip - jnp.matmul(w_k, sw1m, precision=precision)
                local = jnp.where(
                    ok_row,
                    lax.dynamic_update_slice(local, strip2.astype(dt),
                                             (s_k * t, c1s)),
                    local)
            else:
                slog.append(("qr_bulk", k))
                sub = _sub_matmul(local[r0s:, c1s:], my_w[r0s:], sw1m,
                                  precision=precision, pallas=pallas)
                local = local.at[r0s:, c1s:].set(sub.astype(dt))
            # ---- LQ phase: block row k ----
            if do_lq:
                t_k1 = jnp.clip((k + 1 - pj) // c, 0, nbc - 1)
                ok_col1 = pj == ((k + 1) % c)
                live_c = jnp.repeat((glob_c >= k + 1) & (glob_c < nb), t)
                slog.append(("lq_panel", k))
                prow = lax.dynamic_slice(local, (s_k * t, 0), (t, n_loc_c))
                pan_r = jnp.where(ok_row & live_c[None, :], prow,
                                  jnp.zeros_like(prow))
                qr_, l_mat = _cholqr_adaptive(
                    pan_r, precision, rows=True,
                    psum_axes=(rows_ax, cols_ax),
                    global_m=(nb - k - 1) * t)
                clog.append(("lq_gram", k, t * t))
                qr_top = lax.dynamic_slice(qr_, (0, t_k1 * t), (t, t))
                q1r = psum2(jnp.where(ok_row & ok_col1, qr_top,
                                      jnp.zeros_like(qr_top)))
                clog.append(("lq_q1", k, t * t))
                sig_r = -jnp.where(jnp.diagonal(q1r) >= 0, 1.0,
                                   -1.0).astype(dt)
                wr = qr_ * sig_r[:, None]
                neg_eye_r = jnp.where(ok_row & ok_col1, -eye,
                                      jnp.zeros_like(eye))
                wr = lax.dynamic_update_slice(
                    wr,
                    lax.dynamic_slice(wr, (0, t_k1 * t), (t, t)) + neg_eye_r,
                    (0, t_k1 * t))
                my_wr = lax.psum(wr, rows_ax)       # O(n*t/c) per device
                clog.append(("lq_wrbcast", k, t * n_loc_c))
                s_row = jnp.linalg.inv(eye - sig_r[:, None] * q1r)
                if lookahead:
                    # deferred QR bulk update, EXCLUDING row block k
                    # (strip-updated above): zero its W rows
                    slog.append(("qr_bulk", k))
                    my_w_bulk = jnp.where(
                        ok_row,
                        lax.dynamic_update_slice(
                            my_w, jnp.zeros((t, t), dt), (s_k * t, 0)),
                        my_w)
                    sub = _sub_matmul(local[r0s:, c1s:], my_w_bulk[r0s:],
                                      sw1m, precision=precision,
                                      pallas=pallas)
                    local = local.at[r0s:, c1s:].set(sub.astype(dt))
                # conservative slicing: body rows > k, cols >= k+1
                slog.append(("lq_body", k))
                r1s = ((k + 1) // r) * t
                c1b = ((k + 1) // c) * t
                body_r = jnp.repeat((glob_r > k) & (glob_r < nb), t)[r1s:]
                live_cs = live_c[c1b:]
                body = jnp.where(body_r[:, None] & live_cs[None, :],
                                 local[r1s:, c1b:], 0.0)
                u1 = lax.psum(_matmul(body, my_wr[:, c1b:], tb=True,
                                      precision=precision, pallas=pallas),
                              cols_ax)              # O(n*t/r) per device
                clog.append(("lq_u1", k, (n_loc_r - r1s) * t))
                u1s = jnp.matmul(u1, s_row, precision=hp)
                # u1s stale rows and my_wr dead cols are already zero, so
                # the masked update equals the fused subtract exactly
                u1sm = jnp.where(body_r[:, None], u1s, 0.0)
                sub_r = _sub_matmul(local[r1s:, c1b:], u1sm, my_wr[:, c1b:],
                                    precision=precision, pallas=pallas)
                local = local.at[r1s:, c1b:].set(sub_r.astype(dt))
                # block row k -> [L sigma_r at block col k+1 | zeros]
                l_signed = l_mat * sig_r[None, :]
                row_cur = lax.dynamic_slice(local, (s_k * t, 0),
                                            (t, n_loc_c))
                row_new = jnp.where(live_c[None, :],
                                    jnp.zeros_like(row_cur), row_cur)
                row_new = jnp.where(
                    ok_col1,
                    lax.dynamic_update_slice(row_new, l_signed,
                                             (0, t_k1 * t)),
                    row_new)
                local = jnp.where(
                    ok_row,
                    lax.dynamic_update_slice(local, row_new, (s_k * t, 0)),
                    local)
            # else: the single superdiagonal block lands in the band as-is
        return local[None, None]

    out = jax.jit(run)(packed)
    if return_band:
        import numpy as _np2

        diags, sups = [], []
        for j in range(nb):
            si, ti_ = j // r, j // c
            diags.append(_np2.asarray(
                out[j % r, j % c, si * t:(si + 1) * t,
                    ti_ * t:(ti_ + 1) * t]))
            if j + 1 < nb:
                tj = (j + 1) // c
                sups.append(_np2.asarray(
                    out[j % r, (j + 1) % c, si * t:(si + 1) * t,
                        tj * t:(tj + 1) * t]))
            else:
                sups.append(None)
        return diags, sups
    rows = []
    for i in range(nb):
        row = []
        for j in range(nb):
            s, q = i // r, j // c
            row.append(out[i % r, j % c, s * t:(s + 1) * t,
                           q * t:(q + 1) * t])
        rows.append(jnp.concatenate(row, axis=1))
    return jnp.concatenate(rows, axis=0)


# ---------------------------------------------------------------------------
# Distributed CholeskyQR2 (GEMM + psum; the MXU-native tall-skinny QR)
# ---------------------------------------------------------------------------

def cholqr2_sharded(a, mesh: Optional[Mesh] = None, *, compute_q: bool = False,
                    precision=None):
    """CholeskyQR2 over row shards: each device contributes its local Gram
    matrix, ONE psum reduces them over ICI, the tiny b x b Cholesky runs
    replicated, and Q stays row-sharded. Two rounds restore fp32-grade
    orthogonality. This is the distributed dual of the butterfly tree —
    one all-reduce of b^2 floats instead of log2(P) R exchanges."""
    mesh = mesh or make_mesh()
    devs = mesh.devices.reshape(-1)
    mesh1 = Mesh(devs, ("d",))
    p = len(devs)
    m, b = a.shape
    if m % p:
        raise ShapeError(f"rows {m} must divide {p} devices")
    if precision is None:
        precision = default_precision(jnp.asarray(a).dtype)

    spec = P("d", None)
    rep = P(None, None)
    a = jax.device_put(_as_host(a), NamedSharding(mesh1, spec))

    @functools.partial(
        shard_map, mesh=mesh1, in_specs=(spec,), out_specs=(spec, rep),
        check_vma=False,
    )
    def f(x_loc):
        def one_pass(x):
            g = lax.psum(jnp.matmul(x.T, x, precision=precision), "d")
            l = lax.linalg.cholesky(g, symmetrize_input=False)
            w = lax.linalg.triangular_solve(
                l, jnp.eye(l.shape[0], dtype=x.dtype), left_side=True, lower=True
            )
            return jnp.matmul(x, w.T, precision=precision), l

        q1, l1 = one_pass(x_loc)
        q2, l2 = one_pass(q1)
        r = jnp.matmul(l2.T, l1.T, precision=precision)
        return q2, r

    q, r = jax.jit(f)(a)
    return (q, r) if compute_q else r


def cholqr3s_sharded(a, mesh: Optional[Mesh] = None, *,
                     compute_q: bool = False, precision=None):
    """The ROBUST distributed tall-skinny QR: the full adaptive
    shifted-CholeskyQR chain (compiler.lower._cholqr_adaptive — the
    single-chip robust path, breakdown-proof to kappa ~1e8) with its real
    Grams psum'd over the mesh. Every (b, b) decision — shifted factors,
    Neumann cleanup, the analytic pass-2 convergence flag, extras-pass
    trips — is a pure function of the replicated Gram, so all devices run
    the identical chain; the (m, b) iterate stays row-sharded throughout.
    The well-conditioned case costs ONE psum'd Gram — one collective
    FEWER than cholqr2_sharded, because pass 2's Gram is the chain's
    analytic update; ill-conditioned inputs pay extra psum'd Gram passes
    on demand (where plain cholqr2_sharded returns NaN)."""
    from numpywren_tpu.compiler.lower import _cholqr_adaptive

    mesh = mesh or make_mesh()
    devs = mesh.devices.reshape(-1)
    mesh1 = Mesh(devs, ("d",))
    p = len(devs)
    m, b = a.shape
    if m % p:
        raise ShapeError(f"rows {m} must divide {p} devices")
    if precision is None:
        precision = default_precision(jnp.asarray(a).dtype)

    spec = P("d", None)
    rep = P(None, None)
    a = jax.device_put(_as_host(a), NamedSharding(mesh1, spec))

    @functools.partial(
        shard_map, mesh=mesh1, in_specs=(spec,), out_specs=(spec, rep),
        check_vma=False,
    )
    def f(x_loc):
        return _cholqr_adaptive(x_loc, precision, psum_axes=("d",),
                                global_m=m)

    q, r = jax.jit(f)(a)
    return (q, r) if compute_q else r


# ---------------------------------------------------------------------------
# Butterfly TSQR (all-reduce-shaped combine tree)
# ---------------------------------------------------------------------------

def _butterfly_groups(p: int, stride: int, b_fac: int):
    """Static group structure at one butterfly level: groups[i] = ordered
    member list of device i's group (devices i0 + k*stride < p for the
    b_fac-aligned base i0)."""
    groups = []
    for i in range(p):
        i0 = (i // (stride * b_fac)) * (stride * b_fac) + i % stride
        groups.append([i0 + k * stride for k in range(b_fac)
                       if i0 + k * stride < p])
    return groups


def tsqr_butterfly(a, mesh: Optional[Mesh] = None, *, axis: Optional[str] = None,
                   b_fac: int = 2, _return_stacked: bool = False):
    """R factor of a tall-skinny A via a k-ary butterfly TSQR across one
    mesh axis.

    Each device QRs its row shard, then ceil(log_b(P)) rounds: devices form
    groups of `b_fac` at stride b_fac^l, exchange R factors within the
    group via b_fac-1 cyclic ppermutes, and re-QR the stacked group — the
    k-ary `reducer` tree of the reference (algs.py tsqr, reducer b_fac)
    with every round an ICI exchange instead of an S3 write+read. Wider
    b_fac turns communication rounds into larger local QRs (BENCH.md: on
    the distributed tree each level IS a communication round, so b_fac=8
    turns 6 rounds into 2 at P=64).

    Any device count P >= 1 is accepted: a ragged tail group simply stacks
    fewer R factors (VERDICT r2 #8). When P is not a power of b_fac the
    tail groups may finish without the global R, so one final masked-psum
    broadcast from device 0 (whose group chain always covers all leaves)
    makes the result an all-reduce: every device holds the SAME R."""
    mesh = mesh or make_mesh()
    if axis is None:
        # flatten the whole mesh into one logical axis by reshaping devices
        devs = mesh.devices.reshape(-1)
        mesh = Mesh(devs, ("d",))
        axis = "d"
    if b_fac < 2:
        raise ShapeError(f"b_fac must be >= 2, got {b_fac}")
    p = mesh.shape[axis]
    m, b = a.shape
    if m % p:
        raise ShapeError(f"rows {m} must divide {p} devices")
    # is P a power of b_fac? (then the tree alone is already an all-reduce)
    q = p
    while q % b_fac == 0:
        q //= b_fac
    pow_of_b = q == 1

    spec = P(axis, None)
    a = jax.device_put(_as_host(a), NamedSharding(mesh, spec))

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec,
    )
    def f(a_loc):
        r = jnp.linalg.qr(a_loc, mode="r")
        me = lax.axis_index(axis)
        stride = 1
        while stride < p:
            groups = _butterfly_groups(p, stride, b_fac)
            # my group geometry, traced from axis_index (static p/stride):
            i0 = (me // (stride * b_fac)) * (stride * b_fac) + me % stride
            g_size = jnp.minimum(b_fac, -((i0 - p) // stride))  # ceil((p-i0)/stride)
            pos = (me - i0) // stride
            # b_fac-1 cyclic shifts: shift k delivers the R of the member
            # at group position (pos + k) % |group|
            recvs = [r]
            for k in range(1, b_fac):
                perm = []
                for i in range(p):
                    g = groups[i]
                    src = g[(g.index(i) + k) % len(g)]
                    perm.append((src, i))
                recvs.append(lax.ppermute(r, axis, perm))
            # scatter receives into group order so every member QRs the
            # IDENTICAL stacked matrix (slot s = R of member s)
            slots = []
            for s in range(b_fac):
                acc = jnp.zeros_like(r)
                for k in range(b_fac):
                    hit = ((pos + k) % jnp.maximum(g_size, 1) == s) & (k < g_size)
                    acc = acc + jnp.where(hit, recvs[k], 0.0)
                slots.append(acc)
            # ragged tail slots stay zero: qr([Rs; 0]) has the same R
            r = jnp.linalg.qr(jnp.concatenate(slots, axis=0), mode="r")
            stride *= b_fac
        if not pow_of_b:
            r = broadcast_along(r, axis, 0)
        return r

    stacked = jax.jit(f)(a)  # (p*b, b): identical R per device shard
    return stacked if _return_stacked else stacked[:b]
