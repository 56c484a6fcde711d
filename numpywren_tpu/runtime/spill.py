"""Out-of-HBM execution: host-RAM-resident matrices streamed through HBM.

The reference's matrices always live OUTSIDE the compute nodes (S3), and
workers stream blocks through Lambda RAM (numpywren/matrix.py get_block /
job_runner.py cache). The TPU analog for matrices larger than HBM: the
matrix lives in the host tier (TiledMatrix storage="host"), and a
LEFT-LOOKING panel algorithm streams column super-panels through the chip —
each panel is updated by all previously factored panels (one GEMM per
predecessor panel, streamed), then factored on-device, then written back.

Device high-water mark: 2 panels (N x W each) + small workspace, regardless
of N. Host<->device traffic: O(N^2 * S) for S super-panels — the classic
out-of-core tradeoff the reference pays to S3 on every task.

Checkpoint/resume (SURVEY §5): the reference gets resume for free because
every completed tile is in S3 (block_idxs_exist). Here, each completed
panel is flushed to the host store + an on-disk manifest records the panel
counter; resume skips completed panels.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from numpywren_tpu.exceptions import ShapeError
from numpywren_tpu.tiled import TiledMatrix
from numpywren_tpu.utils import cdiv


def _panel_from_host(m: TiledMatrix, row0_t: int, col0_t: int, rows_t: int, cols_t: int,
                     lower_mirror: bool = False) -> np.ndarray:
    """Assemble tiles [row0_t:row0_t+rows_t) x [col0_t:col0_t+cols_t) into one
    host array. lower_mirror reads (j, i) transposed when i < j (SPD input
    stored lower-triangle-only, TiledSymmetricMatrix semantics)."""
    tm, tn = m.tile
    out = np.zeros((rows_t * tm, cols_t * tn), dtype=m.dtype)
    for i in range(rows_t):
        for j in range(cols_t):
            gi, gj = row0_t + i, col0_t + j
            if lower_mirror and gi < gj:
                blk = np.asarray(m.get_block(gj, gi)).T
            else:
                blk = np.asarray(m.get_block(gi, gj))
            out[i * tm : (i + 1) * tm, j * tn : (j + 1) * tn] = blk
    return out


def _panel_to_host(m: TiledMatrix, arr: np.ndarray, row0_t: int, col0_t: int):
    tm, tn = m.tile
    rows_t, cols_t = arr.shape[0] // tm, arr.shape[1] // tn
    for i in range(rows_t):
        for j in range(cols_t):
            m.put_block(arr[i * tm : (i + 1) * tm, j * tn : (j + 1) * tn],
                        row0_t + i, col0_t + j)


class SpillCheckpoint:
    """Panel-granular checkpoint manifest: completed L panels live in
    `dir/panel_<s>.npy` plus a manifest.json step counter."""

    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            os.makedirs(path, exist_ok=True)

    @property
    def manifest_file(self):
        return os.path.join(self.path, "manifest.json")

    def completed(self, expect_meta: Optional[dict] = None) -> int:
        """Panels already done. When expect_meta is given, the saved manifest
        must match it (same n/tile/panel_tiles) — resuming a checkpoint_dir
        left over from a DIFFERENT factorization would silently skip panels
        and return a wrong factor, so mismatch raises instead."""
        if not self.path or not os.path.exists(self.manifest_file):
            return 0
        with open(self.manifest_file) as f:
            manifest = json.load(f)
        if expect_meta:
            mismatched = {
                k: (manifest.get(k), v)
                for k, v in expect_meta.items()
                if manifest.get(k) != v
            }
            if mismatched:
                raise ValueError(
                    f"checkpoint at {self.path} belongs to a different run: "
                    f"{{saved vs current}} {mismatched}; delete the directory "
                    "or pass a fresh checkpoint_dir"
                )
        return manifest.get("panels_done", 0)

    def load_panel(self, s: int) -> np.ndarray:
        return np.load(os.path.join(self.path, f"panel_{s}.npy"))

    def save_panel(self, s: int, arr: np.ndarray, meta: dict):
        if not self.path:
            return
        np.save(os.path.join(self.path, f"panel_{s}.npy"), arr)
        tmp = self.manifest_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"panels_done": s + 1, **meta}, f)
        os.replace(tmp, self.manifest_file)  # atomic commit


def _bucket_tiles(rows_t: int, g: int, mode: str) -> int:
    """Padded row count (in tiles) for one panel/strip under a shape-
    bucketing mode: 'exact' = no padding (one XLA trace per panel step —
    fine on CPU, compile-BOUND through a remote TPU compile service at
    large panel counts: ~2 compiles x 30-90 s per step), 'pow2' = pad to
    the next power of two (O(log g) distinct shapes, <= 2x padded flops,
    ~1.33x average), 'full' = always the full height (ONE shape, 2x
    total update flops)."""
    if mode == "exact":
        return rows_t
    if mode == "full":
        return g
    if mode == "pow2":
        return min(g, 1 << max(rows_t - 1, 0).bit_length())
    raise ValueError(f"unknown shape_mode {mode!r} "
                     "(expected exact|pow2|full)")


def out_of_core_bdfac(
    a: TiledMatrix,
    panel_tiles: int = 4,
    precision=None,
    mesh=None,
    stop_panels: Optional[int] = None,
    shape_mode: str = "pow2",
    out: Optional[TiledMatrix] = None,
) -> TiledMatrix:
    """Right-looking out-of-core block bidiagonalization of a host-tier
    square TiledMatrix (SVD stage 1 beyond one chip's HBM — VERDICT r4
    #6; the in-HBM counterpart is compiler.lower.fused_bdfac, reference
    upstream:numpywren/algs.py::bdfac).

    Per W-wide panel step (W = panel_tiles * tile): factor the column
    panel on device (shifted CholeskyQR3 + Yamamoto reflector — the same
    panel chain as the fused path), stream the trailing matrix through
    HBM one column panel at a time applying H^T (two MXU GEMMs per
    chunk), then LQ the row panel and stream the body once more applying
    the right reflector. Device high-water mark: one panel + one chunk +
    the reflector, regardless of N. Host<->device traffic: the trailing
    matrix twice per step = O(N^3 / W) total — the classic out-of-core
    price, paid to host RAM instead of the reference's S3.

    Returns B: host-tier block bidiagonal with sigma(B) = sigma(a)
    (orthogonal sweeps), band ku = 2W - 1 (diagonal panel blocks
    upper-triangular, superdiagonal panel blocks lower-triangular except
    the final one, which lands full — the fused path's shape).

    mesh: every device-resident panel/chunk is sharded over the flat
    device axis (rows for the QR side, columns for the LQ side) so
    per-device HBM drops to 1/P — reflector algebra stays replicated
    (b x b) and XLA inserts the psum for the sharded-contraction Grams,
    exactly the out_of_core_cholesky(mesh=...) composition.

    shape_mode: pow2 zero-pad bucketing of the shrinking panel heights /
    trailing widths (O(log g) distinct compiled shapes — the remote TPU
    compile service costs 30-90 s per trace). The padding is invariant:
    padded panel rows are zero, so the CholeskyQR Gram, the Yamamoto
    reflector (zero rows in W) and every apply act as identity on them;
    padded row-panel columns likewise produce zero reflector columns.

    stop_panels: factor only the first so-many panel steps (prefix runs,
    the reference's truncate parameter at panel granularity)."""
    import jax
    import jax.numpy as jnp

    from numpywren_tpu.compiler.lower import (
        _panel_lq_update_cholqr,
        _panel_qr_update_cholqr,
        _small_inv_t,
    )
    from numpywren_tpu.ops.common import default_precision

    if a.shape[0] != a.shape[1] or a.tile[0] != a.tile[1]:
        raise ShapeError("out_of_core_bdfac needs a square matrix / square tiles")
    g = a.grid[0]
    t = a.tile[0]
    if g % panel_tiles:
        raise ShapeError(
            f"grid {g} not a multiple of panel_tiles {panel_tiles}")
    if precision is None:
        precision = default_precision(a.dtype)
    hp = jax.lax.Precision.HIGHEST
    pt = panel_tiles
    w = pt * t
    n_panels = g // pt
    if stop_panels is not None:
        n_panels_run = min(n_panels, max(0, int(stop_panels)))
    else:
        n_panels_run = n_panels

    b_out = out or TiledMatrix(
        key=a.key + ":ooc_B", shape=a.shape, tile=a.tile, dtype=a.dtype,
        storage="host",
        parent_fn=lambda m, i, j: np.zeros(m.tile, m.dtype),
    )
    # working copy (mutated in place panel by panel)
    work = TiledMatrix(
        key=a.key + ":ooc_work", shape=a.shape, tile=a.tile, dtype=a.dtype,
        storage="host",
        parent_fn=lambda m, i, j: np.zeros(m.tile, m.dtype),
    )
    for i in range(g):
        for j in range(g):
            work.put_block(np.asarray(a.get_block(i, j)), i, j)

    # mesh: flat device axis; QR-side operands row-sharded, LQ-side
    # operands column-sharded, reflector algebra replicated
    n_dev = 1
    row_sh = col_sh = repl_sh = None
    if mesh is not None:
        from jax.sharding import Mesh as _Mesh
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as _P

        devs = mesh.devices.reshape(-1)
        n_dev = len(devs)
        mesh1d = _Mesh(devs, ("d",))
        row_sh = NamedSharding(mesh1d, _P("d", None))
        col_sh = NamedSharding(mesh1d, _P(None, "d"))
        repl_sh = NamedSharding(mesh1d, _P())

    def place(host_arr, axis=0):
        if mesh is None:
            return jax.device_put(jnp.asarray(host_arr))
        sh = (row_sh if axis == 0 else col_sh) \
            if host_arr.shape[axis] % n_dev == 0 else repl_sh
        return jax.device_put(np.ascontiguousarray(host_arr), sh)

    @jax.jit  # re-traces per bucketed panel shape: O(log g) shapes
    def qr_panel(panel):
        r, _, refl = _panel_qr_update_cholqr(
            panel, None, precision, True, conv_tol=1e-5, fast_s=True,
            small_precision=hp)
        _, wv, _s_inv = refl
        st = _small_inv_t(wv[:w], hp)        # S^T, folded once per panel
        return r, wv, st

    @jax.jit
    def qr_panel_square(panel):
        r, _ = _panel_qr_update_cholqr(panel, None, precision,
                                       conv_tol=1e-5, fast_s=True,
                                       small_precision=hp)
        return r

    @jax.jit
    def apply_qt(chunk, wv, st):
        # H^T chunk = chunk - W S^T (W^T chunk)
        w1 = jnp.matmul(wv.T, chunk, precision=precision)
        sw1 = jnp.matmul(st, w1, precision=precision)
        return chunk - jnp.matmul(wv, sw1, precision=precision)

    @jax.jit
    def lq_panel(row_pan):
        l_blk, _, refl = _panel_lq_update_cholqr(
            row_pan, None, precision, True, conv_tol=1e-5, fast_s=True,
            small_precision=hp)
        _, wr, _s_inv = refl
        s_row = _small_inv_t(wr[:, :w].T, hp).T   # S_row, folded once
        return l_blk, wr, s_row

    @jax.jit
    def apply_h_right(chunk, wr, s_row):
        # chunk H = chunk - ((chunk W) S) W^T, row form
        u1 = jnp.matmul(chunk, wr.T, precision=precision)
        u1s = jnp.matmul(u1, s_row, precision=precision)
        return chunk - jnp.matmul(u1s, wr, precision=precision)

    def load(r0_t, c0_t, rows_t, cols_t, rows_bt=None, cols_bt=None,
             axis=0):
        arr = _panel_from_host(work, r0_t, c0_t, rows_t, cols_t)
        pad_r = ((rows_bt or rows_t) - rows_t) * t
        pad_c = ((cols_bt or cols_t) - cols_t) * t
        if pad_r or pad_c:
            arr = np.pad(arr, ((0, pad_r), (0, pad_c)))
        return place(arr, axis=axis)

    def store(dev_arr, r0_t, c0_t, rows_t, cols_t, target=None):
        real = dev_arr
        if dev_arr.shape[0] > rows_t * t or dev_arr.shape[1] > cols_t * t:
            real = jax.lax.dynamic_slice(
                dev_arr, (0, 0), (rows_t * t, cols_t * t))
        _panel_to_host(target if target is not None else work,
                       np.asarray(real), r0_t, c0_t)

    for s in range(n_panels_run):
        c0_t = s * pt
        c1_t = c0_t + pt
        rows_t = g - c0_t                    # panel height in tiles
        rows_bt = _bucket_tiles(rows_t, g, shape_mode)
        if rows_t == pt:                     # final square panel: R only
            panel = load(c0_t, c0_t, rows_t, pt)
            store(qr_panel_square(panel), c0_t, c0_t, pt, pt, target=b_out)
            break
        # 1. column-panel QR + reflector
        panel = load(c0_t, c0_t, rows_t, pt, rows_bt=rows_bt)
        r, wv, st = qr_panel(panel)
        store(r[: w], c0_t, c0_t, pt, pt, target=b_out)
        # 2. stream H^T over the trailing columns (writes back through
        #    host — the row panel below is re-read with updates applied)
        for q in range(s + 1, n_panels):
            chunk = load(c0_t, q * pt, rows_t, pt, rows_bt=rows_bt)
            store(apply_qt(chunk, wv, st), c0_t, q * pt, rows_t, pt)
        remaining = n_panels - s - 1         # superdiagonal panels left
        cols_t = g - c1_t
        if remaining >= 2:
            # 3. row-panel LQ + right reflector streamed over the body
            cols_bt = _bucket_tiles(cols_t, g, shape_mode)
            row_pan = load(c0_t, c1_t, pt, cols_t, cols_bt=cols_bt, axis=1)
            l_blk, wr, s_row = lq_panel(row_pan)
            store(l_blk, c0_t, c1_t, pt, pt, target=b_out)
            for i in range(c1_t, g, pt):
                chunk = load(i, c1_t, pt, cols_t, cols_bt=cols_bt, axis=1)
                store(apply_h_right(chunk, wr, s_row), i, c1_t, pt, cols_t)
        else:
            # single superdiagonal panel: lands in B as-is
            blk = _panel_from_host(work, c0_t, c1_t, pt, cols_t)
            _panel_to_host(b_out, blk, c0_t, c1_t)
    return b_out


def out_of_core_singular_values(
    a: TiledMatrix,
    panel_tiles: int = 4,
    precision=None,
    mesh=None,
) -> np.ndarray:
    """All singular values of a host-tier square TiledMatrix that never
    fits one chip's HBM: out_of_core_bdfac streams the reduction to a
    block-bidiagonal B (band ku = 2 * panel_tiles * tile - 1: the last
    superdiagonal panel lands untightened, like the fused path), then
    only the band (O(n * W) floats) is packed for the host LAPACK
    dgbbrd+dbdsdc finish — the models.singular_values contract at
    out-of-core scale."""
    from numpywren_tpu.models.band import band_sigma_packed

    b_mat = out_of_core_bdfac(a, panel_tiles=panel_tiles,
                              precision=precision, mesh=mesh)
    n = a.shape[0]
    t = a.tile[0]
    ku = min(2 * panel_tiles * t - 1, n - 1)
    ab = np.zeros((ku + 1, n), dtype=np.float64, order="F")
    off_max = cdiv(ku, t)
    for i_t in range(b_mat.grid[0]):
        for j_t in range(i_t, min(i_t + off_max + 1, b_mat.grid[1])):
            blk = np.asarray(b_mat.get_block(i_t, j_t), np.float64)
            r0, c0 = i_t * t, j_t * t
            for jj in range(blk.shape[1]):
                j = c0 + jj
                if j >= n:
                    break
                i0 = max(r0, j - ku)
                i1 = min(r0 + blk.shape[0], j + 1, n)
                if i1 > i0:
                    ab[ku + i0 - j: ku + i1 - j, j] += blk[i0 - r0: i1 - r0,
                                                           jj]
    return band_sigma_packed(ab, n, n, 0, ku)[:n]


def out_of_core_cholesky(
    a: TiledMatrix,
    panel_tiles: int = 4,
    precision=None,
    checkpoint_dir: Optional[str] = None,
    out: Optional[TiledMatrix] = None,
    cache_bytes: int = 0,
    pipeline_width: Optional[int] = None,
    on_event=None,
    mesh=None,
    stop_panels: Optional[int] = None,
    shape_mode: str = "pow2",
) -> TiledMatrix:
    """Left-looking blocked Cholesky of a host-tier SPD TiledMatrix.

    Only ~3-4 column super-panels are device-resident at any time (the
    live panel, up to pipeline_width-1 prefetched inputs, the recent
    factored panel serving strip hits, and writeback-pinned panels capped
    at pipeline_width; plus an optional `cache_bytes`-capped LRU of
    already-uploaded L strips — the reference worker's block cache,
    job_runner cache_size); works for matrices larger than HBM (BASELINE
    config #5). Returns a host-tier L.

    pipeline_width >= 2 (default: NpwConfig.pipeline_width) pipelines the
    panel stream (the reference worker's I/O-compute overlap,
    upstream:numpywren/job_runner.py pipeline_width async S3 reads):

    - a prefetch thread assembles + uploads input panels up to
      pipeline_width - 1 ahead of the factor loop (width 2 = classic
      double buffering; wider values are honored with deeper lookahead);
    - the factored panel's D2H fetch + host writeback + checkpoint run in
      a writer thread, so the NEXT panel's updates start immediately;
    - the most recent factored panel stays device-resident and serves the
      next panel's newest strip directly — the left-looking inner loop's
      first (tallest) strip never waits for the download (VERDICT r2
      missing #4: the O(N^2 S) dominant traffic is now hidden).

    Older strips come from the `cache_bytes` LRU or host assembly (which
    waits for that panel's writeback if still in flight — correctness
    before overlap). `on_event(kind, s)` is a test/trace hook (kinds:
    prefetch_issue/upload/factor/strip_hit_device/strip_load/download).
    on_event("download", s) fires in the writer thread BEFORE the host
    writeback, so tests can gate it to prove the main loop does not block
    on it.

    mesh (VERDICT r3 missing #1: mesh x spill composition): a
    jax.sharding.Mesh over which every device-resident panel is
    ROW-SHARDED — per-device HBM drops to (N x W)/P, so the out-of-core
    capacity scales with the slice size. The left-looking update GEMM is
    collective-free (row shards x replicated strip top); the factor step
    replicates only the (W x W) diagonal block (GSPMD all-gather) and
    solves the sub-diagonal rows locally. The reference's analog is its
    unlimited S3-side capacity with per-task block reads
    (upstream:numpywren/matrix.py get_block).

    stop_panels: factor only the first so-many super-panels (the
    reference's truncate prefix-run parameter at panel granularity,
    upstream:numpywren/algs.py cholesky truncate) — the checkpoint
    manifest then records the prefix and a later call with the same
    checkpoint_dir and a larger (or absent) stop_panels CONTINUES the
    factorization where it stopped.

    shape_mode ('exact'|'pow2'|'full', default 'pow2'): the panel height
    shrinks every step, and XLA re-traces `update`/`factor_panel` per
    shape — through the remote TPU compile service that is ~2 compiles x
    30-90 s PER PANEL (compile-bound at reference scale: N=131072 has 64
    panels). 'pow2' zero-pads every device-resident panel/strip to the
    next power-of-two tile count: O(log g) distinct shapes for <= 2x
    padded flops (~1.33x average). The padding is invariant through the
    algebra — padded strip rows are zeros, so updates leave padded panel
    rows untouched, and the factor's triangular solve maps zero rows to
    zero rows; writebacks slice the real rows on device before D2H.
    """
    import concurrent.futures

    import jax
    import jax.numpy as jnp

    from numpywren_tpu.compiler.lower import fused_cholesky_fn
    from numpywren_tpu.ops.common import default_precision
    from numpywren_tpu.utils import LRUCache

    if a.shape[0] != a.shape[1] or a.tile[0] != a.tile[1]:
        raise ShapeError("out_of_core_cholesky needs a square matrix / square tiles")
    g = a.grid[0]
    t = a.tile[0]
    n_pad = g * t
    if precision is None:
        precision = default_precision(a.dtype)
    lower_mirror = type(a).__name__ == "TiledSymmetricMatrix" or getattr(a, "_lower_only", False)

    l_out = out or TiledMatrix(
        key=a.key + ":ooc_L", shape=a.shape, tile=a.tile, dtype=a.dtype, storage="host",
        parent_fn=lambda m, i, j: np.zeros(m.tile, m.dtype),
    )

    # mesh mode: one flat device axis; panels/strips are row-sharded
    # whenever their row count divides the device count (tail panels fall
    # back to replicated — small by construction)
    n_dev = 1
    row_sh = repl_sh = None
    if mesh is not None:
        from jax.sharding import Mesh as _Mesh
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as _P

        devs = mesh.devices.reshape(-1)
        n_dev = len(devs)
        mesh1d = _Mesh(devs, ("d",))
        row_sh = NamedSharding(mesh1d, _P("d", None))
        repl_sh = NamedSharding(mesh1d, _P())

    def place(host_arr):
        """Device placement for a (rows, w) host panel/strip."""
        if mesh is None:
            return jax.device_put(jnp.asarray(host_arr))
        sh = row_sh if host_arr.shape[0] % n_dev == 0 else repl_sh
        return jax.device_put(np.ascontiguousarray(host_arr), sh)

    ckpt = SpillCheckpoint(checkpoint_dir)
    n_panels = cdiv(g, panel_tiles)
    if stop_panels is not None:
        n_panels = min(n_panels, max(0, int(stop_panels)))
    start_panel = ckpt.completed(
        expect_meta={"n": a.shape[0], "tile": t, "panel_tiles": panel_tiles}
    )
    # resume: reload completed panels into the output store
    for s in range(start_panel):
        arr = ckpt.load_panel(s)
        _panel_to_host(l_out, arr, s * panel_tiles, s * panel_tiles)

    @jax.jit
    def update(panel, l_strip, l_diag_strip):
        # panel -= L[rows, prev] @ L[cols, prev]^T (left-looking gemm).
        # mesh mode: panel and l_strip share row shards, the strip top is
        # replicated -> the GEMM is collective-free per device
        if mesh is not None:
            l_diag_strip = jax.lax.with_sharding_constraint(
                l_diag_strip, repl_sh)
        return panel - jnp.matmul(l_strip, l_diag_strip.T, precision=precision)

    @jax.jit  # re-traces per (shape, dtype); one panel shape per step
    def factor_panel(panel):
        # panel = [D; B]: D := chol(D); B := B D^{-T}
        w_cols = panel.shape[1]
        chol = fused_cholesky_fn(w_cols, t, precision=precision,
                                 dtype=panel.dtype, pallas=False)
        top = panel[:w_cols]
        if mesh is not None:
            # replicate only the (W, W) diagonal block (one all-gather);
            # every device factors it redundantly — cheaper than a
            # broadcast round, same trick as fabric.cholesky_2d's akk
            top = jax.lax.with_sharding_constraint(top, repl_sh)
        ld = chol(top)
        rest = panel[w_cols:]
        if rest.shape[0] == 0:
            return ld
        rest = jax.lax.linalg.triangular_solve(
            ld, rest, left_side=False, lower=True, transpose_a=True)
        out = jnp.concatenate([ld, rest], axis=0)
        if mesh is not None and out.shape[0] % n_dev == 0:
            out = jax.lax.with_sharding_constraint(out, row_sh)
        return out

    # device-side LRU of uploaded L strips, keyed by source panel q; each
    # strip is cached at its first (tallest) use, later panels slice a suffix.
    # Entries are (row0_t, arr) tuples, so the byte accounting must look at
    # the array member — the default size_fn would count tuples as 0 bytes
    # and never evict.
    cache = (
        LRUCache(cache_bytes, size_fn=lambda v: v[1].nbytes)
        if cache_bytes > 0
        else None
    )
    a.load_count = getattr(a, "load_count", 0)

    if pipeline_width is None:
        from numpywren_tpu.config import default_config

        pipeline_width = default_config().pipeline_width
    # events may fire from the prefetch/writer threads — hooks must be
    # thread-safe; main-thread events never wait on them
    event = on_event or (lambda kind, s: None)

    # writer thread: D2H + host writeback + checkpoint, off the factor loop
    writer = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    writer_futures = {}
    # device-resident copy of the most recent factored panel: serves the
    # next panel's newest (tallest) strip without waiting for its download
    recent = {}

    def load_strip(q: int, c0_t: int, rows_t: int, q_w: int):
        """L strip rows [c0_t, c0_t + rows_t) of panel q, rows_t possibly
        bucket-padded past the grid — the padding rows come back as zeros
        (host path pads the assembly; device hits require the source's own
        padding to cover the request, else fall through)."""
        real_t = min(rows_t, g - c0_t)
        hit = recent.get(q)
        if hit is not None:
            row0_t, arr = hit
            if (row0_t <= c0_t
                    and (c0_t - row0_t + rows_t) * t <= arr.shape[0]):
                event("strip_hit_device", q)
                return lax_slice_rows(arr, (c0_t - row0_t) * t, rows_t * t)
        if cache is not None:
            hit = cache.get(q)
            if hit is not None:
                row0_t, arr = hit
                if (row0_t <= c0_t
                        and (c0_t - row0_t + rows_t) * t <= arr.shape[0]):
                    return lax_slice_rows(arr, (c0_t - row0_t) * t,
                                          rows_t * t)
        # host path: panel q's writeback must have landed first
        fut = writer_futures.get(q)
        if fut is not None:
            fut.result()
        a.load_count += 1
        event("strip_load", q)
        host_strip = _panel_from_host(l_out, c0_t, q * panel_tiles,
                                      real_t, q_w)
        if rows_t > real_t:
            host_strip = np.pad(host_strip,
                                ((0, (rows_t - real_t) * t), (0, 0)))
        arr = place(host_strip)
        if cache is not None:
            cache.put(q, (c0_t, arr))
        return arr

    def lax_slice_rows(arr, r0, nrows):
        return jax.lax.dynamic_slice(arr, (r0, 0), (nrows, arr.shape[1]))

    def upload_panel(s: int):
        """Assemble the input panel on host and issue its H2D transfer
        (async dispatch: returns immediately, the copy rides under whatever
        the device is computing). Rows are zero-padded to the shape
        bucket — padded rows stay zero through every update (zero strip
        rows) and the factor (zero solve RHS)."""
        c0 = s * panel_tiles
        w_t = min(panel_tiles, g - c0)
        rows_t = g - c0
        rows_bt = _bucket_tiles(rows_t, g, shape_mode)
        host_panel = _panel_from_host(a, c0, c0, rows_t, w_t,
                                      lower_mirror=lower_mirror)
        if rows_bt > rows_t:
            host_panel = np.pad(host_panel,
                                ((0, (rows_bt - rows_t) * t), (0, 0)))
        event("upload", s)
        return place(host_panel)

    def write_back(s: int, c0: int, panel_dev, real_rows: int):
        # slice the real rows ON DEVICE first: D2H of bucket padding is
        # pure waste through a ~MB/s tunnel
        if panel_dev.shape[0] > real_rows:
            panel_dev = lax_slice_rows(panel_dev, 0, real_rows)
        host_l = np.asarray(panel_dev)           # D2H (writer thread)
        event("download", s)
        _panel_to_host(l_out, host_l, c0, c0)
        ckpt.save_panel(s, host_l, {"n": a.shape[0], "tile": t,
                                    "panel_tiles": panel_tiles})

    # prefetch thread: input panels up to pipeline_width - 1 ahead
    depth = max(0, int(pipeline_width) - 1)
    prefetcher = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    prefetched = {}
    issued = set()

    def ensure_prefetched(upto: int):
        for s2 in range(start_panel, min(upto + 1, n_panels)):
            if s2 not in issued:
                issued.add(s2)
                event("prefetch_issue", s2)
                prefetched[s2] = prefetcher.submit(upload_panel, s2)

    try:
        for s in range(start_panel, n_panels):
            c0 = s * panel_tiles
            w_t = min(panel_tiles, g - c0)       # panel width in tiles
            rows_t = g - c0                      # rows from the diagonal down
            rows_bt = _bucket_tiles(rows_t, g, shape_mode)
            ensure_prefetched(s + depth)
            fut = prefetched.pop(s, None)
            panel = fut.result() if fut is not None else upload_panel(s)
            # stream updates from previously factored panels
            for q in range(s):
                q_w = min(panel_tiles, g - q * panel_tiles)
                l_strip = load_strip(q, c0, rows_bt, q_w)
                l_top = l_strip[: w_t * t]       # rows of the panel's columns
                panel = update(panel, l_strip, l_top)
            panel = factor_panel(panel)
            event("factor", s)
            recent.clear()
            # serve copy: the NEXT panel's tallest-strip request starts
            # panel_tiles below this panel's top and is itself bucket-
            # padded, so it can overrun this panel's own bucket; pad the
            # device-resident serve copy to cover it (zero rows — exactly
            # what the request's padding must contain). O(log g) distinct
            # pad shapes; the writer gets the UNpadded panel.
            serve_t = rows_bt
            if s + 1 < n_panels and shape_mode != "exact":
                nxt_bt = _bucket_tiles(g - (s + 1) * panel_tiles, g,
                                       shape_mode)
                serve_t = max(rows_bt, panel_tiles + nxt_bt)
            if serve_t > rows_bt:
                # the padded serve copy REPLACES the factored panel (the
                # writer slices the real rows out of it), so only one
                # buffer per panel is ever live — a second copy OOM'd the
                # 16 GiB HBM at N=131072 with a GB-scale strip cache
                panel = jnp.pad(panel, ((0, (serve_t - rows_bt) * t),
                                        (0, 0)))
            recent[s] = (c0, panel)
            # backpressure: each queued writeback pins a device panel, so
            # cap outstanding jobs at pipeline_width before submitting
            pending = [s2 for s2, f in writer_futures.items() if not f.done()]
            for s2 in sorted(pending)[: max(0, len(pending) - max(1, int(pipeline_width)) + 1)]:
                writer_futures[s2].result()
            writer_futures[s] = writer.submit(write_back, s, c0, panel,
                                              rows_t * t)
            if pipeline_width <= 1:
                # serial mode: no overlap at all (the reference's
                # pipeline_width=1 worker semantics)
                writer_futures[s].result()
    finally:
        prefetcher.shutdown(wait=False)
        writer.shutdown(wait=True)
    # surface any writeback failure
    for fut in writer_futures.values():
        fut.result()

    # compile accounting for the O(log g) pow2-bucketing claim: each
    # jitted fn retraces once per distinct operand shape, so the jit cache
    # sizes ARE the compile counts (scale_proof asserts them against the
    # 2*log2(g)+const bound on the real chip)
    try:
        l_out.spill_stats = {
            "update_compiles": update._cache_size(),
            "factor_compiles": factor_panel._cache_size(),
            "host_strip_loads": a.load_count,
            "panels": n_panels - start_panel,
            "shape_mode": shape_mode,
        }
    except AttributeError:  # older jax without _cache_size
        l_out.spill_stats = None

    return l_out
