"""Region-fused lowering: flagship tiled programs as single fused XLA programs.

The generic executor (runtime.executor.JaxTaskExecutor) lowers ANY compiled
DSL program level-by-level with tile gather/scatter. That is correct but
leaves MXU throughput on the table: every level pays a gather + scatter over
the whole tile stack, and same-level tiles of one logical region are kept
apart.

This module is the static-schedule compiler's fast path (SURVEY §7 layer 4,
"the region-fused lowering in compiler.lower"): because TiledMatrix keeps
tiles contiguous in ONE flat padded jax.Array, a whole panel / trailing
region is a zero-copy slice, so the wavefront schedule of the flagship
algorithms lowers to a handful of large fused MXU ops per step:

- Cholesky step k: potrf(tile) -> panel trsm -> trailing syrk, where the
  trailing update runs over column super-panels so only the lower triangle
  is computed (the DSL's j <= i loop), keeping useful-flop efficiency while
  every GEMM stays MXU-sized.
- GEMM: one matmul over the flat arrays.
- TSQR: the tile column reshaped to a (leaves, rows, b) stack, leaf QRs
  batched with vmap, the combine tree unrolled with static halving.

Everything here traces into one jit per program — no host round trips
between steps (the inversion of the reference's per-task SQS/Redis round
trips, numpywren/job_runner.py).

`lower_fused(program)` pattern-matches a compiled TiledProgram against these
templates by its DSL name and returns a callable, or None when the program
has no fused specialization (the generic executor then runs it).
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from numpywren_tpu.ops.common import default_precision, on_tpu


def _dus(arr, update, i0: int, j0: int):
    return lax.dynamic_update_slice(arr, update, (i0, j0))


def _matmul(a, b, *, ta=False, tb=False, precision, pallas=True):
    """Large fused matmul. On TPU this routes through the Pallas MXU kernel
    when shapes are tile-aligned; elsewhere (CPU "fake cluster") jnp.matmul.
    pallas=False forces plain XLA dots — required under GSPMD partitioning
    (parallel.sharded), which cannot split an opaque pallas_call. Mosaic
    only accepts DEFAULT/HIGHEST dot precision, so HIGH (bf16x3, the fp32
    flagship) also takes the XLA path — XLA's HIGH dot already runs at the
    3-pass speed of light."""
    if precision == jax.lax.Precision.HIGH:
        pallas = False
    if pallas and on_tpu():
        from numpywren_tpu.ops.gemm import matmul as pallas_matmul

        try:
            return pallas_matmul(a, b, ta=ta, tb=tb, precision=precision)
        except Exception:
            pass  # unaligned fall-through
    if ta:
        a = a.T
    if tb:
        b = b.T
    return jnp.matmul(a, b, precision=precision)


# ---------------------------------------------------------------------------
# Cholesky
# ---------------------------------------------------------------------------

def _syrk_tril(a, pan, r1, j0, rows, depth, tile, precision, pallas, leaf_rows):
    """In-place a[j0:j0+rows, j0:j0+rows] -= P P^T restricted to the (block)
    lower triangle, recursively: the off-diagonal rectangle is ONE large MXU
    GEMM, the two diagonal halves recurse; leaves compute their full square
    (bounded waste: leaf_rows/rows of the flops).

    Splits MUST land on tile boundaries: a split through a diagonal tile
    would leave stale upper-triangle values inside a tile that a later
    potrf reads (cholesky sees the full tile)."""
    if depth == 0 or rows <= leaf_rows:
        p = lax.dynamic_slice(pan, (j0 - r1, 0), (rows, pan.shape[1]))
        s = lax.dynamic_slice(a, (j0, j0), (rows, rows))
        upd = _matmul(p, p, tb=True, precision=precision, pallas=pallas)
        return _dus(a, (s - upd).astype(a.dtype), j0, j0)
    h = (rows // 2 + tile - 1) // tile * tile  # split on a tile boundary
    p1 = lax.dynamic_slice(pan, (j0 - r1, 0), (h, pan.shape[1]))
    p2 = lax.dynamic_slice(pan, (j0 - r1 + h, 0), (rows - h, pan.shape[1]))
    s21 = lax.dynamic_slice(a, (j0 + h, j0), (rows - h, h))
    upd = _matmul(p2, p1, tb=True, precision=precision, pallas=pallas)
    a = _dus(a, (s21 - upd).astype(a.dtype), j0 + h, j0)
    a = _syrk_tril(a, pan, r1, j0, h, depth - 1, tile, precision, pallas, leaf_rows)
    a = _syrk_tril(a, pan, r1, j0 + h, rows - h, depth - 1, tile, precision, pallas, leaf_rows)
    return a


def fused_cholesky_fn(
    n_pad: int,
    tile: int,
    *,
    truncate: int = 0,
    syrk_depth: int = 3,
    leaf_rows: int = 2048,
    inv_panel: bool = True,
    precision=None,
    dtype=jnp.float32,
    pallas: bool = True,
) -> Callable:
    """Build the jittable in-place blocked Cholesky over a flat padded array.

    Right-looking factorization, unrolled over the k panels at trace time so
    every slice has static shape (XLA requirement; SURVEY §7 "no
    data-dependent control flow inside jit"). Design choices measured on
    chip (see bench.py):

    - panel op as explicit triangular inverse + GEMM (`inv_panel`): the
      tile inverse is one small solve; the panel apply becomes an MXU GEMM
      with a precision knob, ~3x faster than the long-rhs triangular_solve.
    - trailing update via _syrk_tril: recursive lower-triangle-only syrk —
      big off-diagonal GEMMs, bounded full-square waste at the leaves.
    - potrf reads only the lower triangle (symmetrize_input=False): the
      strictly-upper region of a diagonal tile may hold stale values.

    Returns fn(a) -> l where `a` is the (n_pad, n_pad) SPD array and `l` the
    lower-triangular factor (upper triangle zeroed).
    """
    if n_pad % tile != 0:
        raise ValueError(f"n_pad {n_pad} not a multiple of tile {tile}")
    g = n_pad // tile
    steps = g - truncate
    if precision is None:
        precision = default_precision(dtype)

    def chol(a):
        eye = jnp.eye(tile, dtype=dtype)
        for k in range(steps):
            r0 = k * tile
            r1 = (k + 1) * tile
            akk = lax.dynamic_slice(a, (r0, r0), (tile, tile))
            lkk = lax.linalg.cholesky(akk, symmetrize_input=False)
            a = _dus(a, lkk, r0, r0)
            rem = n_pad - r1
            if rem == 0:
                continue
            # panel: X @ Lkk^T = A[r1:, r0:r1]
            pan = lax.dynamic_slice(a, (r1, r0), (rem, tile))
            if inv_panel:
                w = lax.linalg.triangular_solve(lkk, eye, left_side=True, lower=True)
                pan = _matmul(pan, w, tb=True, precision=precision, pallas=pallas)
            else:
                pan = lax.linalg.triangular_solve(
                    lkk, pan, left_side=False, lower=True, transpose_a=True
                )
            a = _dus(a, pan.astype(a.dtype), r1, r0)
            a = _syrk_tril(a, pan, r1, r1, rem, syrk_depth, tile,
                           precision, pallas, leaf_rows)
        return jnp.tril(a) if truncate == 0 else a

    return chol


@functools.lru_cache(maxsize=32)
def _jitted_cholesky(n_pad, tile, truncate, syrk_depth, leaf_rows,
                     inv_panel, precision, dtype):
    fn = fused_cholesky_fn(
        n_pad, tile, truncate=truncate, syrk_depth=syrk_depth,
        leaf_rows=leaf_rows, inv_panel=inv_panel,
        precision=precision, dtype=dtype,
    )
    return jax.jit(fn, donate_argnums=(0,))


def fused_cholesky(a: jax.Array, tile: int, *, truncate: int = 0,
                   syrk_depth: int = 3, leaf_rows: int = 2048,
                   inv_panel: bool = True, precision=None) -> jax.Array:
    """One-call fused Cholesky on a flat padded array (donates its input)."""
    if precision is None:
        precision = default_precision(a.dtype)
    fn = _jitted_cholesky(a.shape[0], tile, truncate, syrk_depth, leaf_rows,
                          inv_panel, precision, a.dtype)
    return fn(a)


# ---------------------------------------------------------------------------
# GEMM
# ---------------------------------------------------------------------------

def fused_gemm(a: jax.Array, b: jax.Array, *, precision=None) -> jax.Array:
    if precision is None:
        precision = default_precision(a.dtype)
    return _matmul(a, b, precision=precision)


# ---------------------------------------------------------------------------
# TSQR
# ---------------------------------------------------------------------------

def fused_tsqr_fn(n_leaves: int, tile_rows: int, b: int, *,
                  compute_q: bool = False, precision=None, dtype=jnp.float32):
    """Jittable TSQR over the (n_leaves*tile_rows, b) flat array.

    Leaf QRs batched (vmapped geqrf onto the MXU), then a static halving
    tree: at level l the live R stack (m, b, b) pairs up into floor(m/2)
    stacked (2b, b) QRs, batched again — exactly the DSL `reducer` tree
    (algs.tsqr) with the whole level fused into one batched kernel.

    Returns fn(a) -> R  (or (Q, R) when compute_q; Q reconstructed by the
    downward sweep of the combine factors, algs.tsqr_q).
    """
    if precision is None:
        precision = default_precision(dtype)

    def tsqr(a):
        stack = a.reshape(n_leaves, tile_rows, b)
        q0, r = jnp.linalg.qr(stack, mode="reduced")  # batched leaf QR
        # combine tree, static halving with odd pass-through
        levels = []  # (q_top, q_bot, had_odd) per level, for Q reconstruction
        m = n_leaves
        while m > 1:
            pairs = m // 2
            odd = m - 2 * pairs
            top = r[0 : 2 * pairs : 2]
            bot = r[1 : 2 * pairs : 2]
            stacked = jnp.concatenate([top, bot], axis=1)  # (pairs, 2b, b)
            q, r2 = jnp.linalg.qr(stacked, mode="reduced")
            qt, qb = q[:, :b, :], q[:, b:, :]
            if odd:
                r2 = jnp.concatenate([r2, r[2 * pairs :]], axis=0)
            levels.append((qt, qb, odd))
            r = r2
            m = pairs + odd
        r_final = r[0]
        if not compute_q:
            return r_final
        # downward sweep: Z maps each leaf's local basis to the global one
        z = jnp.eye(b, dtype=a.dtype)[None]  # (1, b, b)
        for qt, qb, odd in reversed(levels):
            pairs = qt.shape[0]
            z_pairs = z[:pairs]
            z_top = jnp.matmul(qt, z_pairs, precision=precision)
            z_bot = jnp.matmul(qb, z_pairs, precision=precision)
            inter = jnp.stack([z_top, z_bot], axis=1).reshape(2 * pairs, b, b)
            z = jnp.concatenate([inter, z[pairs:]], axis=0) if odd else inter
        q_full = jnp.matmul(q0, z, precision=precision)  # (leaves, rows, b)
        return q_full.reshape(n_leaves * tile_rows, b), r_final

    return tsqr


@functools.lru_cache(maxsize=32)
def _jitted_tsqr(n_leaves, tile_rows, b, compute_q, precision, dtype):
    return jax.jit(
        fused_tsqr_fn(n_leaves, tile_rows, b, compute_q=compute_q,
                      precision=precision, dtype=dtype)
    )


def fused_tsqr(a: jax.Array, tile_rows: int, *, compute_q: bool = False,
               precision=None):
    m, b = a.shape
    if m % tile_rows != 0:
        raise ValueError(f"rows {m} not a multiple of tile_rows {tile_rows}")
    if precision is None:
        precision = default_precision(a.dtype)
    fn = _jitted_tsqr(m // tile_rows, tile_rows, b, compute_q, precision, a.dtype)
    return fn(a)


# ---------------------------------------------------------------------------
# Program-level dispatch
# ---------------------------------------------------------------------------

def lower_fused(program) -> Optional[Callable[[], None]]:
    """Return a no-arg callable running `program` through its fused lowering,
    committing results into the bound TiledMatrices; None when the program's
    template has no fused specialization."""
    name = program.dag.template.name
    if name == "cholesky":
        return lambda: _run_fused_cholesky(program)
    if name == "gemm":
        return lambda: _run_fused_gemm(program)
    if name in ("tsqr", "tsqr_q"):
        return lambda: _run_fused_tsqr(program, compute_q=(name == "tsqr_q"))
    return None


def _hbm(program, name):
    ba = program.matrices[name]
    if ba.matrix.storage != "hbm":
        ba.matrix = ba.matrix.to_hbm()
    return ba.matrix


def _run_fused_cholesky(program):
    s = _hbm(program, "S")
    o = _hbm(program, "O")
    truncate = program.consts.get("truncate", 0)
    l = fused_cholesky(s.array, s.tile[0], truncate=truncate)
    if truncate == 0:
        o.replace_array(l)
        s.free()
    else:
        # prefix run: factored panels land in O, trailing matrix stays in S
        g = s.grid[0]
        k_done = g - truncate
        n_done = k_done * s.tile[0]
        mask_cols = jnp.arange(l.shape[1]) < n_done
        o.replace_array(jnp.where(mask_cols[None, :], jnp.tril(l), 0.0).astype(l.dtype))
        s.replace_array(jnp.where(mask_cols[None, :], 0.0, l).astype(l.dtype))


def _run_fused_gemm(program):
    a = _hbm(program, "A")
    b = _hbm(program, "B")
    c = _hbm(program, "C")
    c.replace_array(fused_gemm(a.array, b.array).astype(c.dtype))


def _run_fused_tsqr(program, compute_q: bool):
    a = _hbm(program, "A")
    r_mat = _hbm(program, "R")
    n_leaves = program.consts["N"]
    depth = program.consts["L"]
    tile_rows = a.tile[0]
    b = a.tile[1]
    arr = a.array[: n_leaves * tile_rows, :b]
    if compute_q:
        q_arr, r_final = fused_tsqr(arr, tile_rows, compute_q=True)
        q_mat = _hbm(program, "Q")
        pad = jnp.zeros(q_mat.padded_shape, q_mat.dtype)
        q_mat.replace_array(lax.dynamic_update_slice(pad, q_arr.astype(q_mat.dtype), (0, 0)))
    else:
        r_final = fused_tsqr(arr, tile_rows, compute_q=False)
    # final R lives at block (0, depth) of the R matrix (algs.tsqr layout)
    r_mat.put_block(r_final.astype(r_mat.dtype), 0, depth)
