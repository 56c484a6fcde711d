"""Mesh-sharded flagship algorithms (config #4 of BASELINE.json: multi-chip
Cholesky with ICI panel broadcast + update reduce).

Design: the flat padded TiledMatrix array is laid out with a 2-D
NamedSharding over the (rows, cols) mesh and the SAME fused static schedule
(compiler.lower) is jitted with in/out shardings. XLA GSPMD then partitions
every step of the schedule: the panel trsm's L_kk broadcast rides the mesh's
row axis, the trailing syrk partials reduce along the contraction — exactly
the collectives the SURVEY §2 backend table calls for, inserted by the
compiler instead of hand-written ppermute chains. (The reference gets the
same data movement by every Lambda reading panel blocks from S3 —
numpywren/binops.py, job_runner.py.)

The Pallas tile kernel is bypassed here (plain XLA dots) because GSPMD
cannot partition an opaque pallas_call; the shard_map fabric
(parallel/fabric.py) is the hand-scheduled alternative that keeps the
Pallas/compensated kernels (summa_syrk, cholesky_2d, bdfac_2d).

There is deliberately NO GSPMD bdfac here: the two-sided sweep's panel
chains (small Grams, replicated b x b algebra, data-dependent extras
passes) give GSPMD's propagation nothing good to work with — it either
replicates the whole iterate or all-gathers per panel. The distributed
BDFAC lives in the fabric (bdfac_1d / bdfac_2d), where the collective
schedule is written down explicitly.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from numpywren_tpu.compiler.lower import fused_cholesky_fn, fused_tsqr_fn
from numpywren_tpu.ops.common import default_precision
from numpywren_tpu.parallel.mesh import make_mesh, tile_sharding


def _put(a, sharding) -> jax.Array:
    return jax.device_put(a if isinstance(a, jax.Array) else np.asarray(a), sharding)


# ---------------------------------------------------------------------------
# Cholesky
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _sharded_chol_fn(n_pad: int, tile: int, truncate: int, syrk_depth: int,
                     precision, dtype, mesh: Mesh):
    fn = fused_cholesky_fn(
        n_pad, tile, truncate=truncate, syrk_depth=syrk_depth,
        precision=precision, dtype=dtype, pallas=False,
    )
    sh = tile_sharding(mesh)
    return jax.jit(fn, in_shardings=sh, out_shardings=sh, donate_argnums=(0,))


def sharded_cholesky(a, tile: int, mesh: Optional[Mesh] = None, *,
                     truncate: int = 0, syrk_depth: int = 3,
                     precision=None) -> jax.Array:
    """Blocked Cholesky of a flat padded (n, n) array sharded over `mesh`.

    Returns the lower factor with the same 2-D sharding. The input array is
    donated (factorization is in-place, LAPACK potrf-style).
    """
    mesh = mesh or make_mesh()
    a = _put(a, tile_sharding(mesh))
    if precision is None:
        precision = default_precision(a.dtype)
    fn = _sharded_chol_fn(a.shape[0], tile, truncate, syrk_depth,
                          precision, a.dtype, mesh)
    return fn(a)


# ---------------------------------------------------------------------------
# GEMM
# ---------------------------------------------------------------------------

def sharded_gemm(a, b, mesh: Optional[Mesh] = None, *, precision=None) -> jax.Array:
    """C = A @ B with A row-sharded, B col-sharded, C 2-D sharded: the
    stationary layout where each device computes its C block from a row
    panel of A and a column panel of B (the SUMMA outer product without
    k-stepping; GSPMD inserts the gathers along ICI)."""
    mesh = mesh or make_mesh()
    rows, cols = mesh.axis_names
    a = _put(a, NamedSharding(mesh, P(rows, None)))
    b = _put(b, NamedSharding(mesh, P(None, cols)))
    if precision is None:
        precision = default_precision(a.dtype)
    out_sh = NamedSharding(mesh, P(rows, cols))

    @functools.partial(jax.jit, out_shardings=out_sh)
    def mm(a, b):
        return jnp.matmul(a, b, precision=precision)

    return mm(a, b)


# ---------------------------------------------------------------------------
# TSQR
# ---------------------------------------------------------------------------

def sharded_tsqr(a, tile_rows: int, mesh: Optional[Mesh] = None, *,
                 compute_q: bool = False, precision=None):
    """TSQR over the tall axis: row blocks (leaves) sharded across ALL mesh
    devices; the combine tree's pairwise QRs reduce across the mesh in
    log2(leaves) rounds (the reference's `reducer` tree, algs.tsqr, with ICI
    instead of S3 between rounds)."""
    mesh = mesh or make_mesh()
    rows, cols = mesh.axis_names
    m, b = a.shape
    if m % tile_rows:
        raise ValueError(f"rows {m} not a multiple of tile_rows {tile_rows}")
    if precision is None:
        precision = default_precision(jnp.asarray(a).dtype)
    # shard the tall axis over the whole mesh (flattened) when possible,
    # else over mesh rows only
    n_leaves = m // tile_rows
    a = _put(a, NamedSharding(mesh, P((rows, cols) if n_leaves % mesh.size == 0 else rows, None)))
    fn = fused_tsqr_fn(n_leaves, tile_rows, b, compute_q=compute_q,
                       precision=precision, dtype=a.dtype)
    return jax.jit(fn)(a)
