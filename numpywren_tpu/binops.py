"""Blockwise binary ops — the pre-DSL path (analog of numpywren/binops.py).

The reference submits blockwise map/reduce jobs through a pywren executor:
``gemm(pwex, A, B)`` maps ``block_matmul`` over (i, j, chunked-k) triples,
each Lambda summing partial products from S3 blocks, then reduces. The TPU
inversion keeps the same two-level API:

- ``BlockExecutor`` stands in for the pywren executor (``pwex``): a thread
  pool with a futures-style ``map``/``wait`` (the reference's local/dummy
  executor is the de-facto fake backend its tests use — SURVEY §4.2).
- For HBM-resident operands the blockwise path collapses to ONE fused MXU
  op on the flat padded arrays (no per-block traffic at all): this is the
  whole point of keeping tiles contiguous in one jax.Array.
- For host-tier operands the blockwise map/reduce runs for real, block by
  block, through the executor — the out-of-HBM path.

Output keys use generate_key_name_binop, matching the reference's
deterministic output-naming scheme (numpywren/matrix_utils.py).
"""

from __future__ import annotations

import concurrent.futures
from typing import Callable, List, Optional, Sequence

import numpy as np

from numpywren_tpu.exceptions import ShapeError
from numpywren_tpu.tiled import TiledMatrix, _TiledBase
from numpywren_tpu.utils import chunk, generate_key_name_binop, generate_key_name_uop


class BlockExecutor:
    """Thread-pool stand-in for the reference's pywren executor.

    ``map(fn, args)`` returns futures; ``wait(futures)`` blocks (the
    reference uses pywren.wait). num_workers mirrors Lambda fan-out width.
    """

    def __init__(self, num_workers: int = 8):
        self.num_workers = num_workers
        self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=num_workers)

    def map(self, fn: Callable, args: Sequence) -> List[concurrent.futures.Future]:
        return [self._pool.submit(fn, a) for a in args]

    @staticmethod
    def wait(futures: Sequence[concurrent.futures.Future]):
        done, not_done = concurrent.futures.wait(futures)
        for f in done:
            f.result()  # re-raise worker exceptions
        return done, not_done

    def shutdown(self):
        self._pool.shutdown(wait=True)


def default_executor(num_workers: int = 8) -> BlockExecutor:
    """Analog of pywren.default_executor()."""
    return BlockExecutor(num_workers=num_workers)


def _both_hbm(*mats: _TiledBase) -> bool:
    return all(getattr(m, "storage", None) == "hbm" for m in mats)


# ---------------------------------------------------------------------------
# GEMM
# ---------------------------------------------------------------------------

def gemm(
    pwex: Optional[BlockExecutor],
    a: _TiledBase,
    b: _TiledBase,
    tasks_per_job: int = 1,
    out_key: Optional[str] = None,
    storage: Optional[str] = None,
) -> TiledMatrix:
    """C = A @ B, blockwise (reference binops.gemm(pwex, A, B, tasks_per_job)).

    HBM fast path: one fused Pallas matmul over the flat padded arrays.
    Host path: map (i, j) output blocks over the executor; each task sums
    its full k-range locally (the reference chunks k across jobs and adds a
    reduce stage; with in-process memory the serial k-sum per (i, j) is
    strictly better, so tasks_per_job only batches (i, j) pairs per task).
    """
    if a.shape[1] != b.shape[0]:
        raise ShapeError(f"gemm shape mismatch: {a.shape} @ {b.shape}")
    if a.tile[1] != b.tile[0]:
        raise ShapeError(f"gemm tile mismatch: {a.tile} vs {b.tile}")
    key = out_key or generate_key_name_binop(a.key, b.key, "gemm")
    c_shape = (a.shape[0], b.shape[1])
    c_tile = (a.tile[0], b.tile[1])

    if storage is None:
        storage = "hbm" if _both_hbm(a, b) else "host"

    if storage == "hbm" and _both_hbm(a, b):
        from numpywren_tpu.ops.gemm import matmul

        c = TiledMatrix(key=key, shape=c_shape, tile=c_tile, dtype=a.dtype, storage="hbm", fill=None)
        c.replace_array(matmul(a.array, b.array))
        return c

    c = TiledMatrix(key=key, shape=c_shape, tile=c_tile, dtype=a.dtype, storage="host")
    gm = a.grid[0]
    gn = b.grid[1]
    gk = a.grid[1]

    def block_matmul(pairs):
        for (i, j) in pairs:
            acc = None
            for k in range(gk):
                p = np.asarray(a.get_block(i, k), dtype=np.float64) @ np.asarray(
                    b.get_block(k, j), dtype=np.float64
                )
                acc = p if acc is None else acc + p
            c.put_block(acc.astype(c.dtype), i, j)

    pairs = [(i, j) for i in range(gm) for j in range(gn)]
    own_pwex = pwex is None
    pwex = pwex or default_executor()
    try:
        futures = pwex.map(block_matmul, list(chunk(pairs, max(1, tasks_per_job))))
        BlockExecutor.wait(futures)
    finally:
        if own_pwex:
            pwex.shutdown()
    return c


# ---------------------------------------------------------------------------
# Elementwise binary / unary ops
# ---------------------------------------------------------------------------

def _elemwise_binop(pwex, a, b, np_op, jnp_op, name: str, out_key=None) -> TiledMatrix:
    if a.shape != b.shape or a.tile != b.tile:
        raise ShapeError(f"{name}: operands must match, got {a.shape}/{a.tile} vs {b.shape}/{b.tile}")
    key = out_key or generate_key_name_binop(a.key, b.key, name)

    if _both_hbm(a, b):
        c = TiledMatrix(key=key, shape=a.shape, tile=a.tile, dtype=a.dtype, storage="hbm", fill=None)
        c.replace_array(jnp_op(a.array, b.array))
        return c

    c = TiledMatrix(key=key, shape=a.shape, tile=a.tile, dtype=a.dtype, storage="host")

    def task(idxs):
        for (i, j) in idxs:
            c.put_block(
                np_op(np.asarray(a.get_block(i, j)), np.asarray(b.get_block(i, j))).astype(c.dtype),
                i,
                j,
            )

    own_pwex = pwex is None
    pwex = pwex or default_executor()
    try:
        futures = pwex.map(task, list(chunk(a.block_idxs, 8)))
        BlockExecutor.wait(futures)
    finally:
        if own_pwex:
            pwex.shutdown()
    return c


def add(pwex, a, b, **kw) -> TiledMatrix:
    import jax.numpy as jnp

    return _elemwise_binop(pwex, a, b, np.add, jnp.add, "add", **kw)


def sub(pwex, a, b, **kw) -> TiledMatrix:
    import jax.numpy as jnp

    return _elemwise_binop(pwex, a, b, np.subtract, jnp.subtract, "sub", **kw)


def elemwise_uop(pwex, a, np_op, jnp_op=None, name: str = "uop", out_key=None) -> TiledMatrix:
    """Apply an elementwise unary function blockwise (reference uops)."""
    key = out_key or generate_key_name_uop(a.key, name)
    if _both_hbm(a) and jnp_op is not None:
        c = TiledMatrix(key=key, shape=a.shape, tile=a.tile, dtype=a.dtype, storage="hbm", fill=None)
        c.replace_array(jnp_op(a.array))
        return c
    c = TiledMatrix(key=key, shape=a.shape, tile=a.tile, dtype=a.dtype, storage="host")

    def task(idxs):
        for (i, j) in idxs:
            c.put_block(np_op(np.asarray(a.get_block(i, j))).astype(c.dtype), i, j)

    own_pwex = pwex is None
    pwex = pwex or default_executor()
    try:
        futures = pwex.map(task, list(chunk(a.block_idxs, 8)))
        BlockExecutor.wait(futures)
    finally:
        if own_pwex:
            pwex.shutdown()
    return c
