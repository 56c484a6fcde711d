"""Pallas MXU matmul family: the hot op of every blocked algorithm.

The reference's gemm/syrk tiles go to BLAS (numpywren/kernels.py::gemm/syrk).
Here one Pallas kernel covers the whole family —

    out = alpha * op(A) @ op(B) + beta * C

with the transposes folded into dot_general dimension numbers (no data
movement) and the epilogue (scale + accumulate-into-C) fused into the last
K-step, so the trailing-update `S - L L^T` of Cholesky is a single kernel
with no extra HBM round trip.

Grid: (M/bm, N/bn, K/bk) with K sequential ("arbitrary") and a VMEM fp32
accumulator that lives across K-steps — the canonical MXU pipeline shape.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from numpywren_tpu.ops.common import default_precision, interpret_default, pick_block


def _mm_kernel(ta, tb, alpha, beta, has_c, nk, precision, out_dtype):
    contract = (((0,) if ta else (1,)), ((1,) if tb else (0,)))
    dimension_numbers = ((contract[0], contract[1]), ((), ()))

    def kernel(*refs):
        if has_c:
            a_ref, b_ref, c_ref, o_ref, acc_ref = refs
        else:
            a_ref, b_ref, o_ref, acc_ref = refs
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            a_ref[:],
            b_ref[:],
            dimension_numbers=dimension_numbers,
            preferred_element_type=jnp.float32,
            precision=precision,
        )

        @pl.when(k == nk - 1)
        def _epilogue():
            acc = acc_ref[:] * alpha
            if has_c:
                acc = acc + beta * c_ref[:].astype(jnp.float32)
            o_ref[:] = acc.astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "ta", "tb", "alpha", "beta", "out_dtype", "bm", "bn", "bk", "precision", "interpret",
    ),
)
def matmul(
    a: jax.Array,
    b: jax.Array,
    c: Optional[jax.Array] = None,
    *,
    ta: bool = False,
    tb: bool = False,
    alpha: float = 1.0,
    beta: float = 1.0,
    out_dtype=None,
    bm: int = 512,
    bn: int = 512,
    bk: int = 512,
    precision=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """alpha * op(a) @ op(b) + beta * c on the MXU (see module docstring).

    Shapes must be multiples of the chosen blocks; TiledMatrix padding
    guarantees that for tile-aligned operands.
    """
    m = a.shape[1] if ta else a.shape[0]
    ka = a.shape[0] if ta else a.shape[1]
    kb = b.shape[1] if tb else b.shape[0]
    n = b.shape[0] if tb else b.shape[1]
    if ka != kb:
        raise ValueError(f"contraction mismatch: {a.shape} (ta={ta}) vs {b.shape} (tb={tb})")
    k = ka
    out_dtype = jnp.dtype(out_dtype or a.dtype)
    if precision is None:
        precision = default_precision(a.dtype)
    if precision == jax.lax.Precision.HIGH:
        # Mosaic dots only accept DEFAULT/HIGHEST. Upgrading to HIGHEST
        # would run 6-pass bf16x6 (~2x slower than the intended 3-pass), so
        # route HIGH through XLA's dot instead, with the epilogue left to
        # XLA fusion — same policy as compiler/lower.py::_matmul. (The
        # bf16x3 *compensated* Pallas path lives in ops/gemm3.py.)
        lhs = jnp.swapaxes(a, 0, 1) if ta else a
        rhs = jnp.swapaxes(b, 0, 1) if tb else b
        acc = jax.lax.dot_general(
            lhs,
            rhs,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGH,
        )
        acc = acc * alpha
        if c is not None:
            acc = acc + beta * c.astype(jnp.float32)
        return acc.astype(out_dtype)
    if interpret is None:
        interpret = interpret_default()

    bm = pick_block(m, bm)
    bn = pick_block(n, bn)
    bk = pick_block(k, bk)
    gm, gn, gk = m // bm, n // bn, k // bk

    a_spec = pl.BlockSpec(
        (bk, bm) if ta else (bm, bk),
        (lambda i, j, kk: (kk, i)) if ta else (lambda i, j, kk: (i, kk)),
    )
    b_spec = pl.BlockSpec(
        (bn, bk) if tb else (bk, bn),
        (lambda i, j, kk: (j, kk)) if tb else (lambda i, j, kk: (kk, j)),
    )
    io_spec = pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j))

    has_c = c is not None
    in_specs = [a_spec, b_spec] + ([io_spec] if has_c else [])
    operands = (a, b, c) if has_c else (a, b)

    kernel = _mm_kernel(ta, tb, alpha, beta, has_c, gk, precision, out_dtype)
    flops = 2 * m * n * k
    bytes_accessed = (m * k + k * n + m * n * (2 if has_c else 1)) * jnp.dtype(a.dtype).itemsize

    return pl.pallas_call(
        kernel,
        grid=(gm, gn, gk),
        in_specs=in_specs,
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(*operands)


# ---------------------------------------------------------------------------
# The kernel-registry entry points (signatures match kernels.py references)
# ---------------------------------------------------------------------------

def gemm(a, b, **kw):
    return matmul(a, b, **kw)


def gemm_nt(a, b, **kw):
    return matmul(a, b, tb=True, **kw)


def gemm_tn(a, b, **kw):
    return matmul(a, b, ta=True, **kw)


def gemm_acc(c, a, b, **kw):
    """c + a @ b (accumulating statement of blocked GEMM)."""
    return matmul(a, b, c, **kw)


def syrk_update(s, x, y, **kw):
    """s - x @ y^T — the Cholesky trailing update, one fused kernel."""
    return matmul(x, y, s, tb=True, alpha=-1.0, beta=1.0, **kw)
