"""bf16x3 Pallas matmul: fp32-parity GEMM at 3-pass-bf16 speed, in Mosaic.

Mosaic's dot only accepts DEFAULT (one bf16 pass, ~1.7e-3 error) or HIGHEST
(six passes). XLA's HIGH (three passes, ~1.2e-5 — LAPACK-fp32 parity, the
framework's flagship precision) has no Pallas equivalent, so this kernel
builds it from first principles: split each fp32 operand into
bf16 hi + bf16 lo residual (x = hi + lo exactly captures ~16 extra mantissa
bits), then

    a @ b  ~=  hi_a @ hi_b + hi_a @ lo_b + lo_a @ hi_b

with an fp32 VMEM accumulator across the K grid (the lo_a @ lo_b term is
below fp32 epsilon). The epilogue optionally computes  c - a @ b  in the
same kernel — the Cholesky trailing update's subtract rides along for free
instead of costing XLA a separate pass.

The splits are computed INSIDE the kernel per block (VPU work fully
overlapped with the MXU), so HBM traffic equals a plain fp32 matmul.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from numpywren_tpu.ops.common import interpret_default, pick_block


def _split(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _kernel(tb, nk, has_c, out_dtype):
    contract = ((1,), (1,) if tb else (0,))
    dims = ((contract[0], contract[1]), ((), ()))

    def dot(a, b):
        return jax.lax.dot_general(a, b, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)

    def kernel(*refs):
        if has_c:
            a_ref, b_ref, c_ref, o_ref, acc_ref = refs
        else:
            a_ref, b_ref, o_ref, acc_ref = refs
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        a_hi, a_lo = _split(a_ref[:])
        b_hi, b_lo = _split(b_ref[:])
        acc_ref[:] += dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)

        @pl.when(k == nk - 1)
        def _epilogue():
            acc = acc_ref[:]
            if has_c:
                acc = c_ref[:].astype(jnp.float32) - acc
            o_ref[:] = acc.astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("tb", "bm", "bn", "bk", "interpret"),
)
def matmul3(
    a: jax.Array,
    b: jax.Array,
    c: Optional[jax.Array] = None,
    *,
    tb: bool = False,
    bm: int = 512,
    bn: int = 512,
    bk: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """a @ op(b) at bf16x3 (fp32-parity) precision; with `c`, computes
    c - a @ op(b) (the syrk trailing-update epilogue) in the same kernel."""
    m, k = a.shape
    n = b.shape[0] if tb else b.shape[1]
    kb = b.shape[1] if tb else b.shape[0]
    if k != kb:
        raise ValueError(f"contraction mismatch: {a.shape} vs {b.shape} (tb={tb})")
    if interpret is None:
        interpret = interpret_default()
    if interpret:
        # CPU test backend: plain fp32 matmul is exact enough
        out = jnp.matmul(a, b.T if tb else b)
        return (c - out) if c is not None else out

    bm = pick_block(m, bm)
    bn = pick_block(n, bn)
    bk = pick_block(k, bk)
    gm, gn, gk = m // bm, n // bn, k // bk

    a_spec = pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk))
    b_spec = pl.BlockSpec(
        (bn, bk) if tb else (bk, bn),
        (lambda i, j, kk: (j, kk)) if tb else (lambda i, j, kk: (kk, j)),
    )
    io_spec = pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j))
    has_c = c is not None
    in_specs = [a_spec, b_spec] + ([io_spec] if has_c else [])
    operands = (a, b, c) if has_c else (a, b)

    flops = 3 * 2 * m * n * k
    bytes_accessed = (m * k + k * n + m * n * (2 if has_c else 1)) * 4

    return pl.pallas_call(
        _kernel(tb, gk, has_c, jnp.float32),
        grid=(gm, gn, gk),
        in_specs=in_specs,
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(*operands)
