"""Shared helpers for the Pallas kernel layer."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.lru_cache(maxsize=None)
def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def interpret_default() -> bool:
    """Pallas TPU kernels only compile on TPU; on the CPU test backend (the
    8-virtual-device 'fake cluster', SURVEY §4 lesson) run them interpreted."""
    return not on_tpu()


def pick_block(dim: int, want: int, align: int = 128) -> int:
    """Largest block <= want that divides dim AND is a multiple of `align`
    (the Mosaic lane constraint: block dims must be 128-multiples or equal
    the full array dim). Falls back to the full dim when no aligned divisor
    exists — correct, just less pipelined."""
    if dim <= want:
        return dim
    for b in range(want - want % align, 0, -align):
        if dim % b == 0:
            return b
    return dim


def default_precision(dtype) -> jax.lax.Precision:
    """fp32 inputs default to HIGHEST (bf16x6 passes on the MXU) so residuals
    match LAPACK-at-fp32; bf16 inputs use default single-pass."""
    if jnp.dtype(dtype) == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT
