"""Kernel dispatch: name -> device implementation.

Executors look kernels up by name so the same compiled tiled program can run
on the LocalExecutor (numpy reference kernels, kernels.KERNELS) or on any
JAX executor (these). Signatures match kernels.py exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from numpywren_tpu.ops import factor
from numpywren_tpu.ops.gemm import gemm, gemm_acc, gemm_nt, gemm_tn, syrk_update


def _add(a, b):
    return a + b


def _sub(a, b):
    return a - b


def _identity(a):
    return jnp.eye(a.shape[0], a.shape[1], dtype=a.dtype)


def _copy(a):
    return a


def _transpose(a):
    return a.T


JAX_KERNELS = {
    "potrf": factor.potrf,
    "trsm": factor.trsm,
    "syrk": syrk_update,
    "gemm": gemm,
    "gemm_nt": gemm_nt,
    "gemm_tn": gemm_tn,
    "gemm_acc": gemm_acc,
    "add": _add,
    "sub": _sub,
    "identity": _identity,
    "copy": _copy,
    "transpose": _transpose,
    "qr_leaf": factor.qr_leaf,
    "qr_combine": factor.qr_combine,
    "qr_r": factor.qr_r,
    "lq_leaf": factor.lq_leaf,
    "small_qr_apply": factor.small_qr_apply,
    "qr_factor2": factor.qr_factor2,
    "qr_apply2": factor.qr_apply2,
    "lq_factor2": factor.lq_factor2,
    "lq_apply2": factor.lq_apply2,
}
# k-ary reducer combine family (same arities as the numpy registry)
from numpywren_tpu.kernels import MAX_REDUCER_ARITY  # noqa: E402

JAX_KERNELS.update({
    f"qr_combine_r{m}": factor._make_qr_combine_r(m)
    for m in range(2, MAX_REDUCER_ARITY + 1)
})


def jax_kernel(name: str):
    return JAX_KERNELS[name]
