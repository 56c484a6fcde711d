"""TPU tile kernels (the rebuild's "native" compute layer).

The reference delegates its per-tile compute to BLAS/LAPACK through
numpy/scipy (numpywren/kernels.py — the only native code it touches, per
SURVEY §2). The TPU-native equivalent is this package: Pallas/Mosaic kernels
targeting the MXU for the gemm-shaped hot ops, plus XLA-native linalg
(cholesky / triangular_solve / qr — themselves blocked MXU code inside XLA)
for the small sequential cores, with a dispatch table so executors are
backend-agnostic.
"""

from numpywren_tpu.ops.gemm import matmul, gemm, gemm_nt, gemm_tn, gemm_acc, syrk_update
from numpywren_tpu.ops.factor import potrf, trsm, qr_leaf, qr_combine, qr_r, lq_leaf, small_qr_apply
from numpywren_tpu.ops.pallas_factor import potrf_pallas, trsm_pallas, trtri_pallas
from numpywren_tpu.ops.dispatch import JAX_KERNELS, jax_kernel

__all__ = [
    "matmul",
    "gemm",
    "gemm_nt",
    "gemm_tn",
    "gemm_acc",
    "syrk_update",
    "potrf",
    "potrf_pallas",
    "trsm",
    "trsm_pallas",
    "trtri_pallas",
    "qr_leaf",
    "qr_combine",
    "qr_r",
    "lq_leaf",
    "small_qr_apply",
    "JAX_KERNELS",
    "jax_kernel",
]
