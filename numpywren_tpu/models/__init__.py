"""Model families of this framework = the blocked linear-algebra algorithms.

numpywren has no neural models; its "model zoo" is the algorithm library
(reference: numpywren/algs.py + alg_wrappers.py — SURVEY §2). This package
groups the user-facing families in one place:

- cholesky: SPD factorization A = L L^T (flagship)
- gemm:     C = A @ B
- tsqr:     tall-skinny QR (tree, CholeskyQR2, shifted CholeskyQR3)
- bdfac:    block bidiagonalization (SVD stage 1)

Each returns (program, output_matrix/es, meta); run with
numpywren_tpu.run_program. The DSL sources live in numpywren_tpu.algs; the
fused device lowerings in numpywren_tpu.compiler.lower.

On top of the factorizations, finished end-user models (beyond the
reference, which stops at the precursors):

- svd.singular_values:  two-stage sigma(A) — MXU BDFAC + banded GK finish
                        (accepts TiledMatrix inputs: runs the bdfac program
                        through the executor stack and reads only the
                        diag/superdiag blocks — sigma of matrices that
                        never materialize as one dense square)
- svd.svd:              FULL SVD (U, s, Vt) — BDFAC with transform
                        accumulation on the MXU + a host fp64 SVD of the
                        block-bidiagonal core
- jacobi.svd_jacobi:    FULL SVD entirely on device (one-sided block
                        Jacobi: batched pair Grams + batched small eighs
                        + GEMM rotations) — the with-vectors path at
                        n >= 8192 where the host finish is infeasible;
                        also svd(method="jacobi")
- jacobi.svd_refine:    Ogita-Aishima-style iterative refinement of ANY
                        thin SVD factors (five GEMMs/step, quadratic
                        contraction; runs inside svd_jacobi by default)
- svd.svd_tall:         thin SVD of tall-skinny matrices (GEMM-only QR)
- svd.randomized_svd:   rank-k truncated SVD (HMT sketch + power iteration)
- lstsq.least_squares:  tall least squares (CholeskyQR or normal equations)
- lstsq.ridge_regression: Tikhonov-regularized solve
- pca.pca:              principal components (the paper's headline workload)
"""

from numpywren_tpu.alg_wrappers import bdfac, cholesky, gemm, tsqr, tsqr_r_factor
from numpywren_tpu.models.jacobi import svd_jacobi, svd_refine
from numpywren_tpu.models.lstsq import least_squares, ridge_regression
from numpywren_tpu.models.pca import pca
from numpywren_tpu.models.svd import (
    randomized_svd,
    singular_values,
    svd,
    svd_tall,
)

__all__ = [
    "cholesky", "gemm", "tsqr", "bdfac", "tsqr_r_factor",
    "singular_values", "svd", "svd_jacobi", "svd_refine", "svd_tall",
    "randomized_svd", "least_squares", "ridge_regression", "pca",
]
