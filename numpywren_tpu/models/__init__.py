"""Model families of this framework = the blocked linear-algebra algorithms.

numpywren has no neural models; its "model zoo" is the algorithm library
(reference: numpywren/algs.py + alg_wrappers.py — SURVEY §2). This package
groups the user-facing families in one place:

- cholesky: SPD factorization A = L L^T (flagship)
- gemm:     C = A @ B
- tsqr:     tall-skinny QR (tree or CholeskyQR2)
- bdfac:    block bidiagonalization (SVD precursor)

Each returns (program, output_matrix/es, meta); run with
numpywren_tpu.run_program. The DSL sources live in numpywren_tpu.algs; the
fused device lowerings in numpywren_tpu.compiler.lower.
"""

from numpywren_tpu.alg_wrappers import bdfac, cholesky, gemm, tsqr, tsqr_r_factor

__all__ = ["cholesky", "gemm", "tsqr", "bdfac", "tsqr_r_factor"]
