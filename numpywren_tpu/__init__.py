"""numpywren-tpu: a TPU-native blocked dense linear algebra framework.

A ground-up rebuild of the capabilities of numpywren ("Serverless Linear
Algebra", arXiv:1810.09679) for TPU hardware:

- ``TiledMatrix`` replaces the S3-backed ``BigMatrix`` block store
  (reference: numpywren/matrix.py) with mesh-shardable, HBM-resident tiled
  arrays plus a host-RAM spill tier.
- The LambdaPACK DSL + on-demand sympy dependency solver (reference:
  numpywren/frontend.py, lambdapack.py) becomes a *static schedule compiler*:
  the same restricted affine-loop DSL is analyzed at compile time and lowered
  to wavefront steps of fused Pallas tile kernels stitched by XLA SPMD.
- The SQS/Redis/Lambda dynamic task runtime (reference:
  numpywren/job_runner.py) is replaced by in-process executors: a local
  (numpy, threaded, fault-injectable) executor with the same node state
  machine, and JAX executors that keep all tiles in HBM and use ICI
  collectives instead of S3 traffic.

Public API mirrors the reference's alg_wrappers one-liners:
``cholesky``, ``gemm``, ``tsqr``, ``bdfac``.
"""

from numpywren_tpu.config import NpwConfig, default_config
from numpywren_tpu.tiled import TiledMatrix, TiledSymmetricMatrix
from numpywren_tpu.trapezoid import TiledTrapezoidMatrix, TrapezoidMatrix, cholesky_trapezoid
from numpywren_tpu import kernels
from numpywren_tpu import exceptions

__version__ = "0.1.0"

__all__ = [
    "TiledMatrix",
    "TiledSymmetricMatrix",
    "TiledTrapezoidMatrix",
    "TrapezoidMatrix",
    "cholesky_trapezoid",
    "NpwConfig",
    "default_config",
    "kernels",
    "exceptions",
    "__version__",
]


def __getattr__(name):
    # Lazy imports so `import numpywren_tpu` stays cheap and avoids importing
    # jax-compiled modules before test conftest sets platform env vars.
    if name in ("cholesky", "cholesky_solve", "gemm", "tsqr", "bdfac", "run_program", "tsqr_r_factor"):
        from numpywren_tpu import alg_wrappers

        return getattr(alg_wrappers, name)
    if name == "binops":
        import importlib

        return importlib.import_module("numpywren_tpu.binops")
    if name == "lpcompile":
        from numpywren_tpu.frontend import lpcompile

        return lpcompile
    raise AttributeError(f"module 'numpywren_tpu' has no attribute {name!r}")
