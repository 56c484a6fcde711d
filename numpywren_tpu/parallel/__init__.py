"""Multi-chip parallel layer: device mesh + sharded tiled algorithms.

The reference's "fabric" is S3 + SQS + Redis (SURVEY §2 backend table):
workers never talk to each other, storage is the network. The TPU rebuild
replaces all of it with a jax.sharding.Mesh and XLA SPMD: tiles live
mesh-sharded in HBM, panel broadcasts and trailing-update reductions ride
ICI collectives inserted by GSPMD (or explicitly via shard_map in fabric).
"""

from numpywren_tpu.parallel import distributed
from numpywren_tpu.parallel.mesh import make_mesh, mesh_sharding, tile_sharding
from numpywren_tpu.parallel.fabric import (
    bdfac_1d,
    bdfac_2d,
    cholesky_1d,
    cholesky_2d,
    cholqr2_sharded,
    cholqr3s_sharded,
    summa_gemm,
    tsqr_butterfly,
)
from numpywren_tpu.parallel.sharded import (
    sharded_cholesky,
    sharded_gemm,
    sharded_tsqr,
)

__all__ = [
    "bdfac_1d",
    "bdfac_2d",
    "distributed",
    "make_mesh",
    "mesh_sharding",
    "tile_sharding",
    "sharded_cholesky",
    "sharded_gemm",
    "sharded_tsqr",
    "summa_gemm",
    "tsqr_butterfly",
    "cholesky_1d",
    "cholesky_2d",
    "cholqr2_sharded",
    "cholqr3s_sharded",
]
