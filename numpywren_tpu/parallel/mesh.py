"""Device mesh construction + sharding helpers.

The (rows, cols) 2-D mesh is the TPU analog of the reference's 2-D block
sharding of BigMatrix keys across S3 (numpywren/matrix.py shard_sizes): tile
(i, j) of a mesh-sharded TiledMatrix lives in the HBM of device
(i mod R, j mod C). Collectives along the "rows"/"cols" axes replace the
reference's S3 reads of panel blocks by every consumer.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _factor_2d(n: int) -> Tuple[int, int]:
    """Most-square factorization r*c = n with r <= c."""
    r = int(math.isqrt(n))
    while n % r:
        r -= 1
    return r, n // r


def make_mesh(
    devices: Optional[Sequence] = None,
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Optional[Tuple[str, str]] = None,
) -> Mesh:
    """A 2-D (rows, cols) mesh over the given (default: all) devices.

    shape/axis_names default to NpwConfig.mesh_shape / mesh_axis_names
    (NPW_MESH_SHAPE=RxC env override), falling back to the most-square
    factorization of the device count."""
    from numpywren_tpu.config import default_config

    cfg = default_config()
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = cfg.mesh_shape
        if shape is not None and shape[0] * shape[1] != len(devices):
            shape = None  # configured shape is for a different slice size
    if shape is None:
        shape = _factor_2d(len(devices))
    if axis_names is None:
        axis_names = tuple(cfg.mesh_axis_names)
    r, c = shape
    if r * c != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(r, c), axis_names)


def mesh_sharding(mesh: Mesh, spec: Optional[P] = None) -> NamedSharding:
    """NamedSharding over both mesh axes (default: 2-D block layout)."""
    if spec is None:
        spec = P(*mesh.axis_names)
    return NamedSharding(mesh, spec)


def tile_sharding(mesh: Mesh) -> NamedSharding:
    """The canonical layout for a flat padded TiledMatrix array: rows of
    tiles block-sharded over mesh rows, columns over mesh cols."""
    return NamedSharding(mesh, P(mesh.axis_names[0], mesh.axis_names[1]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
