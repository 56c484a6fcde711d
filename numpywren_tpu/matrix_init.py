"""Creating TiledMatrices from local data (analog of numpywren/matrix_init.py
:: shard_matrix / local_numpy_init — there the blocks are put to S3, in
parallel via pywren; here the "shard" is a single padded device_put or a dict
of host tiles)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from numpywren_tpu.tiled import TiledMatrix, TiledSymmetricMatrix


def shard_matrix(
    arr: np.ndarray,
    tile: Tuple[int, int] = (512, 512),
    key: Optional[str] = None,
    storage: str = "hbm",
    symmetric: bool = False,
    sharding=None,
    dtype=None,
) -> TiledMatrix:
    """Shard a local numpy array into a TiledMatrix.

    Reference parity: matrix_init.shard_matrix puts each block to S3; here
    the HBM tier is one padded device transfer, the host tier a tile dict.
    """
    arr = np.asarray(arr)
    dtype = np.dtype(dtype or arr.dtype)
    cls = TiledSymmetricMatrix if symmetric else TiledMatrix
    out = cls(key=key, shape=arr.shape, tile=tile, dtype=dtype, storage=storage, sharding=sharding, fill=None)
    if storage == "hbm":
        import jax
        import jax.numpy as jnp

        pm, pn = out.padded_shape
        if arr.shape != (pm, pn):
            pad = np.zeros((pm, pn), dtype=dtype)
            pad[: arr.shape[0], : arr.shape[1]] = arr
            if symmetric:
                # keep padded matrix SPD-compatible: identity on padded diagonal
                for d in range(arr.shape[0], pm):
                    pad[d, d] = 1.0
            arr_p = pad
        else:
            arr_p = arr.astype(dtype, copy=False)
        dev = jnp.asarray(arr_p)
        if sharding is not None:
            dev = jax.device_put(dev, sharding)
        out.replace_array(dev)
    else:
        gm, gn = out.grid
        for i in range(gm):
            for j in range(gn):
                if symmetric and j > i:
                    continue
                m, n = out.true_block_shape(i, j)
                blk = arr[i * tile[0] : i * tile[0] + m, j * tile[1] : j * tile[1] + n]
                out.put_block(blk.astype(dtype, copy=False), i, j)
    return out


def local_numpy_init(
    arr: np.ndarray, tile: Tuple[int, int] = (512, 512), **kw
) -> TiledMatrix:
    """Reference-parity alias (matrix_init.local_numpy_init)."""
    return shard_matrix(arr, tile=tile, **kw)


def random_spd(n: int, seed: int = 0, dtype=np.float32, jitter: float = None) -> np.ndarray:
    """A well-conditioned random SPD matrix for tests/benchmarks.

    Mirrors the reference tests' pattern (A = X X^T + n*I on small random X).
    """
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, n)).astype(np.float64)
    a = x @ x.T / n + np.eye(n) * (jitter if jitter is not None else 2.0)
    return a.astype(dtype)
