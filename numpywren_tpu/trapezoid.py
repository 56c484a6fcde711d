"""TrapezoidMatrix: lower-trapezoid column-block storage for SPD/lower-
triangular matrices.

The fused Cholesky's hot layout (compiler/lower.py chol_cols) keeps each
column super-panel's at/below-diagonal region in its own buffer: trailing
updates are then one GEMM + one whole-buffer subtraction per later column
block, and XLA's donation makes them truly in-place. This class makes that
layout a first-class storage tier so repeated factorizations (or users who
build their SPD operand column-by-column) skip the flat<->column conversion
entirely — and symmetric data costs HALF the memory of a dense square
(the reference's BigSymmetricMatrix plays the same memory trick with
lower-triangle-only S3 blocks, numpywren/matrix.py).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from numpywren_tpu.exceptions import ShapeError
from numpywren_tpu.utils import cdiv


class TrapezoidMatrix:
    """Column-block lower-trapezoid storage: block c holds rows
    [c*panel, n_pad) of columns [c*panel, (c+1)*panel) as one jax.Array."""

    def __init__(self, cols: Sequence, n: int, panel: int):
        self.n = int(n)
        self.panel = int(panel)
        self.nb = cdiv(self.n, self.panel)
        self.n_pad = self.nb * self.panel
        cols = list(cols)
        if len(cols) != self.nb:
            raise ShapeError(f"expected {self.nb} column blocks, got {len(cols)}")
        for c, arr in enumerate(cols):
            want = (self.n_pad - c * self.panel,
                    min(self.panel, self.n_pad - c * self.panel))
            if tuple(arr.shape) != want:
                raise ShapeError(f"column block {c}: expected {want}, got {arr.shape}")
        self.cols = cols
        self.dtype = np.dtype(cols[0].dtype) if cols else np.dtype(np.float32)

    # ------------------------------------------------------------ builders
    @classmethod
    def from_array(cls, a, panel: int = 1024) -> "TrapezoidMatrix":
        """Slice the lower trapezoid out of a flat (n, n) array (device or
        host). Only the at/below-diagonal region is kept."""
        import jax.numpy as jnp

        a = jnp.asarray(a)
        n = a.shape[0]
        if a.ndim != 2 or a.shape[1] != n:
            raise ShapeError(f"need a square array, got {a.shape}")
        nb = cdiv(n, panel)
        n_pad = nb * panel
        if n_pad != n:
            pad = jnp.zeros((n_pad, n_pad), a.dtype)
            import jax

            pad = jax.lax.dynamic_update_slice(pad, a, (0, 0))
            # identity on the padded diagonal keeps SPD inputs factorable
            idx = jnp.arange(n, n_pad)
            a = pad.at[idx, idx].set(1.0)
        cols = [a[c * panel :, c * panel : (c + 1) * panel] for c in range(nb)]
        return cls(cols, n, panel)

    @classmethod
    def from_tiled(cls, m, panel: int = 1024) -> "TrapezoidMatrix":
        """From a TiledMatrix (any tier); symmetric host tiers mirror."""
        arr = m.to_hbm().array if getattr(m, "storage", None) != "hbm" else m.array
        return cls.from_array(arr[: m.shape[0], : m.shape[1]], panel=panel)

    @classmethod
    def from_block_fn(cls, block_fn, n: int, panel: int = 1024,
                      dtype=np.float32) -> "TrapezoidMatrix":
        """Build from a generator `block_fn(i, c) -> (panel, panel) array`
        giving block row i of block column c (i >= c; only the lower
        trapezoid is requested). This is how operands LARGER than half of
        HBM are constructed at all — e.g. single-chip N=65536 Cholesky,
        where no flat (n, n) array can ever exist (bench.py's blockwise-PRNG
        SPD generator uses the same shape)."""
        import jax.numpy as jnp

        nb = cdiv(n, panel)
        cols = []
        for c in range(nb):
            col = jnp.concatenate(
                [jnp.asarray(block_fn(i, c), dtype=dtype) for i in range(c, nb)],
                axis=0,
            )
            cols.append(col)
        return cls(cols, n, panel)

    # ----------------------------------------------------------- accessors
    def to_array(self):
        """Assemble the flat (n, n) lower-triangular/trapezoid array."""
        import jax
        import jax.numpy as jnp

        out = jnp.zeros((self.n_pad, self.n_pad), self.cols[0].dtype)
        for c in range(self.nb):
            out = jax.lax.dynamic_update_slice(
                out, self.cols[c], (c * self.panel, c * self.panel)
            )
        # the diagonal blocks' strictly-upper region is dead storage
        return jnp.tril(out)[: self.n, : self.n]

    def numpy(self) -> np.ndarray:
        return np.asarray(self.to_array())

    @property
    def nbytes(self) -> int:
        return sum(int(np.prod(c.shape)) for c in self.cols) * self.dtype.itemsize

    def block(self, c: int):
        return self.cols[c]

    def __repr__(self):
        return (f"TrapezoidMatrix(n={self.n}, panel={self.panel}, "
                f"nb={self.nb}, dtype={self.dtype.name})")


import functools


@functools.lru_cache(maxsize=16)
def _trapezoid_chol_fn(n_pad: int, panel: int, nb: int, tile: int,
                       precision, dtype_name: str, compensated: bool):
    """Jitted donated factorization over the column-block tuple (the
    chol_cols schedule of compiler/lower.py operating natively on the
    trapezoid buffers — no flat array ever exists)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from numpywren_tpu.compiler.lower import _matmul, _sub_matmul

    dtype = jnp.dtype(dtype_name)

    def rtrsm(b, l, w):
        if w <= tile:
            winv = lax.linalg.triangular_solve(
                l, jnp.eye(w, dtype=dtype), left_side=True, lower=True
            )
            return _matmul(b, winv, tb=True, precision=precision)
        h = (w // 2 + tile - 1) // tile * tile
        b1 = rtrsm(b[:, :h], l[:h, :h], h)
        b2 = b[:, h:] - _matmul(b1, l[h:, :h], tb=True, precision=precision)
        b2 = rtrsm(b2, l[h:, h:], w - h)
        return jnp.concatenate([b1, b2], axis=1)

    def chol(*cols):
        cols = list(cols)
        for p in range(nb):
            colp = cols[p]
            wp = colp.shape[1]
            ld = lax.linalg.cholesky(colp[:wp], symmetrize_input=False)
            if colp.shape[0] <= wp:
                cols[p] = jnp.tril(ld)
                continue
            b = rtrsm(colp[wp:], ld, wp)
            # update later columns BEFORE committing cols[p]: the commit's
            # concatenate consumes the donated buffer and `b` must not be
            # re-read after it (donation aliasing)
            for c in range(p + 1, nb):
                off = (c - p - 1) * panel
                pc = lax.dynamic_slice(b, (off, 0), (b.shape[0] - off, wp))
                pcc = lax.dynamic_slice(b, (off, 0), (cols[c].shape[1], wp))
                cols[c] = _sub_matmul(cols[c], pc, pcc, tb=True,
                                      precision=precision).astype(dtype)
            cols[p] = jnp.concatenate([jnp.tril(ld), b], axis=0)
        return tuple(cols)

    return jax.jit(chol, donate_argnums=tuple(range(nb)))


def cholesky_trapezoid(t: TrapezoidMatrix, *, precision=None) -> TrapezoidMatrix:
    """In-place blocked Cholesky over trapezoid storage: the column buffers
    are DONATED to one jitted program (no flat conversions, no giant
    dynamic-update-slices) — the fastest single-chip path (~10% over the
    flat-array entry at N=32768; see BENCH.md). CONSUMES `t`'s buffers."""
    from numpywren_tpu.config import default_config
    from numpywren_tpu.ops.common import default_precision

    if precision is None:
        precision = default_precision(t.dtype)
    tile = min(128, t.panel)  # measured sweet spot (BENCH.md)
    fn = _trapezoid_chol_fn(t.n_pad, t.panel, t.nb, tile, precision,
                            t.dtype.name, default_config().compensated)
    out_cols = fn(*t.cols)
    t.cols = [None] * t.nb  # buffers were donated
    return TrapezoidMatrix(list(out_cols), t.n, t.panel)
