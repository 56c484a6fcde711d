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

from typing import Optional, Sequence

import numpy as np

from numpywren_tpu.exceptions import ShapeError
from numpywren_tpu.tiled import _TiledBase
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


class TiledTrapezoidMatrix(_TiledBase):
    """The trapezoid buffers exposed through the TiledMatrix block API —
    ``storage == "trapezoid"`` — so DSL programs can bind the fastest
    storage tier directly (``npw.cholesky(X, storage="trapezoid")``).

    This is also the HALF-memory symmetric HBM tier (the reference's
    BigSymmetricMatrix stores only the lower triangle on S3,
    numpywren/matrix.py; the flat-HBM TiledSymmetricMatrix mirrors both
    triangles and costs 2x): with ``symmetric=True``, upper-triangle reads
    mirror-transpose the lower storage; with ``symmetric=False`` (a lower-
    triangular factor) they read as zeros.

    Tiles address the logical (i, j) grid of square ``tile`` blocks;
    ``panel`` (the physical column-block width) must be a multiple of it.
    """

    def __init__(
        self,
        trap: Optional[TrapezoidMatrix] = None,
        *,
        key: Optional[str] = None,
        n: Optional[int] = None,
        tile: int = 512,
        panel: int = 1024,
        dtype=np.float32,
        symmetric: bool = False,
    ):
        from numpywren_tpu.tiled import _anon_key

        if trap is None:
            if n is None:
                raise ShapeError("need either a TrapezoidMatrix or n")
            import jax.numpy as jnp

            nb = cdiv(int(n), panel)
            n_pad = nb * panel
            cols = [
                jnp.zeros((n_pad - c * panel, min(panel, n_pad - c * panel)),
                          jnp.dtype(np.dtype(dtype).name))
                for c in range(nb)
            ]
            trap = TrapezoidMatrix(cols, int(n), panel)
        self.trap = trap
        t = int(tile)
        if trap.panel % t != 0:
            raise ShapeError(f"tile {t} must divide panel {trap.panel}")
        self.key = key or _anon_key("trz")
        self.shape = (trap.n, trap.n)
        self.tile = (t, t)
        self.dtype = np.dtype(trap.dtype)
        self.storage = "trapezoid"
        self.symmetric = symmetric
        self.parent_fn = None
        self._written = np.zeros(self.grid, dtype=bool)
        # put_block is a read-modify-write of a whole column buffer;
        # concurrent writers (the threaded LocalExecutor, reference
        # job_runner parity) would lose each other's tiles without this
        import threading

        self._lock = threading.Lock()

    # -------------------------------------------------------- addressing
    def _locate(self, i: int, j: int):
        t = self.tile[0]
        c = (j * t) // self.trap.panel
        return c, i * t - c * self.trap.panel, j * t - c * self.trap.panel

    def get_block(self, i: int, j: int):
        self._check_idx(i, j)
        if i < j:
            if self.symmetric:
                return self.get_block(j, i).T
            import jax.numpy as jnp

            return jnp.zeros(self.tile, self.dtype)  # upper of a lower factor
        c, r0, c0 = self._locate(i, j)
        t = self.tile[0]
        return self.trap.cols[c][r0 : r0 + t, c0 : c0 + t]

    def put_block(self, arr, i: int, j: int):
        self._check_idx(i, j)
        if i < j:
            if self.symmetric:
                return self.put_block(np.asarray(arr).T, j, i)
            raise ShapeError(
                f"upper-triangle write ({i},{j}) to non-symmetric trapezoid tier"
            )
        import jax
        import jax.numpy as jnp

        t = self.tile[0]
        blk = jnp.asarray(arr, dtype=self.dtype)
        if blk.shape != (t, t):
            m, n = self.true_block_shape(i, j)
            if blk.shape != (m, n):
                raise ShapeError(
                    f"block ({i},{j}) of {self.key}: expected {(t, t)} or "
                    f"{(m, n)}, got {blk.shape}"
                )
            blk = jnp.zeros((t, t), self.dtype).at[:m, :n].set(blk)
        c, r0, c0 = self._locate(i, j)
        with self._lock:
            self.trap.cols[c] = jax.lax.dynamic_update_slice(
                self.trap.cols[c], blk, (r0, c0)
            )
            self._written[i, j] = True
        return (i, j)

    def delete_block(self, i: int, j: int):
        self._check_idx(i, j)
        if i >= j:
            self._written[i, j] = False
        elif self.symmetric:
            self._written[j, i] = False

    def block_exists(self, i: int, j: int) -> bool:
        if i >= j:
            return bool(self._written[i, j])
        return self.symmetric and bool(self._written[j, i])

    # ------------------------------------------------------------ lifecycle
    def adopt(self, trap: TrapezoidMatrix, written: bool = True,
              written_tile_cols: Optional[int] = None):
        """Take ownership of freshly computed column buffers (the fused
        cholesky_trapezoid commit path). written_tile_cols marks only the
        first so-many tile columns as computed (a truncate/prefix run:
        trailing columns hold the in-place Schur complement but do not
        "exist" for block_idxs_exist/resume purposes)."""
        if (trap.n, trap.panel) != (self.trap.n, self.trap.panel):
            raise ShapeError(
                f"adopt geometry mismatch: {(trap.n, trap.panel)} vs "
                f"{(self.trap.n, self.trap.panel)}"
            )
        self.trap = trap
        if written:
            gm, _ = self.grid
            jmax = gm if written_tile_cols is None else int(written_tile_cols)
            for i in range(gm):
                self._written[i, : min(i + 1, jmax)] = True

    def free(self):
        self.trap.cols = [None] * self.trap.nb
        self._written[:] = False

    # ---------------------------------------------------------- conversions
    def to_array(self):
        """Flat logical (n, n) array: lower factor (tril) or the mirrored
        full symmetric matrix."""
        lower = self.trap.to_array()
        if not self.symmetric:
            return lower
        import jax.numpy as jnp

        return lower + lower.T - jnp.diag(jnp.diag(lower))

    def numpy(self) -> np.ndarray:
        return np.asarray(self.to_array())

    def to_hbm(self, sharding=None):
        """Promote to a flat HBM TiledMatrix (generic-executor fallback)."""
        import jax
        import jax.numpy as jnp
        from numpywren_tpu.tiled import TiledMatrix

        out = TiledMatrix(
            key=self.key + ":hbm", shape=self.shape, tile=self.tile,
            dtype=self.dtype, storage="hbm", sharding=sharding, fill=None,
        )
        arr = self.to_array()
        pm, pn = out.padded_shape
        if arr.shape != (pm, pn):
            pad = jnp.zeros((pm, pn), arr.dtype)
            arr = jax.lax.dynamic_update_slice(pad, arr, (0, 0))
            if self.symmetric:  # keep padded diagonal factorable
                idx = jnp.arange(self.shape[0], pm)
                arr = arr.at[idx, idx].set(1.0)
        out.replace_array(arr, mark_written=False)
        out._written = (
            np.ones(out.grid, dtype=bool) if self.symmetric
            else np.tril(np.ones(out.grid, dtype=bool))
        )
        return out

    @property
    def nbytes(self) -> int:
        return self.trap.nbytes


import functools


@functools.lru_cache(maxsize=16)
def _trapezoid_chol_fn(n_pad: int, panel: int, nb: int, tile: int,
                       precision, dtype_name: str, compensated: bool,
                       stop_panels: Optional[int] = None):
    """Jitted donated factorization over the column-block tuple (the
    chol_cols schedule of compiler/lower.py operating natively on the
    trapezoid buffers — no flat array ever exists).

    stop_panels < nb runs a PREFIX factorization (the reference's truncate
    parameter, upstream:numpywren/algs.py cholesky truncate): panels
    [0, stop_panels) are factored, later panels receive their trailing
    updates and come back holding the Schur complement — exactly the
    LAPACK-style in-place state a resume continues from."""
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

    stop = nb if stop_panels is None else min(int(stop_panels), nb)

    def chol(*cols):
        cols = list(cols)
        for p in range(stop):
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


def cholesky_trapezoid(t: TrapezoidMatrix, *, precision=None,
                       stop_panels: Optional[int] = None) -> TrapezoidMatrix:
    """In-place blocked Cholesky over trapezoid storage: the column buffers
    are DONATED to one jitted program (no flat conversions, no giant
    dynamic-update-slices) — the fastest single-chip path (~10% over the
    flat-array entry at N=32768; see BENCH.md). CONSUMES `t`'s buffers.

    stop_panels runs a prefix factorization (reference truncate): panels
    beyond it come back holding the updated Schur complement."""
    from numpywren_tpu.config import default_config
    from numpywren_tpu.ops.common import default_precision

    if precision is None:
        precision = default_precision(t.dtype)
    tile = min(128, t.panel)  # measured sweet spot (BENCH.md)
    fn = _trapezoid_chol_fn(t.n_pad, t.panel, t.nb, tile, precision,
                            t.dtype.name, default_config().compensated,
                            stop_panels)
    out_cols = fn(*t.cols)
    t.cols = [None] * t.nb  # buffers were donated
    return TrapezoidMatrix(list(out_cols), t.n, t.panel)
