"""One-call algorithm entry points (analog of numpywren/alg_wrappers.py).

Each wrapper allocates output/scratch TiledMatrices, compiles the DSL
program, binds concrete tile-grid sizes, and returns
(program, outputs-dict). `run_program` executes on the chosen executor.

The reference wires scratch matrices to their inputs with parent_fn so
unwritten blocks fall back to reading X (matrix.py parent_fn); the HBM path
here materializes version 0 directly as a copy of the input array (one
device copy), while the host/local path keeps the lazy parent_fn semantics.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple, Union

import numpy as np

from numpywren_tpu import algs
from numpywren_tpu.exceptions import ShapeError
from numpywren_tpu.frontend import lpcompile
from numpywren_tpu.frontend.ir import BoundArg
from numpywren_tpu.matrix_init import shard_matrix
from numpywren_tpu.runtime.executor import run_program  # re-export
from numpywren_tpu.tiled import TiledMatrix, _TiledBase
from numpywren_tpu.utils import cdiv

MatLike = Union[np.ndarray, _TiledBase]

_templates: Dict[str, object] = {}


def _template(name: str):
    if name not in _templates:
        _templates[name] = lpcompile(getattr(algs, name))
    return _templates[name]


def _as_tiled(x: MatLike, tile, storage: str, key=None) -> _TiledBase:
    if isinstance(x, np.ndarray):
        return shard_matrix(x, tile=tile, storage=storage, key=key)
    return x


def _default_tile(x: MatLike, tile) -> Tuple[int, int]:
    if tile is not None:
        return tile
    if isinstance(x, np.ndarray):
        t = min(512, *x.shape)
        return (t, t)
    return x.tile


# ---------------------------------------------------------------------------
# Cholesky
# ---------------------------------------------------------------------------

def cholesky(X: MatLike, tile=None, storage: str = "hbm", truncate: int = 0,
             panel: int = 1024):
    """Blocked Cholesky: returns (program, L_matrix, meta).

    X: SPD matrix (ndarray or TiledMatrix). The scratch S holds the trailing
    matrix; version 0 is X itself (copy on the HBM tier, lazy parent_fn
    aliasing on the host tier — reference alg_wrappers.cholesky).

    storage="trapezoid" binds the half-memory lower-trapezoid column-block
    tier (the flagship perf path): the fused lowering runs
    cholesky_trapezoid natively on the column buffers; `panel` is the
    physical column-block width. NOTE: binding an existing
    TrapezoidMatrix donates its buffers to the factorization."""
    if storage == "trapezoid":
        return _cholesky_trapezoid_bind(X, tile, truncate, panel)
    tile = _default_tile(X, tile)
    if tile[0] != tile[1]:
        raise ShapeError("cholesky requires square tiles")
    x_t = _as_tiled(X, tile, storage)
    if x_t.shape[0] != x_t.shape[1]:
        raise ShapeError(f"cholesky requires a square matrix, got {x_t.shape}")
    g = x_t.grid[0]

    # upper-triangle blocks of L are never written: zeros fallback on the
    # sparse host tier (the HBM tier is dense zero-filled already)
    o = TiledMatrix(
        key=x_t.key + ":chol_L", shape=x_t.shape, tile=tile, dtype=x_t.dtype, storage=storage,
        parent_fn=None if storage == "hbm" else (lambda m, i, j: np.zeros(m.tile, m.dtype)),
    )
    if storage == "hbm":
        s = TiledMatrix(key=x_t.key + ":chol_S", shape=x_t.shape, tile=tile, dtype=x_t.dtype,
                        storage="hbm", fill=None)
        arr = x_t.to_hbm().array if x_t.storage != "hbm" else x_t.array
        arr = _identity_pad_diag(arr, x_t)
        s.replace_array(arr)
    else:
        s = TiledMatrix(key=x_t.key + ":chol_S", shape=x_t.shape, tile=tile, dtype=x_t.dtype,
                        storage="host", parent_fn=_spd_parent(x_t))

    program = _template("cholesky").bind(
        O=o, S=BoundArg(name="S", matrix=s, versioned=True), N=g, truncate=truncate
    )
    meta = {"input": x_t, "scratch": s, "tile": tile, "grid": g}
    return program, o, meta


def _cholesky_trapezoid_bind(X, tile, truncate: int, panel: int):
    """Bind a cholesky program over the trapezoid storage tier (VERDICT r1
    next-round #3: one store with symmetric savings, not a side path —
    upstream:numpywren/matrix.py::BigSymmetricMatrix)."""
    from numpywren_tpu.trapezoid import TiledTrapezoidMatrix, TrapezoidMatrix

    if isinstance(X, TiledTrapezoidMatrix):
        s_m = X
        panel = X.trap.panel
        tile_n = X.tile[0]
    else:
        if isinstance(X, TrapezoidMatrix):
            trap = X
            panel = trap.panel
        elif isinstance(X, np.ndarray):
            trap = TrapezoidMatrix.from_array(X, panel=panel)
        elif hasattr(X, "get_block"):  # any TiledMatrix tier
            trap = TrapezoidMatrix.from_tiled(X, panel=panel)
        else:
            raise ShapeError(f"cannot bind {type(X).__name__} as trapezoid")
        tile_n = tile[0] if tile is not None else min(512, panel)
        if panel % tile_n != 0:
            raise ShapeError(f"tile {tile_n} must divide panel {panel}")
        s_m = TiledTrapezoidMatrix(trap, tile=tile_n, symmetric=True,
                                   key="chol_S")
    g = s_m.grid[0]
    if truncate:
        # prefix runs stop at a physical panel boundary (the factorization
        # is in-place per column block): the factored prefix
        # (g - truncate) * tile must cover whole panels
        n_done = (g - truncate) * s_m.tile[0]
        if not 0 < n_done <= s_m.shape[0] or n_done % s_m.trap.panel != 0:
            raise ShapeError(
                f"trapezoid truncate must leave a panel-aligned prefix: "
                f"(grid {g} - truncate {truncate}) * tile {s_m.tile[0]} = "
                f"{n_done} is not a multiple of panel {s_m.trap.panel}; "
                f"choose tile/panel/truncate accordingly"
            )
    # version 0 of S is the input itself: the lower-triangle blocks exist
    for i in range(g):
        s_m._written[i, : i + 1] = True
    o = TiledTrapezoidMatrix(n=s_m.shape[0], tile=s_m.tile[0], panel=panel,
                             dtype=s_m.dtype, symmetric=False,
                             key=s_m.key + ":chol_L")
    program = _template("cholesky").bind(
        O=o, S=BoundArg(name="S", matrix=s_m, versioned=True), N=g,
        truncate=truncate,
    )
    meta = {"input": s_m, "scratch": s_m, "tile": s_m.tile, "grid": g,
            "panel": panel}
    return program, o, meta


def _identity_pad_diag(arr, x_t):
    """If X was padded past its logical shape, put 1s on the padded diagonal
    so padded potrf tiles stay SPD (factor of diag(A, I) = diag(L, I))."""
    import jax.numpy as jnp

    n_log = x_t.shape[0]
    n_pad = x_t.padded_shape[0]
    if n_pad == n_log:
        return arr
    pad_eye = jnp.zeros(arr.shape, arr.dtype).at[
        jnp.arange(n_log, n_pad), jnp.arange(n_log, n_pad)
    ].set(1.0)
    return arr + pad_eye


def _spd_parent(x_t):
    def parent(m, i, j):
        blk = np.asarray(x_t.get_block(i, j)).copy()
        tm, tn = m.tile
        bm, bn = m.true_block_shape(i, j)
        if i == j and bm < tm:
            for d in range(bm, tm):
                blk[d, d] = 1.0
        return blk

    return parent


def cholesky_solve(l: _TiledBase, b: np.ndarray) -> np.ndarray:
    """Solve A x = b given A's lower Cholesky factor (two triangular solves
    on device). `l` is the TiledMatrix returned by cholesky(); `b` is
    (n,) or (n, k). Beyond-reference convenience (the reference stops at
    the factorization)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = l.shape[0]
    b = np.asarray(b)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    if b.shape[0] != n:
        raise ShapeError(f"rhs rows {b.shape[0]} != matrix dim {n}")
    l_arr = l.to_hbm().array if getattr(l, "storage", None) != "hbm" else l.array
    n_pad = l_arr.shape[0]

    @jax.jit
    def solve(l_arr, rhs):
        y = lax.linalg.triangular_solve(l_arr, rhs, left_side=True, lower=True)
        return lax.linalg.triangular_solve(l_arr, y, left_side=True, lower=True,
                                           transpose_a=True)

    rhs = jnp.zeros((n_pad, b.shape[1]), l_arr.dtype)
    rhs = lax.dynamic_update_slice(rhs, jnp.asarray(b, l_arr.dtype), (0, 0))
    # padded diagonal is zero outside the logical region for cholesky outputs
    # whose pad carried identity; guard by setting unit diagonal on the pad
    if n_pad > n:
        pad_idx = jnp.arange(n, n_pad)
        l_arr = l_arr.at[pad_idx, pad_idx].set(1.0)
    x = np.asarray(solve(l_arr, rhs))[:n]
    return x[:, 0] if squeeze else x


# ---------------------------------------------------------------------------
# GEMM
# ---------------------------------------------------------------------------

def gemm(A: MatLike, B: MatLike, tile=None, storage: str = "hbm",
         k_chunk: Optional[int] = None):
    """Blocked GEMM: returns (program, C_matrix, meta) with C = A @ B.

    k_chunk: tiles accumulated serially per chunk before the log-depth
    chunk-reduce tree (reference binops.py's tasks_per_job chunking +
    reduce, SURVEY §3.5). Wavefront depth = k_chunk + ceil(log2 K/k_chunk)
    instead of the serial K; scratch = ceil(K/k_chunk) partial tiles per
    output tile. Default bounds scratch at <= 8 partials per output
    (k_chunk = cdiv(K, 8)); k_chunk=1 gives the full log-depth tree,
    k_chunk=K the zero-scratch serial chain."""
    from numpywren_tpu.utils import cdiv

    tile = _default_tile(A, tile)
    a_t = _as_tiled(A, tile, storage)
    b_t = _as_tiled(B, tile, storage)
    if a_t.shape[1] != b_t.shape[0]:
        raise ShapeError(f"gemm shape mismatch: {a_t.shape} @ {b_t.shape}")
    if a_t.tile[1] != b_t.tile[0]:
        raise ShapeError("gemm requires matching inner tile sizes")
    m, k = a_t.grid
    _, n = b_t.grid
    c_tile = (a_t.tile[0], b_t.tile[1])
    c_shape = (a_t.shape[0], b_t.shape[1])
    if k_chunk is None:
        k_chunk = max(1, cdiv(k, 8))
    q = max(1, min(int(k_chunk), k))
    nc = cdiv(k, q)
    depth, live = 0, nc
    while live > 1:
        live = cdiv(live, 2)
        depth += 1

    def new(key, shape, lazy=False):
        if storage == "hbm":
            # lazy (fill=None): no device allocation until first use — the
            # fused gemm runner never touches P, so its (m*n x nc) tile
            # scratch must not cost HBM on the one-XLA-dot path
            return TiledMatrix(key=key, shape=shape, tile=c_tile, dtype=a_t.dtype,
                               storage="hbm", fill=None if lazy else 0.0)
        return TiledMatrix(key=key, shape=shape, tile=c_tile, dtype=a_t.dtype,
                           storage="host",
                           parent_fn=lambda mm, i, j: np.zeros(mm.tile, dtype=mm.dtype))

    c = new("gemm_C", c_shape)
    p = new("gemm_P", (m * n * c_tile[0], nc * c_tile[1]), lazy=True)
    program = _template("gemm").bind(
        A=a_t, B=b_t, C=c, P=BoundArg(name="P", matrix=p, versioned=True),
        M=m, N=n, K=k, NC=nc, Q=q, L=depth,
    )
    return program, c, {"tile": tile, "grid": (m, n, k),
                        "k_chunk": q, "chunks": nc, "tree_depth": depth}


# ---------------------------------------------------------------------------
# TSQR
# ---------------------------------------------------------------------------

def _template_tsqr_kary(b_fac: int):
    """Generated k-ary TSQR template (R path): the `reducer` construct with
    branching factor b_fac > 2 (reference reducer's b_fac, SURVEY §2 L5).
    Generated per b_fac because the reducer expansion is static."""
    name = f"tsqr_b{b_fac}"
    if name not in _templates:
        src = (
            f"def {name}(A, Q0, R, N, L):\n"
            f"    for i in range(0, N):\n"
            f"        Q0[i, 0], R[i, 0] = qr_leaf(A[i, 0])\n"
            f"    reducer(R, qr_combine_r, copy, N, L, b_fac={b_fac})\n"
        )
        _templates[name] = lpcompile(src)
    return _templates[name]


def tsqr(X: MatLike, tile_rows: int = 4096, storage: str = "hbm",
         compute_q: bool = False, method: str = "tree", b_fac: int = 2):
    """Tall-skinny QR via tree reduction (reference alg_wrappers.tsqr).

    X: (m, b) with m >> b; row blocks of `tile_rows` rows form the leaves.
    Returns (program, outputs, meta) where outputs["R"] is the (b, b) final
    R TiledMatrix view holder and outputs["Q"] (if compute_q) the explicit
    (m, b) thin Q. b_fac is the combine-tree branching factor (the
    reference reducer's b_fac): >2 stacks b_fac R tiles per tree node,
    shrinking tree depth from ceil(log2 N) to ceil(log_b N); the Q
    reconstruction sweep is binary-only, so compute_q requires b_fac=2
    on the DSL path (the fused lowering supports both)."""
    if isinstance(X, np.ndarray):
        m, b = X.shape
        tile_rows = min(tile_rows, m)
        a_t = shard_matrix(X, tile=(tile_rows, b), storage=storage)
    else:
        a_t = X
        m, b = a_t.shape
        tile_rows = a_t.tile[0]
    if a_t.grid[1] != 1:
        raise ShapeError("tsqr expects a single tile column (m x b, b == tile width)")
    if b_fac < 2:
        raise ValueError(f"b_fac must be >= 2, got {b_fac}")
    if b_fac != 2 and compute_q:
        raise ShapeError("compute_q requires b_fac=2 on the DSL path "
                         "(use run_program(..., executor='auto') fused lowering)")
    n_leaves = a_t.grid[0]
    depth, m_live = 0, n_leaves
    while m_live > 1:  # depth = ceil(log_b n_leaves), exactly
        m_live = cdiv(m_live, b_fac)
        depth += 1

    def new(key, shape, tile):
        return TiledMatrix(key=key, shape=shape, tile=tile, dtype=a_t.dtype, storage=storage,
                           fill=0.0 if storage == "hbm" else None,
                           parent_fn=None if storage == "hbm" else (lambda mm, i, j: np.zeros(mm.tile, mm.dtype)))

    q0 = new("tsqr_Q0", (n_leaves * tile_rows, b), (tile_rows, b))
    r = new("tsqr_R", (n_leaves * b, (depth + 1) * b), (b, b))

    outputs = {"R": r, "R_block": (0, depth), "Q0": q0}
    if b_fac != 2:
        program = _template_tsqr_kary(b_fac).bind(
            A=a_t, Q0=q0, R=r, N=n_leaves, L=depth
        )
    elif compute_q:
        qt = new("tsqr_QT", (max(1, cdiv(n_leaves, 2)) * b, max(1, depth) * b), (b, b))
        qb = new("tsqr_QB", (max(1, cdiv(n_leaves, 2)) * b, max(1, depth) * b), (b, b))
        z = new("tsqr_Z", (n_leaves * b, (depth + 1) * b), (b, b))
        q = new("tsqr_Q", (n_leaves * tile_rows, b), (tile_rows, b))
        program = _template("tsqr_q").bind(
            A=a_t, Q0=q0, R=r, QT=qt, QB=qb, Z=z, Q=q, N=n_leaves, L=depth
        )
        outputs["Q"] = q
    else:
        qt = new("tsqr_QT", (max(1, cdiv(n_leaves, 2)) * b, max(1, depth) * b), (b, b))
        qb = new("tsqr_QB", (max(1, cdiv(n_leaves, 2)) * b, max(1, depth) * b), (b, b))
        program = _template("tsqr").bind(A=a_t, Q0=q0, R=r, QT=qt, QB=qb, N=n_leaves, L=depth)
    # fused-lowering knob: "tree" (robust combine tree) or "cholqr2"
    # (GEMM-only CholeskyQR2, ~20x faster on the MXU, needs moderate kappa)
    program.fused_options = {"tsqr_method": method, "b_fac": b_fac}
    meta = {"n_leaves": n_leaves, "depth": depth, "tile_rows": tile_rows, "b": b,
            "logical_m": m, "b_fac": b_fac}
    return program, outputs, meta


# ---------------------------------------------------------------------------
# BDFAC (block bidiagonalization)
# ---------------------------------------------------------------------------

def bdfac(X: MatLike, tile=None, storage: str = "hbm"):
    """Block bidiagonalization: returns (program, B_matrix, meta).

    B is block upper bidiagonal with the same singular values as X
    (orthogonal QR/LQ sweeps — reference alg_wrappers.bdfac). Requires a
    square tile grid."""
    tile = _default_tile(X, tile)
    if tile[0] != tile[1]:
        raise ShapeError("bdfac requires square tiles")
    x_t = _as_tiled(X, tile, storage)
    gm, gn = x_t.grid
    if gm != gn:
        raise ShapeError(f"bdfac requires a square tile grid, got {x_t.grid}")
    n = gm
    t = tile[0]
    dt = x_t.dtype

    def new(key, grid):
        return TiledMatrix(
            key=x_t.key + ":" + key, shape=(grid[0] * t, grid[1] * t), tile=tile,
            dtype=dt, storage=storage,
            fill=0.0 if storage == "hbm" else None,
            parent_fn=None if storage == "hbm" else (lambda m, i, j: np.zeros(m.tile, m.dtype)),
        )

    # S starts as a copy of X (version 0); sweeps rewrite it in place
    if storage == "hbm":
        s = TiledMatrix(key=x_t.key + ":bd_S", shape=x_t.shape, tile=tile, dtype=dt,
                        storage="hbm", fill=None)
        s.replace_array(x_t.to_hbm().array if x_t.storage != "hbm" else x_t.array)
    else:
        s = TiledMatrix(key=x_t.key + ":bd_S", shape=x_t.shape, tile=tile, dtype=dt,
                        storage="host",
                        parent_fn=lambda m, i, j: np.asarray(x_t.get_block(i, j)))

    b = new("bd_B", (n, n))
    scr = {
        "RA": new("bd_RA", (n, 1)), "LA": new("bd_LA", (n, 1)),
        "CA": new("bd_CA", (n, n)), "DA": new("bd_DA", (n, n)),
    }
    for q in ("QTT", "QTB", "QBT", "QBB", "PTT", "PTB", "PBT", "PBB"):
        scr[q] = new("bd_" + q, (n, n))

    program = _template("bdfac").bind(
        S=BoundArg(name="S", matrix=s, versioned=True),
        B=b,
        RA=BoundArg(name="RA", matrix=scr["RA"], versioned=True),
        CA=BoundArg(name="CA", matrix=scr["CA"], versioned=True),
        LA=BoundArg(name="LA", matrix=scr["LA"], versioned=True),
        DA=BoundArg(name="DA", matrix=scr["DA"], versioned=True),
        QTT=scr["QTT"], QTB=scr["QTB"], QBT=scr["QBT"], QBB=scr["QBB"],
        PTT=scr["PTT"], PTB=scr["PTB"], PBT=scr["PBT"], PBB=scr["PBB"],
        N=n,
    )
    meta = {"input": x_t, "scratch": scr, "tile": tile, "grid": n}
    return program, b, meta


def tsqr_r_factor(outputs) -> np.ndarray:
    """Extract the final R as numpy (upper-triangular b x b)."""
    i, l = outputs["R_block"]
    return np.asarray(outputs["R"].get_block(i, l))
