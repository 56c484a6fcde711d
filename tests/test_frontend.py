"""Frontend/compiler tests: parse DSL, check loop bounds, access sets, and
dependency sets against hand-computed values (reference tests/test_frontend
pattern, SURVEY §4.4)."""

import numpy as np
import pytest

from numpywren_tpu import algs
from numpywren_tpu.exceptions import CompilationError
from numpywren_tpu.frontend import lpcompile
from numpywren_tpu.frontend.ir import BoundArg
from numpywren_tpu.tiled import TiledMatrix


def _mat(key, g, t=8, tile=None):
    tile = tile or (t, t)
    return TiledMatrix(key=key, shape=(g * tile[0], g * tile[1]), tile=tile, storage="host",
                       parent_fn=lambda m, i, j: np.zeros(m.tile, m.dtype))


def test_parse_cholesky():
    t = lpcompile(algs.cholesky)
    assert t.name == "cholesky"
    assert [s.op for s in t.statements] == ["potrf", "trsm", "syrk"]
    assert t.statements[2].loop_vars == ("k", "i", "j")


def test_bind_counts_nodes():
    g = 4
    o, s = _mat("O", g), _mat("S", g)
    prog = lpcompile(algs.cholesky).bind(O=o, S=BoundArg("S", s, versioned=True), N=g, truncate=0)
    # potrf: g, trsm: g(g-1)/2, syrk: sum_{k} T(g-1-k) where T(m)=m(m+1)/2
    n_potrf = g
    n_trsm = g * (g - 1) // 2
    n_syrk = sum((g - 1 - k) * (g - k) // 2 for k in range(g))
    assert prog.num_nodes == n_potrf + n_trsm + n_syrk
    stats = prog.dag.stats()
    assert stats["ops"] == {"potrf": n_potrf, "trsm": n_trsm, "syrk": n_syrk}


def test_cholesky_dependencies_hand_computed():
    """Spot-check the DAG against hand-derived parents for G=3."""
    g = 3
    o, s = _mat("O", g), _mat("S", g)
    prog = lpcompile(algs.cholesky).bind(O=o, S=BoundArg("S", s, versioned=True), N=g, truncate=0)
    nodes = {(n.op, n.var_values): n.node_id for n in prog.dag.nodes}
    # potrf(k=0) has no parents
    assert prog.get_parents(nodes[("potrf", (0,))]) == []
    # trsm(k=0, i=1) depends only on potrf(0)
    assert prog.get_parents(nodes[("trsm", (0, 1))]) == [nodes[("potrf", (0,))]]
    # syrk(k=0, i=1, j=1) reads O[1,0] twice -> parent trsm(0,1)
    assert prog.get_parents(nodes[("syrk", (0, 1, 1))]) == [nodes[("trsm", (0, 1))]]
    # potrf(k=1) reads S[1,1,1] -> parent syrk(0,1,1)
    assert prog.get_parents(nodes[("potrf", (1,))]) == [nodes[("syrk", (0, 1, 1))]]
    # syrk(1,2,2) parents: version chain WAR/RAW: syrk(0,2,2), trsm(1,2)
    parents = set(prog.get_parents(nodes[("syrk", (1, 2, 2))]))
    assert nodes[("syrk", (0, 2, 2))] in parents
    assert nodes[("trsm", (1, 2))] in parents


def test_wavefront_levels():
    g = 3
    o, s = _mat("O", g), _mat("S", g)
    prog = lpcompile(algs.cholesky).bind(O=o, S=BoundArg("S", s, versioned=True), N=g, truncate=0)
    lv = prog.dag.node_level
    nodes = {(n.op, n.var_values): n.node_id for n in prog.dag.nodes}
    assert lv[nodes[("potrf", (0,))]] == 0
    assert lv[nodes[("trsm", (0, 2))]] == 1
    assert lv[nodes[("syrk", (0, 2, 1))]] == 2
    assert lv[nodes[("potrf", (1,))]] == 3
    # critical path: 3 levels per iteration except last (potrf only)
    assert len(prog.levels) == 3 * (g - 1) + 1


def test_double_write_rejected():
    src = """
def bad(O, N):
    for i in range(0, N):
        O[0, 0] = identity(O[i, 0])
"""
    t = lpcompile(src)
    with pytest.raises(CompilationError, match="double write"):
        t.bind(O=_mat("O", 2), N=2)


def test_self_read_rejected():
    src = """
def bad(O, N):
    for i in range(0, N):
        O[i, 0] = identity(O[i, 0])
"""
    t = lpcompile(src)
    with pytest.raises(CompilationError, match="reads its own output"):
        t.bind(O=_mat("O", 2), N=2)


def test_unknown_kernel_rejected():
    src = """
def bad(O):
    O[0, 0] = frobnicate(O[0, 1])
"""
    with pytest.raises(CompilationError, match="unknown kernel"):
        lpcompile(src)


def test_unbound_arg_rejected():
    t = lpcompile(algs.cholesky)
    with pytest.raises(CompilationError, match="unbound"):
        t.bind(N=2, truncate=0)


def test_truncate_prefix():
    g = 4
    o, s = _mat("O", g), _mat("S", g)
    full = lpcompile(algs.cholesky).bind(O=o, S=BoundArg("S", s, versioned=True), N=g, truncate=0)
    o2, s2 = _mat("O", g), _mat("S", g)
    pre = lpcompile(algs.cholesky).bind(O=o2, S=BoundArg("S", s2, versioned=True), N=g, truncate=2)
    assert pre.num_nodes < full.num_nodes
    ks = {n.var_values[0] for n in pre.dag.nodes}
    assert ks == {0, 1}


def test_nonaffine_tree_enumeration():
    """The TSQR tree (2**l bounds) enumerates concretely — beyond the
    reference's affine-only solver."""
    t = lpcompile(algs.tsqr)
    n, depth = 5, 3
    a = _mat("A", 1, tile=(16, 8))
    a = TiledMatrix(key="A", shape=(n * 16, 8), tile=(16, 8), storage="host",
                    parent_fn=lambda m, i, j: np.zeros(m.tile, m.dtype))
    q0 = TiledMatrix(key="Q0", shape=(n * 16, 8), tile=(16, 8), storage="host")
    r = TiledMatrix(key="R", shape=(n * 8, (depth + 1) * 8), tile=(8, 8), storage="host")
    qt = TiledMatrix(key="QT", shape=(3 * 8, depth * 8), tile=(8, 8), storage="host")
    qb = TiledMatrix(key="QB", shape=(3 * 8, depth * 8), tile=(8, 8), storage="host")
    prog = t.bind(A=a, Q0=q0, R=r, QT=qt, QB=qb, N=n, L=depth)
    ops = prog.dag.stats()["ops"]
    assert ops["qr_leaf"] == 5
    # level 0: 2 combines (0+1, 2+3) + 1 passthrough(4); level 1: 1 combine + 1 pass; level 2: 1 combine
    assert ops["qr_combine"] == 4
    assert ops["copy"] == 2


def test_chained_gemm_dsl_program():
    """Arbitrary user DSL programs (BASELINE config #5 'GEMM chains'): two
    chained matmul statements compile and run through the generic executor."""
    import numpy as np
    import numpywren_tpu as npw
    from numpywren_tpu.frontend import lpcompile
    from numpywren_tpu.frontend.ir import BoundArg
    from numpywren_tpu.matrix_init import shard_matrix
    from numpywren_tpu.tiled import TiledMatrix

    src = """
def gemm_chain(A, B, E, C, D, M, N, K, P):
    for i in range(0, M):
        for j in range(0, N):
            for k in range(0, K):
                C[i, j, k + 1] = gemm_acc(C[i, j, k], A[i, k], B[k, j])
    for i in range(0, M):
        for j in range(0, P):
            for k in range(0, N):
                D[i, j, k + 1] = gemm_acc(D[i, j, k], C[i, k, K], E[k, j])
"""
    t = lpcompile(src)
    rng = np.random.default_rng(0)
    a = rng.standard_normal((64, 96)).astype(np.float32)
    b = rng.standard_normal((96, 64)).astype(np.float32)
    e = rng.standard_normal((64, 32)).astype(np.float32)
    at = shard_matrix(a, tile=(32, 32))
    bt = shard_matrix(b, tile=(32, 32))
    et = shard_matrix(e, tile=(32, 32))
    c = TiledMatrix(shape=(64, 64), tile=(32, 32), storage="hbm", fill=0.0)
    d = TiledMatrix(shape=(64, 32), tile=(32, 32), storage="hbm", fill=0.0)
    prog = t.bind(
        A=at, B=bt, E=et,
        C=BoundArg(name="C", matrix=c, versioned=True),
        D=BoundArg(name="D", matrix=d, versioned=True),
        M=2, N=2, K=3, P=1,
    )
    npw.run_program(prog, executor="jax")
    np.testing.assert_allclose(d.numpy(), (a @ b) @ e, rtol=1e-3, atol=1e-3)


def test_reducer_construct_matches_explicit_tree():
    """The `reducer` macro must expand to exactly the explicit log-depth
    combine-tree loops of algs.tsqr (reference reducer parity)."""
    import numpy as np
    import numpywren_tpu as npw
    from numpywren_tpu.frontend import lpcompile
    from numpywren_tpu import algs

    src = """
def tsqr_red(A, Q0, R, QT, QB, N, L):
    for i in range(0, N):
        Q0[i, 0], R[i, 0] = qr_leaf(A[i, 0])
    reducer(R, QT, QB, qr_combine, copy, N, L)
"""
    t_red = lpcompile(src)
    t_exp = lpcompile(algs.tsqr)
    # same statement ops in the same structural order
    assert [s.op for s in t_red.statements] == [s.op for s in t_exp.statements]
    # and execution-level equality on a real input
    rng = np.random.default_rng(0)
    a = rng.standard_normal((5 * 32, 16)).astype(np.float32)
    from numpywren_tpu.alg_wrappers import _templates

    saved = _templates.pop("tsqr", None)
    try:
        _templates["tsqr"] = t_red  # splice the reducer version in
        prog, outs, meta = npw.tsqr(a, tile_rows=32)
        npw.run_program(prog, executor="jax")
        r = npw.tsqr_r_factor(outs)
        np.testing.assert_allclose(r.T @ r, a.T @ a, rtol=1e-3, atol=1e-2)
    finally:
        _templates.pop("tsqr", None)
        if saved is not None:
            _templates["tsqr"] = saved


def test_reducer_arity_errors():
    from numpywren_tpu.exceptions import CompilationError
    from numpywren_tpu.frontend import lpcompile
    import pytest as _pytest

    bad = """
def f(A, R, N, L):
    reducer(R, qr_combine, copy, N, L)
"""
    with _pytest.raises(CompilationError):
        lpcompile(bad)  # qr_combine needs 2 extra outputs


def test_reducer_kary_expansion():
    """b_fac=4 `reducer` (reference reducer's branching factor, SURVEY §2
    L5): one level-0 full group of 4 + one passthrough, then a final pair —
    5 -> 2 -> 1 at depth ceil(log4 5) = 2."""
    from numpywren_tpu.frontend import lpcompile
    from numpywren_tpu.tiled import TiledMatrix

    src = """
def tsqr4(A, Q0, R, N, L):
    for i in range(0, N):
        Q0[i, 0], R[i, 0] = qr_leaf(A[i, 0])
    reducer(R, qr_combine_r, copy, N, L, b_fac=4)
"""
    t = lpcompile(src)
    n, depth = 5, 2
    a = TiledMatrix(key="A", shape=(n * 16, 8), tile=(16, 8), storage="host",
                    parent_fn=lambda m, i, j: np.zeros(m.tile, m.dtype))
    q0 = TiledMatrix(key="Q0", shape=(n * 16, 8), tile=(16, 8), storage="host")
    r = TiledMatrix(key="R", shape=(n * 8, (depth + 1) * 8), tile=(8, 8), storage="host")
    prog = t.bind(A=a, Q0=q0, R=r, N=n, L=depth)
    ops = prog.dag.stats()["ops"]
    assert ops["qr_leaf"] == 5
    assert ops["qr_combine_r4"] == 1  # level 0: leaves 0-3
    assert ops["copy"] == 1           # level 0: leaf 4 passes through
    assert ops["qr_combine_r2"] == 1  # level 1: the final pair
    assert "qr_combine_r3" not in ops


def test_reducer_kary_errors():
    from numpywren_tpu.exceptions import CompilationError
    from numpywren_tpu.frontend import lpcompile
    import pytest as _pytest

    with _pytest.raises(CompilationError):  # b_fac must be a literal int
        lpcompile("""
def f(A, R, N, L, B):
    reducer(R, qr_combine_r, copy, N, L, b_fac=B)
""")
    with _pytest.raises(CompilationError):  # arity 9 kernels not registered
        lpcompile("""
def f(A, R, N, L):
    reducer(R, qr_combine_r, copy, N, L, b_fac=9)
""")
    with _pytest.raises(CompilationError):  # no qr_combine3/4 family exists
        lpcompile("""
def f(A, R, QT, QB, N, L):
    reducer(R, QT, QB, qr_combine, copy, N, L, b_fac=4)
""")
