"""Sympy on-demand dependency solver vs the materialized DAG: the solver's
get_children/get_parents (reference semantics) must agree with the static
schedule's RAW edges on the affine cholesky program, and handle the
non-affine TSQR tree by bounded enumeration."""

import numpy as np
import pytest

from numpywren_tpu import algs
from numpywren_tpu.frontend import DependencySolver, lpcompile
from numpywren_tpu.frontend.ir import BoundArg
from numpywren_tpu.tiled import TiledMatrix


def _mat(key, gm, gn=None, tile=(8, 8)):
    gn = gn or gm
    return TiledMatrix(key=key, shape=(gm * tile[0], gn * tile[1]), tile=tile, storage="host",
                       parent_fn=lambda m, i, j: np.zeros(m.tile, m.dtype))


def test_solver_matches_dag_cholesky():
    g = 4
    t = lpcompile(algs.cholesky)
    prog = t.bind(O=_mat("O", g), S=BoundArg("S", _mat("S", g), versioned=True), N=g, truncate=0)
    solver = DependencySolver(t, {"N": g, "truncate": 0})

    id_of = {(n.stmt_id, n.var_values): n.node_id for n in prog.dag.nodes}
    for n in prog.dag.nodes:
        got_children = {
            id_of[c] for c in solver.get_children(n.stmt_id, n.var_values) if c in id_of
        }
        # the DAG also contains WAR edges from versioned in-place lowering;
        # the solver covers the RAW dataflow, so it must be a superset of
        # nothing and a subset match on RAW-only children
        raw_children = set()
        for c in prog.dag.children[n.node_id]:
            cn = prog.dag.nodes[c]
            reads = set(zip(cn.reads, cn.read_versions))
            writes = set(zip(n.writes, n.write_versions))
            if reads & writes:
                raw_children.add(c)
        assert raw_children <= got_children, (n.op, n.var_values)


def test_solver_children_potrf():
    g = 4
    t = lpcompile(algs.cholesky)
    solver = DependencySolver(t, {"N": g, "truncate": 0})
    # potrf(k=1) writes O[1,1]; readers: trsm(k=1, i=2..3)
    children = solver.get_children(0, (1,))
    assert children == [(1, (1, 2)), (1, (1, 3))]


def test_solver_parents_trsm():
    g = 4
    t = lpcompile(algs.cholesky)
    solver = DependencySolver(t, {"N": g, "truncate": 0})
    # trsm(k=1, i=3) reads S[3,1,1] (written by syrk(0,3,1)) and O[1,1] (potrf(1))
    parents = solver.get_parents(1, (1, 3))
    assert (0, (1,)) in parents
    assert (2, (0, 3, 1)) in parents


def test_solver_nonaffine_tsqr():
    t = lpcompile(algs.tsqr)
    consts = {"N": 5, "L": 3}
    solver = DependencySolver(t, consts)
    # leaf 4's R[4,0]: at level 0, cdiv(5,1)=5 nodes; i=2: 2*2+1=5 not <5 ->
    # passthrough copy reads R[4,0]
    children = solver.get_children(0, (4,))  # stmt 0 = qr_leaf, writes Q0[4,0], R[4,0]
    ops = [t.statements[s].op for s, _ in children]
    assert "copy" in ops
    copy_child = [c for c in children if t.statements[c[0]].op == "copy"][0]
    assert copy_child[1] == (0, 2)  # l=0, i=2


@pytest.mark.parametrize("alg,consts", [
    ("cholesky", {"N": 4, "truncate": 0}),
    ("tsqr", {"N": 5, "L": 3}),
    ("tsqr_b4", {"N": 5, "L": 2}),
])
def test_solver_agrees_with_static_schedule(alg, consts):
    """Property cross-check (SURVEY §4.4): the on-demand solver's
    parent/child sets must equal the compiled static DAG's RAW edges for
    every node. (WAR edges are a schedule-compiler addition for in-place
    version reuse and are excluded: the solver reasons in pure SSA space.)"""
    import numpy as np

    import numpywren_tpu as npw
    from numpywren_tpu.matrix_init import random_spd

    if alg == "cholesky":
        prog, _, _ = npw.cholesky(random_spd(4 * 16, seed=0), tile=(16, 16),
                                  storage="host")
        t = lpcompile(algs.cholesky)
    elif alg == "tsqr_b4":
        # k-ary reducer: the solver must handle the nested ragged-tail
        # conditions (4**l bounds) by bounded enumeration
        rng = np.random.default_rng(0)
        prog, _, _ = npw.tsqr(rng.standard_normal((5 * 32, 16)).astype(np.float32),
                              tile_rows=32, storage="host", b_fac=4)
        t = prog.dag.template
    else:
        rng = np.random.default_rng(0)
        prog, _, _ = npw.tsqr(rng.standard_normal((5 * 32, 16)).astype(np.float32),
                              tile_rows=32, storage="host")
        t = lpcompile(algs.tsqr)
    solver = DependencySolver(t, consts)

    id_of = {(n.stmt_id, n.var_values): n.node_id for n in prog.dag.nodes}
    for n in prog.dag.nodes:
        solver_children = {
            id_of[c] for c in solver.get_children(n.stmt_id, n.var_values)
            if c in id_of
        }
        # static children = RAW only: child reads something n wrote
        writes = set(zip(n.writes, n.write_versions))
        raw_children = {
            c for c in prog.dag.children[n.node_id]
            if writes & set(zip(prog.dag.nodes[c].reads,
                                prog.dag.nodes[c].read_versions))
        }
        assert raw_children == solver_children, (
            f"node {n.node_id} S{n.stmt_id}{n.var_values}: "
            f"static {sorted(raw_children)} vs solver {sorted(solver_children)}"
        )
