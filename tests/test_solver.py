"""Sympy on-demand dependency solver vs the materialized DAG: the solver's
get_children/get_parents (reference semantics) must agree with the static
schedule's RAW edges on the affine cholesky program, and handle the
non-affine TSQR tree by bounded enumeration."""

import numpy as np

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
