"""Native (C++) schedule core vs pure-Python compiler passes: the two must
produce IDENTICAL DAGs (nodes, edges, levels, initial reads) for every
algorithm template."""

import os

import numpy as np
import pytest

import numpywren_tpu as npw
from numpywren_tpu import native
from numpywren_tpu.matrix_init import random_spd

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native schedule core not built"
)


def _dag_fingerprint(prog):
    d = prog.dag
    nodes = [
        (n.stmt_id, n.op, n.var_values, n.reads, n.writes, n.consts,
         n.input_kinds, n.read_versions, n.write_versions)
        for n in d.nodes
    ]
    return {
        "nodes": nodes,
        "parents": d.parents,
        "levels": d.levels,
        "initial_reads": sorted(d.initial_reads),
    }


def _compare(make_program):
    os.environ["NPW_NATIVE"] = "1"
    try:
        p_native = make_program()
    finally:
        os.environ["NPW_NATIVE"] = "0"
    try:
        p_python = make_program()
    finally:
        os.environ.pop("NPW_NATIVE", None)
    fn, fp = _dag_fingerprint(p_native), _dag_fingerprint(p_python)
    assert fn["nodes"] == fp["nodes"]
    assert fn["parents"] == fp["parents"]
    assert fn["levels"] == fp["levels"]
    assert fn["initial_reads"] == fp["initial_reads"]


@pytest.mark.parametrize("n_tiles", [1, 2, 3, 5, 8])
def test_cholesky_native_matches_python(n_tiles):
    a = random_spd(n_tiles * 32, seed=0)
    _compare(lambda: npw.cholesky(a, tile=(32, 32), storage="host")[0])


@pytest.mark.parametrize("truncate", [1, 2, 4])
def test_cholesky_truncate_native(truncate):
    a = random_spd(160, seed=0)
    _compare(lambda: npw.cholesky(a, tile=(32, 32), storage="host",
                                  truncate=truncate)[0])


def test_gemm_native_matches_python(rng):
    a = rng.standard_normal((96, 64)).astype(np.float32)
    b = rng.standard_normal((64, 96)).astype(np.float32)
    _compare(lambda: npw.gemm(a, b, tile=(32, 32), storage="host")[0])


@pytest.mark.parametrize("leaves", [5, 8])
def test_tsqr_native_matches_python(rng, leaves):
    a = rng.standard_normal((leaves * 64, 32)).astype(np.float32)
    _compare(lambda: npw.tsqr(a, tile_rows=64, storage="host")[0])
    _compare(lambda: npw.tsqr(a, tile_rows=64, storage="host", compute_q=True)[0])


@pytest.mark.parametrize("leaves,b_fac", [(5, 4), (18, 3)])
def test_tsqr_kary_native_matches_python(rng, leaves, b_fac):
    """The k-ary reducer's nested if-chain (b**l bounds, ragged-tail
    conditions) must round-trip the C++ bytecode expr VM bit-exactly."""
    a = rng.standard_normal((leaves * 64, 32)).astype(np.float32)
    _compare(lambda: npw.tsqr(a, tile_rows=64, storage="host", b_fac=b_fac)[0])


@pytest.mark.parametrize("n_tiles", [1, 2, 4])
def test_bdfac_native_matches_python(rng, n_tiles):
    x = rng.standard_normal((n_tiles * 16, n_tiles * 16)).astype(np.float32)
    _compare(lambda: npw.bdfac(x, tile=(16, 16), storage="host")[0])


def test_native_runs_correctly():
    """End-to-end with the native-compiled schedule (not just structural)."""
    os.environ["NPW_NATIVE"] = "1"
    try:
        a = random_spd(128, seed=3)
        prog, l, _ = npw.cholesky(a, tile=(32, 32))
        npw.run_program(prog, executor="jax")
        ln = l.numpy()
        resid = np.linalg.norm(a - ln @ ln.T) / np.linalg.norm(a)
        assert resid < 1e-4
    finally:
        os.environ.pop("NPW_NATIVE", None)


def test_native_double_write_error():
    from numpywren_tpu.exceptions import CompilationError
    from numpywren_tpu.frontend import lpcompile
    from numpywren_tpu.tiled import TiledMatrix

    src = """
def bad(A, B, N):
    for i in range(0, N):
        B[0, 0] = copy(A[i, 0])
"""
    t = lpcompile(src)
    a = TiledMatrix(shape=(64, 32), tile=(32, 32), storage="host")
    b = TiledMatrix(shape=(32, 32), tile=(32, 32), storage="host")
    os.environ["NPW_NATIVE"] = "1"
    try:
        with pytest.raises(CompilationError):
            t.bind(A=a, B=b, N=2)
    finally:
        os.environ.pop("NPW_NATIVE", None)


def test_native_out_of_range_address_falls_back():
    """Addresses outside pack()'s bit budget (i/j >= 2^20, matrix id >= 128,
    version+1 >= 2^16) must NOT silently alias block keys: the core refuses
    with an "unsupported" error, and the default (auto) mode falls back to
    the Python passes, which handle any range (ADVICE r1)."""
    from numpywren_tpu.exceptions import CompilationError
    from numpywren_tpu.frontend import lpcompile
    from numpywren_tpu.tiled import TiledMatrix

    src = """
def big(A, C, BIG):
    for i in range(0, 1):
        C[i, 0] = copy(A[i + BIG, 0])
"""
    t = lpcompile(src)
    big = 1 << 21

    def mk():
        a = TiledMatrix(shape=((big + 1) * 8, 8), tile=(8, 8), storage="host")
        c = TiledMatrix(shape=(8, 8), tile=(8, 8), storage="host")
        return t.bind(A=a, C=c, BIG=big)

    # forced-native mode surfaces the refusal instead of corrupting the DAG
    os.environ["NPW_NATIVE"] = "1"
    try:
        with pytest.raises(CompilationError):
            mk()
    finally:
        os.environ.pop("NPW_NATIVE", None)
    # auto mode: silent fallback to the Python passes, correct addresses
    prog = mk()
    assert prog.num_nodes == 1
    assert prog.dag.nodes[0].reads[0] == ("A", big, 0)
