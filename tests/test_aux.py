"""Aux subsystem tests: checkpoint save/load + frontier scan, metrics,
CLI doctor (SURVEY §5)."""

import json
import logging

import numpy as np

import numpywren_tpu as npw
from numpywren_tpu import checkpoint, metrics
from numpywren_tpu.matrix_init import random_spd, shard_matrix


def test_save_load_matrix_roundtrip(tmp_path, rng):
    a = rng.standard_normal((96, 64)).astype(np.float32)
    m = shard_matrix(a, tile=(32, 32), storage="host", key="ck-test")
    path = str(tmp_path / "m.npz")
    checkpoint.save_matrix(m, path)
    m2 = checkpoint.load_matrix(path)
    assert m2.key == "ck-test" and m2.shape == (96, 64) and m2.tile == (32, 32)
    np.testing.assert_array_equal(m2.numpy(), a)


def test_save_load_sparse_and_symmetric(tmp_path, rng):
    a = random_spd(64, seed=0)
    m = shard_matrix(a, tile=(32, 32), storage="host", symmetric=True)
    path = str(tmp_path / "s.npz")
    checkpoint.save_matrix(m, path)
    m2 = checkpoint.load_matrix(path)
    assert type(m2).__name__ == "TiledSymmetricMatrix"
    np.testing.assert_allclose(m2.numpy(), a)


def test_program_frontier_resume_scan(rng):
    """Partially executed program: frontier must report done/ready correctly
    (the reference's block_idxs_exist resume scan)."""
    a = random_spd(96, seed=1)
    prog, l, meta = npw.cholesky(a, tile=(32, 32), storage="host")
    f0 = checkpoint.program_frontier(prog)
    assert f0["done"] == []
    assert set(f0["ready"]) == {nid for nid in range(prog.num_nodes)
                                if not prog.dag.parents[nid]}
    # execute only the first wavefront level by hand
    from numpywren_tpu.runtime.executor import execute_node_numpy

    for nid in prog.levels[0]:
        execute_node_numpy(prog, nid)
    f1 = checkpoint.program_frontier(prog)
    assert set(prog.levels[0]) <= set(f1["done"])
    assert all(nid not in f1["done"] or nid not in f1["pending"] for nid in range(prog.num_nodes))


def test_program_frontier_hbm_tier(rng):
    """VERDICT r1 What's weak #2: a freshly-bound HBM program must report an
    EMPTY done set (fill-allocation is not computation), and resume from a
    half-run state must complete with the correct factor."""
    from numpywren_tpu.runtime.executor import execute_node_numpy, run_program

    a = random_spd(128, seed=3)
    prog, l, meta = npw.cholesky(a, tile=(32, 32), storage="hbm")
    f0 = checkpoint.program_frontier(prog)
    assert f0["done"] == [], "fill=0 HBM allocation must not count as computed"
    assert set(f0["ready"]) == {nid for nid in range(prog.num_nodes)
                               if not prog.dag.parents[nid]}
    # half-run: execute the first two wavefront levels by hand
    for level in prog.levels[:2]:
        for nid in level:
            execute_node_numpy(prog, nid)
    f1 = checkpoint.program_frontier(prog)
    done = set(f1["done"])
    assert set(prog.levels[0]) | set(prog.levels[1]) <= done
    assert done != set(range(prog.num_nodes))
    # resume through the worker loop: only the frontier re-executes
    status = run_program(prog, executor="local", resume=True)
    assert status.name == "SUCCESS"
    lm = l.numpy()
    np.testing.assert_allclose(lm @ lm.T, a, rtol=1e-4, atol=1e-4)


def test_resume_spill_executor(rng):
    """Same resume contract through SpillTaskExecutor on the host tier."""
    from numpywren_tpu.runtime.executor import execute_node_numpy, run_program

    a = random_spd(96, seed=4)
    prog, l, meta = npw.cholesky(a, tile=(32, 32), storage="host")
    for nid in prog.levels[0]:
        execute_node_numpy(prog, nid)
    status = run_program(prog, executor="spill", resume=True)
    assert status.name == "SUCCESS"
    lm = l.numpy()
    np.testing.assert_allclose(lm @ lm.T, a, rtol=1e-4, atol=1e-4)


def test_hbm_written_semantics():
    """block_exists on the HBM tier means computed, not allocated; dense
    reads of unwritten blocks still return the fill."""
    from numpywren_tpu.tiled import TiledMatrix

    m = TiledMatrix(shape=(64, 64), tile=(32, 32), storage="hbm", fill=0.0)
    assert m.block_idxs_exist == []
    np.testing.assert_array_equal(np.asarray(m.get_block(0, 1)), 0.0)
    assert not m.block_exists(0, 1)  # dense read does not create the block
    m.put_block(np.ones((32, 32), np.float32), 0, 1)
    assert m.block_idxs_exist == [(0, 1)]
    m.delete_block(0, 1)
    assert m.block_idxs_exist == []
    np.testing.assert_array_equal(np.asarray(m.get_block(0, 1)), 0.0)
    # parent_fn staging caches but does not mark computed
    src = np.arange(32 * 32, dtype=np.float32).reshape(32, 32)
    p = TiledMatrix(shape=(32, 32), tile=(32, 32), storage="hbm",
                    parent_fn=lambda m_, i, j: src, fill=None)
    np.testing.assert_array_equal(np.asarray(p.get_block(0, 0)), src)
    assert not p.block_exists(0, 0)


def test_metrics_level_report(caplog):
    a = random_spd(96, seed=2)
    prog, l, _ = npw.cholesky(a, tile=(32, 32), storage="host")
    npw.run_program(prog, executor="local")
    recs = metrics.level_report(prog)
    assert len(recs) == len(prog.levels)
    assert all("wall_s" in r for r in recs)
    assert sum(sum(r["ops"].values()) for r in recs) == prog.num_nodes
    with caplog.at_level(logging.INFO, logger="numpywren_tpu"):
        metrics.log_program(prog)
    assert any("npw-step" in r.message for r in caplog.records)


def test_flop_meter(caplog):
    with caplog.at_level(logging.INFO, logger="numpywren_tpu"):
        with metrics.FlopMeter(flops=1e9, label="t") as m:
            pass
    assert m.tflops is not None and m.wall_s is not None


def test_cli_doctor_and_info(capsys):
    from numpywren_tpu import cli

    assert cli.main(["doctor"]) == 0
    out = capsys.readouterr().out
    assert "ok   fused cholesky program" in out
    assert cli.main(["info"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert len(info["devices"]) >= 1


def test_metrics_trace_noop_and_dir(tmp_path):
    from numpywren_tpu import metrics

    with metrics.trace(None):
        pass  # no-op path
    with metrics.trace(str(tmp_path / "prof")):
        import jax.numpy as jnp

        (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
