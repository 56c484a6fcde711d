"""Lookahead scheduling for GENERIC DSL programs (VERDICT r3 missing #3 /
SURVEY §7 layer 4): the depth-priority schedule transform in
compiler.schedule.grouped_schedule, the priority-queue LocalExecutor
(reference: multiple SQS queues as priority levels, lambdapack.py post_op
queue choice), and the pipelined SpillTaskExecutor (reference:
job_runner.py pipeline_width I/O-compute overlap)."""

import threading

import numpy as np
import pytest
import scipy.linalg

from numpywren_tpu import alg_wrappers
from numpywren_tpu.compiler.schedule import (
    critical_path_priority,
    grouped_schedule,
)
from numpywren_tpu.matrix_init import random_spd, shard_matrix
from numpywren_tpu.runtime import PS, run_program
from numpywren_tpu.runtime.executor import LocalExecutor, SpillTaskExecutor


def _cholesky_prog(n=192, tile=32, storage="host", seed=0):
    a = random_spd(n, seed=seed)
    prog, out, _ = alg_wrappers.cholesky(a, tile=(tile, tile), storage=storage)
    return a, prog, out


def _group_positions(sched, dag):
    """(op, step) -> [positions in the group sequence]."""
    pos = {}
    for g, (_sid, _consts, members) in enumerate(sched):
        n = dag.nodes[members[0]]
        pos.setdefault((n.op, n.var_values[0]), []).append(g)
    return pos


def test_lookahead_hoists_next_panel():
    """In the lookahead group order, potrf of step k+1 is emitted BEFORE
    the last syrk group of step k (the reference's signature DAG overlap:
    panel k+1 during trailing update k). The wavefront order provably does
    not have this property — strict levels."""
    _, prog, _ = _cholesky_prog()
    dag = prog.dag

    look = _group_positions(grouped_schedule(dag, "lookahead"), dag)
    wave = _group_positions(grouped_schedule(dag, "wavefront"), dag)
    n_steps = max(k for (op, k) in look if op == "potrf") + 1
    assert n_steps >= 4
    # the last step is degenerate (potrf N-1 depends on the only remaining
    # syrk), so hoisting is only possible while a bulk trailing set exists
    for k in range(n_steps - 2):
        assert look[("potrf", k + 1)][0] < max(look[("syrk", k)]), (
            f"step {k}: potrf {k+1} not hoisted before bulk syrk {k}"
        )
        # wavefront: potrf k+1 strictly after every syrk-k group
        assert wave[("potrf", k + 1)][0] > max(wave[("syrk", k)])


def test_lookahead_covers_all_nodes_valid_topo():
    """Every node appears exactly once and group order respects edges."""
    _, prog, _ = _cholesky_prog(n=160)
    dag = prog.dag
    sched = grouped_schedule(dag, "lookahead")
    seen = {}
    for g, (_sid, _consts, members) in enumerate(sched):
        for nid in members:
            assert nid not in seen
            seen[nid] = g
    assert len(seen) == dag.num_nodes
    for nid, ps in enumerate(dag.parents):
        for p in ps:
            assert seen[p] < seen[nid]
    # groups are internally independent (batched-kernel contract)
    for _sid, _consts, members in sched:
        ms = set(members)
        for nid in members:
            assert not (ms & set(dag.parents[nid]))


def test_priority_decreases_toward_sinks():
    _, prog, _ = _cholesky_prog(n=160)
    dag = prog.dag
    prio = critical_path_priority(dag)
    for nid, cs in enumerate(dag.children):
        for c in cs:
            assert prio[nid] > prio[c]


@pytest.mark.parametrize("policy", ["wavefront", "lookahead"])
def test_jax_executor_policy_parity(policy):
    a, prog, out = _cholesky_prog(n=160, storage="hbm", seed=2)
    status = run_program(prog, executor="jax", schedule_policy=policy)
    assert status == PS.SUCCESS
    l = np.tril(out.numpy())
    ref = scipy.linalg.cholesky(a.astype(np.float64), lower=True)
    np.testing.assert_allclose(l, ref, rtol=5e-3, atol=5e-4)


@pytest.mark.parametrize("policy", ["wavefront", "lookahead"])
def test_spill_executor_policy_parity(policy):
    a, prog, out = _cholesky_prog(n=160, seed=3)
    status = SpillTaskExecutor(prog, schedule_policy=policy).run()
    assert status == PS.SUCCESS
    l = np.tril(out.numpy())
    resid = np.linalg.norm(a - l @ l.T) / np.linalg.norm(a)
    assert resid < 1e-5


def test_local_executor_priority_order():
    """Single worker + priority queue: the next panel's potrf runs before
    step k's bulk trailing updates whenever both are ready — the
    reference's priority-queue behavior. FIFO (prioritize=False) finishes
    all of step k's syrks first."""
    a, prog, out = _cholesky_prog(n=192, seed=4)
    ex = LocalExecutor(prog, num_workers=1)
    assert ex.run() == PS.SUCCESS
    nodes = prog.dag.nodes
    order = {nid: i for i, nid in enumerate(ex.execution_order)}
    n_steps = max(n.var_values[0] for n in nodes if n.op == "potrf") + 1
    hoisted = 0
    for k in range(n_steps - 1):
        potrf_pos = next(order[n.node_id] for n in nodes
                         if n.op == "potrf" and n.var_values[0] == k + 1)
        last_syrk = max(order[n.node_id] for n in nodes
                        if n.op == "syrk" and n.var_values[0] == k)
        hoisted += potrf_pos < last_syrk
    assert hoisted >= n_steps - 2, "priority queue never hoisted a panel"
    l = np.tril(out.numpy())
    assert np.linalg.norm(a - l @ l.T) / np.linalg.norm(a) < 1e-5


def test_local_executor_fifo_still_works():
    a, prog, out = _cholesky_prog(n=128, seed=5)
    ex = LocalExecutor(prog, num_workers=2, prioritize=False)
    assert ex.run() == PS.SUCCESS
    l = np.tril(out.numpy())
    assert np.linalg.norm(a - l @ l.T) / np.linalg.norm(a) < 1e-5


def test_spill_pipeline_prefetch_overlap():
    """Gated-event proof that group 1's tile gather runs OFF the main loop
    while group 0 computes: the main thread blocks at compute(0) until the
    prefetch thread reports prefetch_done(1) — a synchronous executor
    (gather at group start, the round-3 behavior) never emits it before
    compute(0) and would deadlock here (bounded timeout)."""
    a, prog, out = _cholesky_prog(n=192, seed=6)

    events = []
    done1 = threading.Event()

    def hook(kind, g):
        events.append((kind, g))
        if kind == "prefetch_done" and g == 1:
            done1.set()
        if kind == "compute" and g == 0:
            ok = done1.wait(timeout=60)
            assert ok, "prefetch(1) never completed while compute(0) waited"

    ex = SpillTaskExecutor(prog, pipeline_width=2, on_event=hook)
    assert ex.run() == PS.SUCCESS
    assert done1.is_set()
    l = np.tril(out.numpy())
    assert np.linalg.norm(a - l @ l.T) / np.linalg.norm(a) < 1e-5


def test_spill_pipeline_issue_before_compute():
    """Ordering invariant (cheap, deterministic): prefetch_issue(g+1)
    precedes compute(g) for every pipelined group."""
    a, prog, out = _cholesky_prog(n=160, seed=7)
    events = []
    ex = SpillTaskExecutor(prog, pipeline_width=2,
                           on_event=lambda k, g: events.append((k, g)))
    assert ex.run() == PS.SUCCESS
    idx = {}
    for i, e in enumerate(events):
        idx.setdefault(e, i)
    n_groups = max(g for (k, g) in events if k == "compute") + 1
    for g in range(n_groups - 1):
        assert idx[("prefetch_issue", g + 1)] < idx[("compute", g)], events


@pytest.mark.parametrize("policy", ["wavefront", "lookahead"])
def test_bdfac_through_lookahead_spill(policy):
    """The heaviest DSL program (bdfac: versioned S with WAR chains,
    multi-output pairwise kernels) through the pipelined spill executor
    under both schedule policies — sigma parity proves the group order
    and prefetch bookkeeping respect every version edge."""
    from numpywren_tpu import alg_wrappers

    rng = np.random.default_rng(8)
    n, t = 128, 32
    x = rng.standard_normal((n, n)).astype(np.float32)
    prog, b_mat, _ = alg_wrappers.bdfac(x, tile=(t, t), storage="host")
    ex = SpillTaskExecutor(prog, schedule_policy=policy, pipeline_width=2)
    assert ex.run() == PS.SUCCESS
    b = b_mat.numpy()
    s = np.linalg.svd(b.astype(np.float64), compute_uv=False)
    s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(s, s_ref, atol=2e-4 * s_ref[0], rtol=0)


@pytest.mark.parametrize("policy", ["wavefront", "lookahead"])
def test_tsqr_q_through_lookahead_jax(policy):
    """tsqr_q (tree + downward Z sweep, cdiv bounds, multi-output
    qr_combine) through JaxTaskExecutor under both policies."""
    from numpywren_tpu import alg_wrappers

    rng = np.random.default_rng(9)
    x = rng.standard_normal((5 * 64, 32)).astype(np.float32)
    prog, outs, meta = alg_wrappers.tsqr(x, tile_rows=64, storage="hbm",
                                         compute_q=True)
    from numpywren_tpu.runtime.executor import JaxTaskExecutor

    assert JaxTaskExecutor(prog, schedule_policy=policy).run() == PS.SUCCESS
    q = outs["Q"].numpy()
    np.testing.assert_allclose(q @ (q.T @ x), x, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(q.T @ q, np.eye(32), atol=1e-4)


def test_jax_executor_repeated_run_reuses_jit():
    """run() must be re-callable without retracing (VERDICT r4 weak #7
    follow-up: timing loops over a generic DSL program would otherwise pay
    a full recompile per call). Second run re-executes the cached program
    on the current arrays — for gemm with fresh inputs that means the same
    correct product again."""
    from numpywren_tpu import alg_wrappers
    from numpywren_tpu.runtime.executor import JaxTaskExecutor

    rng = np.random.default_rng(11)
    a = rng.standard_normal((128, 96)).astype(np.float32)
    b = rng.standard_normal((96, 64)).astype(np.float32)
    prog, c_mat, meta = alg_wrappers.gemm(a, b, tile=(32, 32), storage="hbm")
    ex = JaxTaskExecutor(prog, donate=False)
    assert ex.run() == PS.SUCCESS
    np.testing.assert_allclose(c_mat.numpy(), a @ b, rtol=1e-4, atol=1e-4)
    fn_first = ex._fn
    assert ex.run() == PS.SUCCESS  # same jit instance -> trace-cache hit
    assert ex._fn is fn_first
    np.testing.assert_allclose(c_mat.numpy(), a @ b, rtol=1e-4, atol=1e-4)
