"""Executors: run a compiled TiledProgram.

LocalExecutor — in-process rebuild of the reference worker loop
(numpywren/job_runner.py :: lambdapack_run / LambdaPackExecutor): N threads
stand in for Lambda workers, a shared queue for SQS, program CAS transitions
for Redis. At-least-once delivery and idempotent writes are preserved, and
fault injection (reference: lambdapack_run_with_failures) kills a fraction
of tasks mid-flight to exercise redelivery + re-execution.

JaxTaskExecutor — the TPU path: executes the static schedule level by level;
within a level, instances of the same statement are batched into one stacked
device op (tile gather -> batched kernel -> tile scatter), the whole run
traced into a single jit. This is the generic lowering that works for ANY
DSL program; the region-fused lowering in compiler.lower specializes
contiguous tile regions into large unstacked MXU ops.
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Dict, List, Optional

import numpy as np

from numpywren_tpu import kernels
from numpywren_tpu.exceptions import TiledProgramExecutionError
from numpywren_tpu.runtime.program import NS, PS, TiledProgram


# ---------------------------------------------------------------------------
# Shared: execute one node with numpy kernels against TiledMatrix storage
# ---------------------------------------------------------------------------

def _node_args(program: TiledProgram, node):
    args = []
    r_it = iter(node.reads)
    c_it = iter(node.consts)
    for kind in node.input_kinds:
        if kind == "block":
            name, i, j = next(r_it)
            args.append(np.asarray(program.matrices[name].matrix.get_block(i, j)))
        else:
            args.append(next(c_it))
    return args


def execute_node_numpy(program: TiledProgram, node_id: int):
    node = program.node(node_id)
    args = _node_args(program, node)
    outs = kernels.KERNELS[node.op](*args)
    if not isinstance(outs, tuple):
        outs = (outs,)
    wvers = node.write_versions or (None,) * len(node.writes)
    for (name, i, j), out, ver in zip(node.writes, outs, wvers):
        ba = program.matrices[name]
        ba.matrix.put_block(out, i, j)
        ba.note_write((i, j), ver)


# ---------------------------------------------------------------------------
# LocalExecutor: dynamic queue semantics, threads, fault injection
# ---------------------------------------------------------------------------

class LocalExecutor:
    def __init__(
        self,
        program: TiledProgram,
        num_workers: Optional[int] = None,
        fault_rate: float = 0.0,
        seed: int = 0,
        duplicate_rate: float = 0.0,
        prioritize: bool = True,
    ):
        if num_workers is None:
            from numpywren_tpu.config import default_config

            num_workers = default_config().max_workers
        self.program = program
        self.num_workers = num_workers
        self.fault_rate = fault_rate
        self.duplicate_rate = duplicate_rate
        self._rng = random.Random(seed)
        self._rng_lock = threading.Lock()
        # critical-path priority queue (the reference's multiple SQS queues
        # as priority levels — upstream:numpywren/lambdapack.py post_op
        # queue choice): the next panel's factor/solve nodes jump ahead of
        # bulk trailing updates. prioritize=False keeps plain FIFO.
        self.prioritize = prioritize
        if prioritize:
            from numpywren_tpu.compiler.schedule import critical_path_priority

            self._prio = critical_path_priority(program.dag)
            self._q: "queue.Queue" = queue.PriorityQueue()
        else:
            self._prio = None
            self._q = queue.Queue()
        self._error: Optional[BaseException] = None
        self.execution_order: List[int] = []  # completed node ids, in order

    def _rand(self) -> float:
        with self._rng_lock:
            return self._rng.random()

    def _entry(self, nid: int):
        if self._prio is not None:
            return (-self._prio[nid], nid)
        return nid

    def _nid(self, entry) -> int:
        return entry[1] if self._prio is not None else entry

    def run(self, timeout: Optional[float] = None, resume: bool = False) -> PS:
        """resume=True re-scans output blocks (the reference's
        block_idxs_exist restart path) and only enqueues the frontier."""
        if resume:
            from numpywren_tpu.checkpoint import program_frontier

            frontier = program_frontier(self.program)
            roots = self.program.start(done=frontier["done"])
            if self.program.program_status == PS.SUCCESS:
                return PS.SUCCESS
        else:
            roots = self.program.start()
        for nid in roots:
            self._q.put(self._entry(nid))
            if self._rand() < self.duplicate_rate:
                self._q.put(self._entry(nid))  # at-least-once: duplicate message
        workers = [
            threading.Thread(target=self._worker_loop, name=f"npw-worker-{w}", daemon=True)
            for w in range(self.num_workers)
        ]
        for w in workers:
            w.start()
        status = self.program.wait(timeout=timeout)
        for w in workers:
            w.join(timeout=5.0)
        if self._error is not None and status != PS.SUCCESS:
            raise TiledProgramExecutionError("<worker>", self._error)
        return status

    def _worker_loop(self):
        """The reference hot loop (SURVEY §3.2): dequeue -> CAS READY->RUNNING
        -> read blocks -> kernel -> write blocks -> post_op -> enqueue
        children. Losing the CAS race (duplicate delivery) drops the message."""
        program = self.program
        while program.program_status == PS.RUNNING:
            try:
                nid = self._nid(self._q.get(timeout=0.05))
            except queue.Empty:
                continue
            if not program.cas_node_status(nid, NS.READY, NS.RUNNING):
                continue  # another worker won the race; drop the message
            try:
                # fault injection: worker "dies" mid-task. The node goes back
                # to READY and the message is redelivered (the in-process
                # stand-in for an SQS visibility-timeout expiry).
                if self._rand() < self.fault_rate:
                    program.set_node_status(nid, NS.READY)
                    self._q.put(self._entry(nid))
                    continue
                execute_node_numpy(program, nid)
            except BaseException as e:  # noqa: BLE001 - worker must report
                self._error = e
                program.post_op(nid, success=False)
                return
            children = program.post_op(nid)
            self.execution_order.append(nid)
            for child in children:
                self._q.put(self._entry(child))
                if self._rand() < self.duplicate_rate:
                    self._q.put(self._entry(child))


# ---------------------------------------------------------------------------
# JaxTaskExecutor: static schedule, batched per-level device execution
# ---------------------------------------------------------------------------

def _batched_kernels(precision, trsm_inv: bool = False):
    import jax.numpy as jnp
    from jax import lax

    def mm(a, b, ta=False, tb=False):
        if ta:
            a = jnp.swapaxes(a, -1, -2)
        if tb:
            b = jnp.swapaxes(b, -1, -2)
        return jnp.matmul(a, b, precision=precision)

    def trsm(a, l):
        # solve X L^T = A (right side, lower L). trsm_inv replaces the
        # batched triangular_solve — whose custom call is SEQUENTIAL per
        # batch element (~0.25 ms each, flat in size: TODO.md) — with one
        # small inverse + one batched MXU GEMM: X = A @ L^-T. Same
        # inverse-multiply tradeoff the fused lowering makes (gemm_inv in
        # compiler/lower.py); the diagonal blocks a DSL program solves
        # against are factor tiles with modest condition, and the
        # measured residual stays at fp32 grade (dslprof decomposition,
        # BENCH.md round 5: kernels were ~154 ms of the 413 ms generic
        # cholesky step at n=16384, dominated by these solves).
        if trsm_inv:
            eye = jnp.eye(l.shape[-1], dtype=l.dtype)
            if l.ndim > 2:
                eye = jnp.broadcast_to(eye, l.shape)
            linv = lax.linalg.triangular_solve(l, eye, left_side=True,
                                               lower=True)
            return mm(a, linv, tb=True)
        if l.ndim < a.ndim:  # broadcast-read pivot tile (see step_all)
            l = jnp.broadcast_to(l, a.shape[:-2] + l.shape[-2:])
        return lax.linalg.triangular_solve(
            l, a, left_side=False, lower=True, transpose_a=True
        )

    def qr_combine(rt, rb):
        n = rt.shape[-2]
        q, r = jnp.linalg.qr(jnp.concatenate([rt, rb], axis=-2), mode="reduced")
        return q[..., :n, :], q[..., n:, :], r

    def lq_leaf(a):
        q, r = jnp.linalg.qr(jnp.swapaxes(a, -1, -2), mode="reduced")
        return jnp.swapaxes(r, -1, -2), jnp.swapaxes(q, -1, -2)

    def identity(a):
        eye = jnp.eye(a.shape[-2], a.shape[-1], dtype=a.dtype)
        return jnp.broadcast_to(eye, a.shape)

    def qr_combine_r(*rs):
        return jnp.linalg.qr(jnp.concatenate(rs, axis=-2), mode="r")

    from numpywren_tpu.kernels import MAX_REDUCER_ARITY

    kary = {f"qr_combine_r{m}": qr_combine_r
            for m in range(2, MAX_REDUCER_ARITY + 1)}

    return {
        **kary,
        "potrf": lambda a: lax.linalg.cholesky(a),
        "trsm": trsm,
        "syrk": lambda s, x, y: s - mm(x, y, tb=True),
        "gemm": mm,
        "gemm_nt": lambda a, b: mm(a, b, tb=True),
        "gemm_tn": lambda a, b: mm(a, b, ta=True),
        "gemm_acc": lambda c, a, b: c + mm(a, b),
        "add": lambda a, b: a + b,
        "sub": lambda a, b: a - b,
        "identity": identity,
        "copy": lambda a: a,
        "transpose": lambda a: jnp.swapaxes(a, -1, -2),
        "qr_leaf": lambda a: jnp.linalg.qr(a, mode="reduced"),
        "qr_combine": qr_combine,
        "qr_r": lambda a: jnp.linalg.qr(a, mode="r"),
        "lq_leaf": lq_leaf,
        "small_qr_apply": lambda q, a: mm(q, a, ta=True),
        # batched-safe (use `...` axes) full-Q pairwise kernels
        "qr_factor2": _factor_ops("qr_factor2"),
        "qr_apply2": _factor_ops("qr_apply2"),
        "lq_factor2": _factor_ops("lq_factor2"),
        "lq_apply2": _factor_ops("lq_apply2"),
    }


def _factor_ops(name):
    from numpywren_tpu.ops import factor

    return getattr(factor, name)


# ops whose _batched_kernels entry broadcasts an UNBATCHED (Tm, Tn) operand
# against batched (k, Tm, Tn) ones (plain jnp broadcasting or explicit
# handling in trsm); anything else gets the operand pre-broadcast
_BCAST_SAFE_OPS = frozenset({
    "trsm", "syrk", "gemm", "gemm_nt", "gemm_tn", "gemm_acc",
    "add", "sub", "copy", "transpose", "small_qr_apply",
})


class JaxTaskExecutor:
    """Run the wavefront schedule on device, one jit for the whole program.

    Matrices are converted to tile stacks (n_tiles, Tm, Tn); each level's
    statement groups become one gather -> batched-kernel -> scatter each.
    Works for arbitrary DSL programs (the "generic" lowering).
    """

    def __init__(self, program: TiledProgram, precision=None, donate: bool = True,
                 schedule_policy: str = "wavefront", trsm_inv: bool = True):
        self.program = program
        self.precision = precision
        self.donate = donate
        # inverse-based batched trsm (one small solve + one batched MXU
        # GEMM) instead of the per-batch-element sequential
        # triangular_solve custom call — see _batched_kernels.trsm
        self.trsm_inv = trsm_inv
        # "lookahead" emits the next panel's critical-path groups before
        # bulk trailing updates (compiler.schedule.grouped_schedule); the
        # whole program is one jit either way, so this only changes trace
        # order — XLA's scheduler benefits most on multi-core backends.
        self.schedule_policy = schedule_policy
        # built lazily on first run() and reused: repeated runs of the same
        # program hit the jit trace cache instead of re-tracing the whole
        # schedule (re-execution / timing loops otherwise pay a full
        # recompile per call)
        self._fn = None
        self._mats = None
        self._names = None

    def _materialize_initial_reads(self):
        for addr in sorted(self.program.dag.initial_reads):
            name, i, j = addr
            m = self.program.matrices[name].matrix
            if not m.block_exists(i, j):
                m.get_block(i, j)  # parent_fn fallback populates the tier

    def run(self) -> PS:
        program = self.program
        self._materialize_initial_reads()
        self._build()
        mats, names = self._mats, self._names
        arrays_in = {name: mats[name].array for name in names}
        arrays_out = self._fn(arrays_in)
        for name in names:
            mats[name].replace_array(arrays_out[name])
        # the static path completes atomically: mark program state for parity
        _mark_success(program)
        return PS.SUCCESS

    def _build(self):
        """Trace-once setup: tile-stack geometry + the whole-schedule jit.
        Idempotent; cached on the instance so run() can be called repeatedly
        (each call re-executes the compiled program on the current arrays)."""
        import jax
        import jax.numpy as jnp

        from numpywren_tpu.ops.common import default_precision

        if self._fn is not None:
            return
        program = self.program

        mats = {}
        for name, ba in program.matrices.items():
            m = ba.matrix
            if m.storage != "hbm":
                m_hbm = m.to_hbm()
                ba.matrix = m_hbm
                m = m_hbm
            mats[name] = m

        precision = self.precision
        if precision is None:
            any_dtype = next(iter(mats.values())).dtype
            precision = default_precision(any_dtype)

        names = sorted(mats)
        geom = {
            name: (mats[name].grid, mats[name].tile, mats[name].padded_shape) for name in names
        }
        kers = _batched_kernels(precision, trsm_inv=self.trsm_inv)
        from numpywren_tpu.compiler.schedule import grouped_schedule

        schedule = grouped_schedule(program.dag, self.schedule_policy)
        nodes = program.dag.nodes

        def to_stack(arr, name):
            (gm, gn), (tm, tn), _ = geom[name]
            return arr.reshape(gm, tm, gn, tn).transpose(0, 2, 1, 3).reshape(gm * gn, tm, tn)

        def runs_of(lin):
            """Contiguous ascending runs [(start_pos, end_pos), ...] of a
            static linear-index list — computed at trace time."""
            runs = []
            s = 0
            for t in range(1, len(lin) + 1):
                if t == len(lin) or lin[t] != lin[t - 1] + 1:
                    runs.append((s, t))
                    s = t
            return runs

        def from_stack(st, name):
            (gm, gn), (tm, tn), (pm, pn) = geom[name]
            return st.reshape(gm, gn, tm, tn).transpose(0, 2, 1, 3).reshape(pm, pn)

        def step_all(arrays: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
            stacks = {name: to_stack(arrays[name], name) for name in names}
            for _sid, consts, members in schedule:
                group = [nodes[nid] for nid in members]
                # order members by their first write's linear tile index:
                # with sorted+unique scatter indices (asserted below) XLA
                # can take the in-place update path instead of copying
                # the whole (n_tiles, Tm, Tn) stack per group — the
                # measured ~9 ms/group gap at n=16384 (BENCH.md round 5)
                # is exactly stack-copy traffic
                gw = geom[group[0].writes[0][0]][0][1]
                group.sort(key=lambda n: n.writes[0][1] * gw + n.writes[0][2])
                ins = []
                c_pos = 0
                for pos, kind in enumerate(group[0].input_kinds):
                    if kind == "const":
                        ins.append(consts[c_pos])
                        c_pos += 1
                    else:
                        b_pos = sum(1 for k in group[0].input_kinds[:pos] if k == "block")
                        mname = group[0].reads[b_pos][0]
                        gn_ = geom[mname][0][1]
                        lin_r = [n.reads[b_pos][1] * gn_ + n.reads[b_pos][2]
                                 for n in group]
                        st = stacks[mname]
                        # The indices are STATIC, so the gather can be
                        # trace-time-specialized. XLA's gather op was
                        # measured at ~10% of HBM bandwidth on tile
                        # stacks (the ~190 ms "io" share of the 413 ms
                        # generic cholesky step, dslprof decomposition);
                        # static slices run at DMA speed.
                        if len(lin_r) > 1 and len(set(lin_r)) == 1:
                            # broadcast read (e.g. every trsm in a panel
                            # solves against the same pivot tile): pass
                            # the tile UNBATCHED where the kernel
                            # broadcasts over leading dims (trsm_inv then
                            # inverts it ONCE instead of per member);
                            # for other ops, slice+broadcast — still DMA
                            # speed, never a gather
                            tile0 = st[lin_r[0]]
                            if group[0].op in _BCAST_SAFE_OPS:
                                ins.append(tile0)
                            else:
                                ins.append(jnp.broadcast_to(
                                    tile0[None],
                                    (len(group),) + tile0.shape))
                        elif all(x < y for x, y in zip(lin_r, lin_r[1:])):
                            rruns = runs_of(lin_r)
                            if len(rruns) <= max(16, len(lin_r) // 4):
                                parts = [
                                    jax.lax.slice_in_dim(
                                        st, lin_r[s0], lin_r[s1 - 1] + 1,
                                        axis=0)
                                    for s0, s1 in rruns
                                ]
                                ins.append(parts[0] if len(parts) == 1
                                           else jax.lax.concatenate(parts, 0))
                            else:
                                ins.append(jnp.take(
                                    st, jnp.asarray(lin_r, jnp.int32),
                                    axis=0, unique_indices=True,
                                    indices_are_sorted=True))
                        else:
                            ins.append(jnp.take(
                                st, jnp.asarray(lin_r, jnp.int32), axis=0))
                outs = kers[group[0].op](*ins)
                if not isinstance(outs, tuple):
                    outs = (outs,)
                # a group whose inputs were all broadcast-unbatched can
                # come back without the member axis; restore it so the
                # scatter below sees (len(group), Tm, Tn)
                outs = tuple(
                    jnp.broadcast_to(o[None], (len(group),) + o.shape)
                    if o.ndim == 2 else o for o in outs)
                for w_pos, out in enumerate(outs):
                    mname = group[0].writes[w_pos][0]
                    gn_ = geom[mname][0][1]
                    lin = [n.writes[w_pos][1] * gn_ + n.writes[w_pos][2]
                           for n in group]
                    # same-tile writes inside one batched group would be
                    # a data race the scheduler must never emit
                    assert len(set(lin)) == len(lin), (
                        f"duplicate write tiles in group: {lin}")
                    out = out.astype(stacks[mname].dtype)
                    runs = runs_of(lin) if all(
                        a < b for a, b in zip(lin, lin[1:])) else None
                    if runs is not None and len(runs) <= max(
                            16, len(lin) // 4):
                        # coalesced scatter: one dynamic_update_slice per
                        # contiguous run. The indices are static, so the
                        # runs are known at trace time, and XLA performs
                        # DUS on a dead buffer IN PLACE — unlike the
                        # general scatter, which was measured copying the
                        # whole (n_tiles, Tm, Tn) stack per group (~9 ms
                        # at n=16384/1024: the dominant generic-vs-fused
                        # gap, BENCH.md round 5). Cholesky trailing
                        # updates write row-contiguous tiles (<= grid
                        # runs); gemm accumulation writes ONE run.
                        st = stacks[mname]
                        for s0, s1 in runs:
                            st = jax.lax.dynamic_update_slice(
                                st, out[s0:s1], (lin[s0], 0, 0))
                        stacks[mname] = st
                    else:
                        idx = jnp.asarray(lin, dtype=jnp.int32)
                        stacks[mname] = stacks[mname].at[idx].set(
                            out, unique_indices=True,
                            indices_are_sorted=all(
                                a <= b for a, b in zip(lin, lin[1:])))
            return {name: from_stack(stacks[name], name) for name in names}

        self._fn = jax.jit(step_all, donate_argnums=(0,) if self.donate else ())
        self._mats = mats
        self._names = names


class SpillTaskExecutor:
    """Generic static-schedule executor for HOST-RESIDENT matrices: per
    schedule group, gather the group's input tiles host->device, run the
    batched kernel on-chip, scatter outputs back to the host tier. The
    whole working set never needs to fit in HBM — this is the arbitrary-
    program analog of runtime.spill's Cholesky streaming (BASELINE config
    #5), and the closest structural relative of the reference worker loop
    (read blocks -> kernel -> write blocks, job_runner.py) with the chip as
    the worker.

    Pipelining (VERDICT r3 missing #2; reference job_runner.py
    pipeline_width): a prefetch thread assembles upcoming groups' input
    tiles while the current group computes on device — only tiles whose
    writer group has already scattered are prefetched; the remainder is
    gathered synchronously at group start ("late" tiles). With the default
    lookahead schedule policy the next panel's factor nodes are emitted
    before bulk trailing updates, so their I/O hides under the big GEMMs.

    on_event(kind, group_idx) test/trace hook, kinds: prefetch_issue /
    prefetch_done / compute / scatter."""

    def __init__(self, program: TiledProgram, precision=None,
                 schedule_policy: str = "lookahead",
                 pipeline_width: Optional[int] = None, on_event=None):
        self.program = program
        self.precision = precision
        self.schedule_policy = schedule_policy
        if pipeline_width is None:
            from numpywren_tpu.config import default_config

            pipeline_width = default_config().pipeline_width
        self.pipeline_width = int(pipeline_width)
        self.on_event = on_event or (lambda kind, g: None)

    def run(self, resume: bool = False) -> PS:
        import concurrent.futures

        import jax.numpy as jnp

        from numpywren_tpu.compiler.schedule import grouped_schedule
        from numpywren_tpu.ops.common import default_precision

        program = self.program
        precision = self.precision
        if precision is None:
            any_m = next(iter(program.matrices.values())).matrix
            precision = default_precision(any_m.dtype)
        kers = _batched_kernels(precision)
        nodes = program.dag.nodes
        event = self.on_event

        done = set()
        if resume:
            from numpywren_tpu.checkpoint import program_frontier

            done = set(program_frontier(program)["done"])
            program.start(done=sorted(done))
            if program.program_status == PS.SUCCESS:
                return PS.SUCCESS
        else:
            program.start()

        # live schedule (resume drops completed nodes; their outputs are in
        # the host tier, so their reads resolve as initial tiles below)
        sched = []
        for sid, consts, members in grouped_schedule(program.dag, self.schedule_policy):
            live = [nid for nid in members if nid not in done]
            if live:
                sched.append((sid, consts, [nodes[nid] for nid in live], live))

        # (addr, version) -> index of the LIVE group that writes it; reads
        # of addresses with no live writer come from pre-existing host tiles
        writer_of: Dict[Tuple, int] = {}
        for g, (_sid, _consts, group, _ids) in enumerate(sched):
            for n in group:
                wvers = n.write_versions or (None,) * len(n.writes)
                for a, v in zip(n.writes, wvers):
                    writer_of[(a, v)] = g

        def read_addr(n, b_pos):
            rvers = n.read_versions or (None,) * len(n.reads)
            return n.reads[b_pos], rvers[b_pos]

        def gather_part(g: int, wmax: int):
            """Host-gather group g's input tiles whose writer group is
            <= wmax (i.e. already scattered at submit time). Returns
            {(b_pos, node_pos): np tile}. Safe against in-place version
            reuse: the schedule's WAR edges place the writer of (addr,
            v+1) after EVERY reader of (addr, v), so a tile prefetched
            for a later group cannot be overwritten before that group
            runs."""
            _sid, _consts, group, _ids = sched[g]
            tiles = {}
            for b_pos in range(len(group[0].reads)):
                for k, n in enumerate(group):
                    a, v = read_addr(n, b_pos)
                    if writer_of.get((a, v), -1) <= wmax:
                        name, bi, bj = a
                        tiles[(b_pos, k)] = np.asarray(
                            program.matrices[name].matrix.get_block(bi, bj)
                        )
            return tiles

        depth = max(0, self.pipeline_width - 1)
        pool = concurrent.futures.ThreadPoolExecutor(max_workers=1) if depth else None
        futures: Dict[int, Tuple[int, "concurrent.futures.Future"]] = {}

        issued = set()

        def _fetch(h: int, wmax: int):
            tiles = gather_part(h, wmax)
            event("prefetch_done", h)  # fires in the prefetch thread
            return tiles

        def ensure_prefetched(frm: int, upto: int, wmax: int):
            for h in range(frm, min(upto + 1, len(sched))):
                if h not in issued:
                    issued.add(h)
                    event("prefetch_issue", h)
                    futures[h] = (wmax, pool.submit(_fetch, h, wmax))

        try:
            for g, (_sid, consts, group, ids) in enumerate(sched):
                if pool is not None:
                    # prefetch upcoming groups while THIS group computes;
                    # everything scattered so far is writer <= g - 1
                    ensure_prefetched(g + 1, g + depth, g - 1)
                pre = futures.pop(g, None)
                if pre is not None:
                    wmax, fut = pre
                    tiles = fut.result()
                else:
                    wmax = -(len(sched) + 1)  # nothing prefetched
                    tiles = {}
                # late tiles: written after the prefetch was issued (all
                # writers of g's reads are < g, hence scattered by now)
                for b_pos in range(len(group[0].reads)):
                    for k, n in enumerate(group):
                        a, v = read_addr(n, b_pos)
                        if writer_of.get((a, v), -1) > wmax:
                            name, bi, bj = a
                            tiles[(b_pos, k)] = np.asarray(
                                program.matrices[name].matrix.get_block(bi, bj)
                            )
                ins = []
                c_pos = 0
                for pos, kind in enumerate(group[0].input_kinds):
                    if kind == "const":
                        ins.append(consts[c_pos])
                        c_pos += 1
                    else:
                        b_pos = sum(1 for kk in group[0].input_kinds[:pos] if kk == "block")
                        ins.append(jnp.asarray(np.stack(
                            [tiles[(b_pos, k)] for k in range(len(group))]
                        )))
                event("compute", g)
                outs = kers[group[0].op](*ins)
                if not isinstance(outs, tuple):
                    outs = (outs,)
                event("scatter", g)
                for w_pos, out in enumerate(outs):
                    host = np.asarray(out)
                    for i, n in enumerate(group):
                        name, bi, bj = n.writes[w_pos]
                        ba = program.matrices[name]
                        ba.matrix.put_block(host[i], bi, bj)
                        if n.write_versions:
                            ba.note_write((bi, bj), n.write_versions[w_pos])
                for nid in ids:
                    program.node_status[nid] = NS.FINISHED
                    program._finished_count += 1
        finally:
            if pool is not None:
                pool.shutdown(wait=False)
        program.program_status = PS.SUCCESS
        return PS.SUCCESS


def _mark_success(program: TiledProgram):
    """Fused lowerings complete atomically; sync the state machine (parity
    with the node-level path so wait()/get_node_status keep working)."""
    if program.program_status == PS.SUCCESS:
        return  # a fused runner delegated to another executor internally
    program.start()
    for nid in range(program.num_nodes):
        program.node_status[nid] = NS.FINISHED
    program._finished_count = program.num_nodes
    program.program_status = PS.SUCCESS


def run_program(
    program: TiledProgram,
    executor: str = "auto",
    num_workers: Optional[int] = None,
    resume: bool = False,
    **kw,
) -> PS:
    """One-call execution (the alg_wrappers run helper).

    executor:
      - "fused": region-fused lowering (compiler.lower) — flagship programs
        as a handful of large MXU ops; errors if no specialization exists.
      - "jax": generic static schedule on device (works for any program).
      - "local": dynamic threaded numpy runtime (reference job_runner parity).
      - "auto": fused when available, else jax.

    resume=True (local/spill executors) restarts a half-run program from the
    block-existence frontier instead of node 0 — the reference's implicit
    checkpoint/resume (scan block_idxs_exist, re-enqueue the frontier).
    """
    if resume and executor in ("local", "spill"):
        if executor == "local":
            return LocalExecutor(program, num_workers=num_workers, **kw).run(resume=True)
        return SpillTaskExecutor(program, **kw).run(resume=True)
    if executor in ("auto", "fused"):
        from numpywren_tpu.compiler.lower import lower_fused

        fn = lower_fused(program)
        if fn is not None:
            fn()
            _mark_success(program)
            return PS.SUCCESS
        if executor == "fused":
            raise ValueError(
                f"no fused lowering for program {program.dag.template.name!r}"
            )
        executor = "jax"
    if executor == "jax":
        return JaxTaskExecutor(program, **kw).run()
    if executor == "spill":
        return SpillTaskExecutor(program, **kw).run()
    if executor == "local":
        return LocalExecutor(program, num_workers=num_workers, **kw).run()
    raise ValueError(f"unknown executor {executor!r}")
