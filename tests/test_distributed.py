"""Multi-host path (SURVEY §2 backend table: DCN across hosts, one JAX
process per host): a REAL two-process run over localhost — each subprocess
owns 4 virtual CPU devices, the coordination service joins them into one
8-device mesh, and the sharded factorizations' collectives cross the
process boundary (the DCN analog)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh():
    port = _free_port()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo_root, "tests", "distributed_worker.py")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "NPW_COORDINATOR": f"127.0.0.1:{port}",
            "NPW_NUM_PROCESSES": "2",
            "NPW_PROCESS_ID": str(pid),
            "PYTHONPATH": repo_root + os.pathsep + env.get("PYTHONPATH", ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {pid}" in out


def test_single_process_degrades():
    """distributed.* helpers must be no-ops in plain single-process runs so
    library code never needs to branch."""
    import numpy as np

    from numpywren_tpu.parallel import distributed

    assert distributed.initialize() is False  # no coordinator configured
    assert distributed.process_count() == 1
    assert not distributed.is_multi_host()
    distributed.sync()
    x = np.arange(4.0)
    assert distributed.broadcast_from_host0(x) is x
    np.testing.assert_array_equal(distributed.gather_to_hosts(x), x)
