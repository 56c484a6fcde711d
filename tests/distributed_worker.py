"""Worker process for the multi-host test (tests/test_distributed.py).

Spawned once per fake "host": joins the coordination service through
numpywren_tpu.parallel.distributed (NPW_* env), then runs sharded
factorizations over the GLOBAL mesh (devices of BOTH processes — the
collectives cross the process boundary, exactly the DCN path on a real
multi-host pod) and checks residuals against numpy.
"""

import os
import sys


def main():
    # each fake host gets 4 virtual CPU devices; drop the parent test
    # process's 8-device XLA_FLAGS (jax_num_cpu_devices is the reliable
    # knob under jax.distributed — the XLA_FLAGS form is ignored there)
    os.environ.pop("XLA_FLAGS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    from numpywren_tpu.parallel import distributed

    multi = distributed.initialize()
    assert multi, (f"expected a multi-process run "
                   f"(process_count={jax.process_count()})")
    assert distributed.process_count() == 2
    assert len(jax.devices()) == 8, f"global devices: {len(jax.devices())}"
    assert len(jax.local_devices()) == 4

    import numpy as np

    from numpywren_tpu.matrix_init import random_spd
    from numpywren_tpu.parallel import make_mesh, sharded_cholesky, sharded_gemm

    mesh = make_mesh()  # spans both processes
    n_procs = {d.process_index for d in mesh.devices.flat}
    assert n_procs == {0, 1}, f"mesh does not span processes: {n_procs}"

    # identical input everywhere (host-0 data broadcast, the S3-read analog)
    a_local = (random_spd(512, seed=3)
               if distributed.process_index() == 0
               else np.zeros((512, 512), np.float32))
    a = np.asarray(distributed.broadcast_from_host0(a_local))

    l = sharded_cholesky(a, tile=64, mesh=mesh)
    l_np = distributed.gather_to_hosts(l)[:512, :512]
    res = np.linalg.norm(np.tril(l_np) @ np.tril(l_np).T - a) / np.linalg.norm(a)
    assert res < 1e-4, f"cholesky residual {res}"

    c = sharded_gemm(a, a, mesh=mesh)
    c_np = distributed.gather_to_hosts(c)[:512, :512]
    ref = a.astype(np.float64) @ a.astype(np.float64)
    err = np.abs(c_np - ref).max() / np.abs(ref).max()
    assert err < 1e-4, f"summa error {err}"

    # cross-host binding of host-resident row blocks
    from jax.sharding import NamedSharding, PartitionSpec as P

    rows_per_proc = 256
    my_rows = a[distributed.process_index() * rows_per_proc:
                (distributed.process_index() + 1) * rows_per_proc]
    sharding = NamedSharding(mesh, P(mesh.axis_names[0], None))
    g = distributed.host_local_array(my_rows, (512, 512), sharding)
    total = distributed.gather_to_hosts(g.sum())
    assert np.allclose(np.unique(np.round(total, 3)), round(float(a.sum()), 3))

    distributed.sync("npw_test_done")
    print(f"WORKER_OK {distributed.process_index()}", flush=True)


if __name__ == "__main__":
    main()
