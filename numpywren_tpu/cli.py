"""Command-line interface (analog of the reference's `numpywren` console
script: interactive setup + control_plane launch/terminate, SURVEY §2 CLI).

The TPU rebuild has no cloud plumbing to provision, so the CLI's job is
environment inspection and smoke-level verification:

    python -m numpywren_tpu info      # devices, mesh, HBM
    python -m numpywren_tpu doctor    # backend + kernel + program smoke test
    python -m numpywren_tpu bench ... # thin wrapper over bench.py semantics
"""

from __future__ import annotations

import argparse
import json
import sys


def cmd_info(args) -> int:
    import jax

    from numpywren_tpu.parallel.mesh import _factor_2d

    devs = jax.devices()
    info = {
        "backend": jax.default_backend(),
        "devices": [{"id": d.id, "kind": d.device_kind, "platform": d.platform} for d in devs],
        "default_mesh": _factor_2d(len(devs)),
    }
    try:
        stats = devs[0].memory_stats()
        if stats:
            info["hbm_bytes_limit"] = stats.get("bytes_limit")
            info["hbm_bytes_in_use"] = stats.get("bytes_in_use")
    except Exception:
        pass
    print(json.dumps(info, indent=2))
    return 0


def cmd_doctor(args) -> int:
    """Smoke: store round-trip, one Pallas/MXU kernel, one fused program."""
    import numpy as np

    failures = []

    def check(name, fn):
        try:
            fn()
            print(f"ok   {name}")
        except Exception as e:  # noqa: BLE001 - doctor reports, not raises
            failures.append(name)
            print(f"FAIL {name}: {e!r}")

    def store():
        from numpywren_tpu.matrix_init import shard_matrix

        a = np.arange(64 * 64, dtype=np.float32).reshape(64, 64)
        m = shard_matrix(a, tile=(32, 32))
        assert np.array_equal(m.numpy(), a)

    def kernel():
        import jax.numpy as jnp

        from numpywren_tpu.ops.gemm import matmul

        x = jnp.ones((256, 256), jnp.float32)
        assert float(matmul(x, x)[0, 0]) == 256.0

    def program():
        import numpywren_tpu as npw
        from numpywren_tpu.matrix_init import random_spd

        a = random_spd(128, seed=0)
        prog, l, _ = npw.cholesky(a, tile=(32, 32))
        npw.run_program(prog)
        ln = l.numpy()
        resid = np.linalg.norm(a - ln @ ln.T) / np.linalg.norm(a)
        assert resid < 1e-4, resid

    def model():
        from numpywren_tpu import models

        rng = np.random.default_rng(0)
        x = rng.standard_normal((96, 96)).astype(np.float32)
        s = models.singular_values(x, tile=32)
        s_ref = np.linalg.svd(x.astype(np.float64), compute_uv=False)
        assert abs(s[0] - s_ref[0]) / s_ref[0] < 1e-3, (s[0], s_ref[0])
        a = rng.standard_normal((128, 8)).astype(np.float32)
        beta = rng.standard_normal(8).astype(np.float32)
        sol = models.least_squares(a, a @ beta)
        assert np.linalg.norm(sol - beta) / np.linalg.norm(beta) < 1e-3

    check("tiled store round-trip", store)
    check("device matmul kernel", kernel)
    check("fused cholesky program", program)
    check("models (svd + least squares)", model)
    return 1 if failures else 0


def cmd_bench(args) -> int:
    """Delegate to the repo-root bench harness when present, else inline."""
    import subprocess
    import os

    bench = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
    if os.path.exists(bench):
        return subprocess.call([sys.executable, bench] + args.rest)
    print("bench.py not found", file=sys.stderr)
    return 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="numpywren_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("info", help="show devices / mesh / HBM")
    sub.add_parser("doctor", help="smoke-test store, kernels, programs")
    b = sub.add_parser("bench", help="run the benchmark harness")
    b.add_argument("rest", nargs=argparse.REMAINDER)
    args = p.parse_args(argv)
    return {"info": cmd_info, "doctor": cmd_doctor, "bench": cmd_bench}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
