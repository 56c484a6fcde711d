"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference's tests shrink the cluster to the test process (local pywren
executor, in-process job_runner — SURVEY §4). We shrink the TPU pod to 8
virtual CPU devices via XLA host-platform forcing, which exercises the exact
same sharding/collective code paths the driver dry-runs multi-chip.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
