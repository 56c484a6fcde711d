"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference's tests shrink the cluster to the test process (local pywren
executor, in-process job_runner — SURVEY §4). We shrink the TPU pod to 8
virtual CPU devices, which exercises the same sharding/collective code paths
the driver dry-runs multi-chip.

Environment quirk: this container's sitecustomize pre-imports jax and
registers the axon TPU plugin before any conftest code runs, so setting
JAX_PLATFORMS via os.environ here is too late. jax.config.update still works
because no backend has been *initialized* yet at conftest import time.
Opt into on-chip tests with NPW_TEST_TPU=1.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("NPW_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
