"""The driver's entry points must keep working: entry() compiles single-chip,
dryrun_multichip exercises the full sharded pipeline on the virtual mesh."""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge  # noqa: E402


def test_entry_jits():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[0].shape


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)
