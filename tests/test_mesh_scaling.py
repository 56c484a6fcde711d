"""The scaling-artifact script's collective-volume model (VERDICT r4 #8):
the CSV's asserted column must match the fabric's logged per-device
collective volume within its 2x band — exact on the calibration point."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "experiments", "mesh_scaling.py")


def _run_point(point):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                   + " --xla_force_host_platform_device_count=4"),
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    r = subprocess.run([sys.executable, SCRIPT, "--point", point],
                       capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_cholesky_2d_volume_model_exact():
    rec = _run_point("cholesky_2d,4,512,128")
    assert rec["ok"], rec
    # the model is derived term-by-term from the logged collectives:
    # exact on this calibration point, not just within the band
    assert rec["coll_floats_per_dev"] == rec["coll_model_floats"] == 327680
    assert rec["coll_model_ratio"] == 1.0
    assert "wall_s_1core_artifact" in rec and "mflops_per_s_total" not in rec


def test_bdfac_2d_volume_model_in_band():
    rec = _run_point("bdfac_2d,4,512,128")
    assert rec["ok"], rec
    assert 0.5 <= rec["coll_model_ratio"] <= 2.0, rec
