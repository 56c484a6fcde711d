"""Out-of-core (host-spill) execution tests + checkpoint/resume
(reference parity: all state in S3 => free resume via block_idxs_exist;
SURVEY §5 checkpoint/resume)."""

import numpy as np
import pytest
import scipy.linalg

from numpywren_tpu.matrix_init import random_spd, shard_matrix
from numpywren_tpu.runtime.spill import SpillCheckpoint, out_of_core_cholesky


@pytest.mark.parametrize("panel_tiles", [1, 2, 3])
def test_ooc_cholesky_matches_scipy(panel_tiles):
    a = random_spd(256, seed=0)
    at = shard_matrix(a, tile=(32, 32), storage="host")
    l = out_of_core_cholesky(at, panel_tiles=panel_tiles)
    ref = scipy.linalg.cholesky(a.astype(np.float64), lower=True)
    ln = np.tril(l.numpy())
    np.testing.assert_allclose(ln, ref, rtol=5e-3, atol=5e-4)
    resid = np.linalg.norm(a - ln @ ln.T) / np.linalg.norm(a)
    assert resid < 1e-5


def test_ooc_cholesky_symmetric_store():
    """Lower-triangle-only input (TiledSymmetricMatrix host tier)."""
    a = random_spd(192, seed=1)
    at = shard_matrix(a, tile=(32, 32), storage="host", symmetric=True)
    l = out_of_core_cholesky(at, panel_tiles=2)
    ln = np.tril(l.numpy())
    resid = np.linalg.norm(a - ln @ ln.T) / np.linalg.norm(a)
    assert resid < 1e-5


def test_checkpoint_resume(tmp_path):
    """Kill the run after some panels; resume must complete correctly and
    skip the finished panels."""
    a = random_spd(256, seed=2)
    at = shard_matrix(a, tile=(32, 32), storage="host")
    ck = str(tmp_path / "ck")

    # run fully once to create the checkpoint, then "crash": truncate the
    # manifest to panels_done=2 and delete later panels
    out_of_core_cholesky(at, panel_tiles=2, checkpoint_dir=ck)
    import json, os

    with open(os.path.join(ck, "manifest.json")) as f:
        m = json.load(f)
    assert m["panels_done"] == 4
    m["panels_done"] = 2
    with open(os.path.join(ck, "manifest.json"), "w") as f:
        json.dump(m, f)
    for s in (2, 3):
        os.remove(os.path.join(ck, f"panel_{s}.npy"))

    assert SpillCheckpoint(ck).completed() == 2
    l = out_of_core_cholesky(at, panel_tiles=2, checkpoint_dir=ck)
    ln = np.tril(l.numpy())
    resid = np.linalg.norm(a - ln @ ln.T) / np.linalg.norm(a)
    assert resid < 1e-5
    assert SpillCheckpoint(ck).completed() == 4


def test_ooc_matches_fused():
    import numpywren_tpu as npw

    a = random_spd(160, seed=3)
    at = shard_matrix(a, tile=(32, 32), storage="host")
    l_ooc = np.tril(out_of_core_cholesky(at, panel_tiles=2).numpy())
    prog, l_f, _ = npw.cholesky(a, tile=(32, 32))
    npw.run_program(prog, executor="fused")
    np.testing.assert_allclose(l_ooc, l_f.numpy(), rtol=1e-4, atol=1e-4)
