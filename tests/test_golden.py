"""Committed golden-trajectory fixtures (BASELINE.md config 3).

``run/parity.py record`` wrote one ``.npz`` per paper env
(/root/reference/README.md:79-83) into ``tests/golden/``; this test replays
each one bit-exactly. Unlike the in-process record→verify round-trip in
``tests/test_bridge.py``, these fixtures were recorded by a *different
process on a different day*, so a pass here is a real cross-version /
cross-machine replay-stability guarantee, not a tautology.
"""

import glob
import os

import numpy as np
import pytest

from active_tracking_rl_tpu.run.parity import rollout_trace

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
FIXTURES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.npz")))
EXPECTED = [
    "Track2D-BlockPartialNav-v0",
    "Track2D-BlockPartialRam-v0",
    "Track2D-MazePartialNav-v0",
    "Track2D-MazePartialRam-v0",
]


def test_fixture_suite_is_complete():
    names = {os.path.basename(f)[:-4] for f in FIXTURES}
    missing = [e for e in EXPECTED if e not in names]
    assert not missing, f"golden fixtures missing for: {missing}"


@pytest.mark.parametrize("path", FIXTURES,
                         ids=[os.path.basename(f)[:-4] for f in FIXTURES])
def test_golden_replay_bit_exact(path):
    g = np.load(path, allow_pickle=False)
    trace = rollout_trace(str(g["env_id"]), int(g["seed"]), int(g["episodes"]))
    for k in ("obs", "rewards", "done", "pos", "actions", "dist"):
        assert np.array_equal(g[k], trace[k]), (
            f"{os.path.basename(path)}: field '{k}' diverged from the "
            f"committed golden trace")
