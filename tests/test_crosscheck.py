"""Cross-validation vs the ACTUAL reference env (round-2 verdict item 2).

Drives the reference `Track1v1Env` (via the vendored gym shim in shims/)
with a deterministic RNG and asserts every transition matches the NumPy
oracles our JAX engine is tested against. A missing reference is a hard
FAIL, never a skip-as-pass."""

import numpy as np
import pytest

from active_tracking_rl_tpu.run.parity import cross_check


@pytest.mark.parametrize("env_id", [
    "Track2D-BlockPartialNav-v0",   # paper eval env (README.md:79-83)
    "Track2D-BlockPartialRam-v0",
    "Track2D-MazePartialNav-v0",
    "Track2D-BlockFullNav-v0",      # Full-obs painting path
    "Track2D-BlockPartialPZR-v0",   # w_p = 1 reward branch
    "Track2D-BlockPartialRPF-v0",   # static patrol goals (generators.py:47-50)
    "Track2D-BlockPartialFar-v0",   # w_p = -0.5 reward branch
])
def test_cross_check_vs_reference(env_id):
    # ImportError here means the reference or shim broke — that IS a failure.
    assert cross_check(env_id, steps=150, seed=3), env_id


def test_cross_check_catches_violation(monkeypatch):
    """The harness must be able to fail: corrupt the reward oracle and the
    check must report a mismatch (guards against vacuous-pass regressions)."""
    import active_tracking_rl_tpu.run.parity as parity
    import tests.oracles as oracles

    real = oracles.rewards

    def bad(pos0, pos1, w_p, pob=6.0):
        r0, r1, d = real(pos0, pos1, w_p, pob)
        return r0 + 0.5, r1, d

    monkeypatch.setattr(oracles, "rewards", bad)
    assert not parity.cross_check("Track2D-BlockPartialNav-v0",
                                  steps=30, seed=3)
