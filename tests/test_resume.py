"""Exact preemption resume (round-2 verdict item 7): train -> save -> load ->
train must equal uninterrupted training bit-for-bit for every saved component
(params, opt_state, env carry incl. PRNG key, curriculum, best-score
watermark). The reference can only warm-start weights (main.py:81-85)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from active_tracking_rl_tpu.rl.checkpoint import (CheckpointManager,
                                                  load_train_state)
from tests.test_learner import _tree_equal, make_all


def test_resume_bit_exact(tmp_path):
    tcfg, ncfg, env, model, ls, ts = make_all()

    # Uninterrupted: 4 steps.
    p, o, c = ls.params, ls.opt_state, ls.carry
    for _ in range(4):
        p, o, c, m = ts(p, o, c, jnp.int32(-1))

    # Interrupted: 2 steps, checkpoint, restore into FRESH state, 2 steps.
    p2, o2, c2 = ls.params, ls.opt_state, ls.carry
    for _ in range(2):
        p2, o2, c2, m2 = ts(p2, o2, c2, jnp.int32(-1))
    ckpt = CheckpointManager(str(tmp_path), split=True)
    ckpt.save(jax.device_get(p2),
              {"params": jax.device_get(p2), "opt_state": jax.device_get(o2),
               "carry": jax.device_get(c2),
               "curriculum": {"mode": -1, "last_switch": 3, "phase_len": 7},
               "step": 2},
              score=1.25, n_iter=2)

    # New format on disk: flax msgpack, no pickle (round-3 verdict weak #5).
    assert (tmp_path / "train_state.msgpack").exists()
    assert not (tmp_path / "train_state.pkl").exists()

    saved = load_train_state(str(tmp_path),
                             template={"params": ls.params,
                                       "opt_state": ls.opt_state,
                                       "carry": ls.carry})
    assert saved["step"] == 2
    assert saved["max_score"] == 1.25          # post-update watermark
    assert saved["curriculum"]["phase_len"] == 7
    p3 = jax.tree_util.tree_map(lambda a, b: jnp.asarray(b), ls.params,
                                saved["params"])
    o3 = jax.tree_util.tree_map(lambda a, b: jnp.asarray(b), ls.opt_state,
                                saved["opt_state"])
    c3 = jax.tree_util.tree_map(lambda a, b: jnp.asarray(b), ls.carry,
                                saved["carry"])
    for _ in range(2):
        p3, o3, c3, m3 = ts(p3, o3, c3, jnp.int32(-1))

    assert _tree_equal(p, p3)
    assert _tree_equal(o, o3)
    assert _tree_equal(c, c3)


def test_legacy_pickle_fallback(tmp_path):
    """Checkpoints written by rounds <= 3 (train_state.pkl) must still load."""
    import pickle

    tcfg, ncfg, env, model, ls, ts = make_all()
    legacy = {"params": jax.device_get(ls.params), "step": 5,
              "max_score": 2.0}
    with open(tmp_path / "train_state.pkl", "wb") as f:
        pickle.dump(legacy, f)
    saved = load_train_state(str(tmp_path))
    assert saved["step"] == 5
    assert _tree_equal(ls.params, jax.tree_util.tree_map(
        jnp.asarray, saved["params"]))


def test_version_mismatch_rejected(tmp_path):
    from flax import serialization

    import pytest

    with open(tmp_path / "train_state.msgpack", "wb") as f:
        f.write(serialization.msgpack_serialize(
            {"version": 999, "state": {}}))
    with pytest.raises(ValueError, match="version"):
        load_train_state(str(tmp_path))


def test_watermark_is_post_update(tmp_path):
    """save() must persist the watermark AFTER folding in this eval's score,
    so a resumed run makes the same best/new decisions as an uninterrupted
    one (test.py:112-121 semantics)."""
    tcfg, ncfg, env, model, ls, ts = make_all()
    ckpt = CheckpointManager(str(tmp_path), split=False)
    ckpt.save(jax.device_get(ls.params), {"step": 1}, score=3.5, n_iter=1)
    assert load_train_state(str(tmp_path))["max_score"] == 3.5
    ckpt.save(jax.device_get(ls.params), {"step": 2}, score=-9.0, n_iter=2)
    assert load_train_state(str(tmp_path))["max_score"] == 3.5  # not lowered
