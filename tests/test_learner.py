import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from active_tracking_rl_tpu.config import (EnvConfig, NetConfig, TrainConfig,
                                           parse_env_id)
from active_tracking_rl_tpu.envs.env import TrackEnv
from active_tracking_rl_tpu.models.dueling import build_model
from active_tracking_rl_tpu.rl.learner import init_learner, make_train_step
from active_tracking_rl_tpu.rl import curriculum

FAST = dict(nav_goal_candidates=4, flood_iters=64, tape_len=64)


def make_all(env_id="Track2D-EmptyPartialPZR-v0", network="tat-maze-lstm",
             train_mode=-1, **tkw):
    tcfg = TrainConfig(env_id=env_id, num_envs=8, reset_pool=4, num_steps=4,
                       train_mode=train_mode, **tkw)
    ncfg = NetConfig.from_name(network)
    ecfg = dataclasses.replace(parse_env_id(env_id),
                               max_episode_steps=32, **FAST)
    env = TrackEnv(ecfg)
    model = build_model(ncfg, ecfg.num_actions, ecfg.obs_shape)
    ls, opt = init_learner(model, env, ncfg, tcfg, jax.random.PRNGKey(0))
    ts = jax.jit(make_train_step(model, env, ncfg, tcfg, opt))
    return tcfg, ncfg, env, model, ls, ts


def _tree_equal(a, b):
    return all(np.array_equal(np.array(x), np.array(y)) for x, y in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


def test_train_step_updates_params_and_is_finite():
    tcfg, ncfg, env, model, ls, ts = make_all()
    p, o, c, m = ts(ls.params, ls.opt_state, ls.carry, jnp.int32(-1))
    assert not _tree_equal(p, ls.params)
    assert all(np.isfinite(np.array(x)).all()
               for x in jax.tree_util.tree_leaves(p))
    assert np.isfinite(float(m.loss))


def test_mode0_freezes_target_from_fresh_init():
    """With zero optimizer moments, tracker-only mode must leave player1
    untouched (loss excludes it -> zero grads -> zero Adam update)."""
    tcfg, ncfg, env, model, ls, ts = make_all()
    p, o, c, m = ts(ls.params, ls.opt_state, ls.carry, jnp.int32(0))
    assert _tree_equal(p["player1"], ls.params["player1"])
    assert not _tree_equal(p["player0"], ls.params["player0"])


def test_mode1_freezes_tracker_from_fresh_init():
    tcfg, ncfg, env, model, ls, ts = make_all()
    p, o, c, m = ts(ls.params, ls.opt_state, ls.carry, jnp.int32(1))
    assert _tree_equal(p["player0"], ls.params["player0"])
    assert not _tree_equal(p["player1"], ls.params["player1"])


def test_static_train_mode_masks_optimizer():
    """CLI train-mode 0 restricts the optimizer itself (main.py:74-79):
    even a joint dynamic mode cannot move player1."""
    tcfg, ncfg, env, model, ls, ts = make_all(train_mode=0)
    p, o, c, m = ts(ls.params, ls.opt_state, ls.carry, jnp.int32(-1))
    assert _tree_equal(p["player1"], ls.params["player1"])


def test_episodes_complete_inside_rollout():
    tcfg, ncfg, env, model, ls, ts = make_all()
    p, o, c, m = ls.params, ls.opt_state, ls.carry, None
    counts = 0.0
    for i in range(12):
        p, o, c, m = ts(p, o, c, jnp.int32(-1))
        counts += float(m.ep_count)
    assert counts > 0  # max_episode_steps=32, 48 env steps per row


def test_non_tat_network_no_pred_loss():
    tcfg, ncfg, env, model, ls, ts = make_all(
        env_id="Track2D-EmptyPartialAdv-v0", network="maze-lstm")
    p, o, c, m = ts(ls.params, ls.opt_state, ls.carry, jnp.int32(-1))
    assert float(m.pred_loss) == 0.0


def test_gru_network_runs():
    tcfg, ncfg, env, model, ls, ts = make_all(network="tat-maze-gru")
    p, o, c, m = ts(ls.params, ls.opt_state, ls.carry, jnp.int32(-1))
    assert np.isfinite(float(m.loss))


def test_curriculum_schedule():
    tcfg = TrainConfig(train_mode=2, init_step=10, adv_step=20)
    st = curriculum.CurriculumState.initial(tcfg)
    modes = []
    for it in range(1, 80):
        st = curriculum.update(tcfg, st, it)
        modes.append(st.mode)
    assert set(modes[:9]) == {0}          # warmup
    assert 1 in modes and 0 in modes[15:]  # alternation happens
    # pinned mode when train_mode != 2
    tcfg2 = TrainConfig(train_mode=-1, init_step=5)
    st2 = curriculum.CurriculumState.initial(tcfg2)
    for it in range(1, 12):
        st2 = curriculum.update(tcfg2, st2, it)
        assert st2.mode == (0 if it < 5 else -1)
