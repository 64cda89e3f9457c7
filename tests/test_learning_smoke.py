"""End-to-end learning smoke test (SURVEY.md §4 item 6, round-2 verdict
item 1): a short tracker-only run on Block-Ram must clearly beat the
initial-policy eval return. Catches silent RL bugs (sign errors, broken GAE,
dead gradients) that no unit test sees.

Kept CPU-cheap: small batch, short episodes, ~2 min budget."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from active_tracking_rl_tpu.config import NetConfig, TrainConfig, parse_env_id
from active_tracking_rl_tpu.envs.env import TrackEnv
from active_tracking_rl_tpu.models.dueling import build_model
from active_tracking_rl_tpu.rl.evaluate import make_evaluator
from active_tracking_rl_tpu.rl.learner import init_learner, make_train_step


def test_tracker_learns_on_block_ram():
    env_id = "Track2D-BlockPartialRam-v0"
    # lr raised vs the 1e-3 default: the sync batch (128 x 20) gradient is
    # far less noisy than the reference's batch-1 Hogwild pushes, so a
    # larger step is stable and the smoke budget stays ~1 min (SURVEY.md §7,
    # async->sync tuning gap).
    tcfg = TrainConfig(env_id=env_id, env_base=env_id, train_mode=0,
                       num_envs=128, reset_pool=32, num_steps=20, lr=3e-3)
    ncfg = NetConfig.from_name("maze-lstm", aux="none")
    ecfg = dataclasses.replace(parse_env_id(env_id), max_episode_steps=100,
                               tape_len=128)
    env = TrackEnv(ecfg)
    model = build_model(ncfg, ecfg.num_actions, ecfg.obs_shape)
    ls, opt = init_learner(model, env, ncfg, tcfg, jax.random.PRNGKey(0))
    ts = jax.jit(make_train_step(model, env, ncfg, tcfg, opt))
    evaluator = make_evaluator(model, env, ncfg, episodes=64, max_steps=100)

    ev0 = evaluator(ls.params, jax.random.PRNGKey(42))
    p, o, c = ls.params, ls.opt_state, ls.carry
    for _ in range(150):
        p, o, c, m = ts(p, o, c, jnp.int32(0))
    ev1 = evaluator(p, jax.random.PRNGKey(42))

    r0_before = float(ev0["R_mean"][0])
    r0_after = float(ev1["R_mean"][0])
    # 150 iters x 2560 steps: untrained nets score ~-13 on 100-step episodes
    # (target lost in ~30 steps); this config reliably reaches R0 >= +50 with
    # near-full episode length. +30 leaves a wide margin over seed noise.
    assert r0_after > r0_before + 30.0, (r0_before, r0_after)
    assert float(ev1["EL_mean"]) > float(ev0["EL_mean"]) + 20.0, (
        ev0["EL_mean"], ev1["EL_mean"])


def test_gru_tracker_learns_on_block_ram():
    """Same smoke through the GRU recurrent family (`maze-gru`,
    model.py:121-124) — the GRU cell has torch parity tests but this is the
    end-to-end trained-path evidence."""
    env_id = "Track2D-BlockPartialRam-v0"
    tcfg = TrainConfig(env_id=env_id, env_base=env_id, train_mode=0,
                       num_envs=128, reset_pool=32, num_steps=20, lr=3e-3)
    ncfg = NetConfig.from_name("maze-gru", aux="none")
    ecfg = dataclasses.replace(parse_env_id(env_id), max_episode_steps=100,
                               tape_len=128)
    env = TrackEnv(ecfg)
    model = build_model(ncfg, ecfg.num_actions, ecfg.obs_shape)
    ls, opt = init_learner(model, env, ncfg, tcfg, jax.random.PRNGKey(1))
    ts = jax.jit(make_train_step(model, env, ncfg, tcfg, opt))
    evaluator = make_evaluator(model, env, ncfg, episodes=64, max_steps=100)

    ev0 = evaluator(ls.params, jax.random.PRNGKey(42))
    p, o, c = ls.params, ls.opt_state, ls.carry
    for _ in range(150):
        p, o, c, m = ts(p, o, c, jnp.int32(0))
    ev1 = evaluator(p, jax.random.PRNGKey(42))
    assert float(ev1["R_mean"][0]) > float(ev0["R_mean"][0]) + 30.0, (
        float(ev0["R_mean"][0]), float(ev1["R_mean"][0]))
