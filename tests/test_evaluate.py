"""Evaluator tests: the compiled eval program must be built once and reused
across checkpoint calls (round-2 verdict item 6 — re-jitting recompiled the
500-step protocol at every eval)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from active_tracking_rl_tpu.config import NetConfig, TrainConfig, parse_env_id
from active_tracking_rl_tpu.envs.env import TrackEnv
from active_tracking_rl_tpu.models.dueling import build_model
from active_tracking_rl_tpu.rl.evaluate import make_evaluator
from tests.test_learner import FAST


def test_evaluator_compiles_once():
    env_id = "Track2D-EmptyPartialRam-v0"
    ncfg = NetConfig.from_name("maze-lstm")
    ecfg = dataclasses.replace(parse_env_id(env_id), max_episode_steps=16,
                               **FAST)
    env = TrackEnv(ecfg)
    model = build_model(ncfg, ecfg.num_actions, ecfg.obs_shape)
    params = model.init(jax.random.PRNGKey(0))
    ev = make_evaluator(model, env, ncfg, episodes=4, max_steps=16)

    out1 = ev(params, jax.random.PRNGKey(1))
    n_compiles = ev._jitted._cache_size()
    out2 = ev(params, jax.random.PRNGKey(2))
    assert ev._jitted._cache_size() == n_compiles == 1  # no recompile
    assert out1["EL_mean"] > 0
    # different keys -> genuinely different episodes (not a cached output)
    assert not np.array_equal(out1["R_mean"], out2["R_mean"])

    # same key -> deterministic protocol
    out3 = ev(params, jax.random.PRNGKey(1))
    assert np.array_equal(out1["R_mean"], out3["R_mean"])
