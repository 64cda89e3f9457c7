"""Mesh / sharding tests on the 8-virtual-device CPU backend
(SURVEY.md §4 item 5: multi-host logic in CI without a cluster)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from active_tracking_rl_tpu.config import NetConfig, TrainConfig, parse_env_id
from active_tracking_rl_tpu.envs.env import TrackEnv
from active_tracking_rl_tpu.models.dueling import build_model
from active_tracking_rl_tpu.parallel.mesh import (MeshSpec, learner_shardings,
                                                  make_mesh, shard_learner)
from active_tracking_rl_tpu.rl.learner import init_learner, make_train_step

FAST = dict(nav_goal_candidates=4, flood_iters=64, tape_len=64)


def test_mesh_has_8_cpu_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh(MeshSpec())
    assert mesh.shape == {"dp": 8, "tp": 1}


def test_sharded_train_step_runs_and_matches_semantics():
    env_id = "Track2D-EmptyPartialPZR-v0"
    tcfg = TrainConfig(env_id=env_id, num_envs=16, reset_pool=8, num_steps=3)
    ncfg = NetConfig.from_name("tat-maze-lstm")
    ecfg = dataclasses.replace(parse_env_id(env_id), max_episode_steps=16,
                               **FAST)
    env = TrackEnv(ecfg)
    model = build_model(ncfg, ecfg.num_actions, ecfg.obs_shape)
    ls, opt = init_learner(model, env, ncfg, tcfg, jax.random.PRNGKey(0))

    mesh = make_mesh(MeshSpec())
    sharded = shard_learner(mesh, ls)
    shardings = learner_shardings(mesh, sharded)
    ts = jax.jit(make_train_step(model, env, ncfg, tcfg, opt),
                 in_shardings=shardings)
    p, o, c, m = ts(sharded.params, sharded.opt_state, sharded.carry,
                    jnp.int32(-1))
    assert np.isfinite(float(m.loss))
    # params remain replicated after the update
    leaf = jax.tree_util.tree_leaves(p)[0]
    assert leaf.sharding.is_fully_replicated
    # carry stays sharded over dp
    assert not c.hx.sharding.is_fully_replicated

    # the sharded step computes the same update as the unsharded one
    ts_local = jax.jit(make_train_step(model, env, ncfg, tcfg, opt))
    p2, o2, c2, m2 = ts_local(ls.params, ls.opt_state, ls.carry,
                              jnp.int32(-1))
    np.testing.assert_allclose(float(m.loss), float(m2.loss), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-5)
