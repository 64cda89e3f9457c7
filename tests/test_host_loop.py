"""HostEnvPool + HostTrainer: the host-env (3D family) training path
(SURVEY.md §2.2 external envs; reference trains them with the same worker
loop it uses for 2D, train.py:69-95).

Covers: (1) the full 1v1 Track2D gym adapter behind the pool — params move,
metrics finite, episodes finish; (2) a synthetic single-agent image env
standing in for gym_unrealcv (which needs a running UE binary) — exercises
the single-player replay/update lanes; (3) teacher-forced replay returns
exactly the log-probs the acting pass produced.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from active_tracking_rl_tpu.config import NetConfig, TrainConfig, parse_env_id
from active_tracking_rl_tpu.envs.bridge import HostEnvPool, create_env
from active_tracking_rl_tpu.models.dueling import build_model
from active_tracking_rl_tpu.models.heads import eval_discrete, sample_discrete
from active_tracking_rl_tpu.rl.host_loop import HostTrainer


def _tree_l2_diff(a, b):
    return sum(float(jnp.sum((x - y) ** 2))
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


def test_host_trainer_track2d_pool():
    env_id = "Track2D-EmptyPartialRam-v0"
    B = 4
    pool = HostEnvPool([(lambda i=i: create_env(env_id, seed=100 + i))
                        for i in range(B)])
    ecfg = parse_env_id(env_id)
    ncfg = NetConfig.from_name("maze-lstm", aux="none")
    tcfg = TrainConfig(env_id=env_id, num_envs=B, num_steps=8, train_mode=0)
    model = build_model(ncfg, ecfg.num_actions, ecfg.obs_shape)
    tr = HostTrainer(model, ncfg, tcfg, pool, seed=0)
    p0 = jax.tree_util.tree_map(jnp.copy, tr.params)

    for _ in range(3):
        m = tr.train_iter(mode=0)
    assert np.isfinite(float(m.loss))
    assert np.isfinite(float(m.grad_norm))
    # tracker trained, target frozen (train-mode 0, main.py:74-79)
    assert _tree_l2_diff(tr.params["player0"], p0["player0"]) > 0
    assert _tree_l2_diff(tr.params["player1"], p0["player1"]) == 0


class _ToyImageEnv:
    """Single-agent stand-in for a 3D env: random 1x(H,W) image obs, reward
    +1 for action 0, episode of fixed length 10. Gym API like create_env
    output: obs (P=1, k=1, C=1, H, W) via the same wrapper conventions."""

    def __init__(self, seed):
        self.rng = np.random.RandomState(seed)
        self.t = 0

    def _obs(self):
        return self.rng.rand(1, 1, 1, 13, 13).astype(np.float32)

    def reset(self):
        self.t = 0
        return self._obs()

    def step(self, action):
        self.t += 1
        r = np.array([1.0 if int(np.asarray(action).ravel()[0]) == 0
                      else 0.0], np.float32)
        return self._obs(), r, self.t >= 10, {}


def test_host_trainer_single_agent_env():
    B = 3
    pool = HostEnvPool([(lambda i=i: _ToyImageEnv(i)) for i in range(B)])
    ncfg = NetConfig.from_name("maze-lstm", aux="none")
    tcfg = TrainConfig(num_envs=B, num_steps=6, train_mode=0)
    model = build_model(ncfg, 4, (13, 13), single=True)
    tr = HostTrainer(model, ncfg, tcfg, pool, seed=0)
    p0 = jax.tree_util.tree_map(jnp.copy, tr.params)
    for _ in range(3):
        m = tr.train_iter(mode=0)
    assert np.isfinite(float(m.loss))
    assert _tree_l2_diff(tr.params, p0) > 0
    # episodes of length 10 must have completed and been recorded
    assert len(tr.finished_lens) >= B
    assert set(tr.finished_lens) == {10}


def test_eval_discrete_matches_sampling():
    """Teacher-forced eval reproduces the sampling pass's log-prob/entropy
    at the sampled action (the premise of the replay update)."""
    key = jax.random.PRNGKey(3)
    logits = jax.random.normal(key, (5, 7))
    s = sample_discrete(logits, key)
    ent, lp = eval_discrete(logits, s.action)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(s.log_prob),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ent), np.asarray(s.entropy),
                               rtol=1e-6)
