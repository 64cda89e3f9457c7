"""Continuous-action path (round-3 verdict missing #1).

Torch-oracle parity for the reference's nonstandard continuous sampling —
sigma = softplus(raw) + 1e-5 is a VARIANCE in the density (utils.py:75-81),
the density/entropy are evaluated at the UNCLAMPED sample and only the
env-facing action is clamped (model.py:24-39) — plus the wrap_action bound
rescale (player_util.py:39-42,49-51) and an end-to-end HostTrainer learning
smoke on a synthetic continuous-action image env.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from active_tracking_rl_tpu.models.heads import (eval_continuous,
                                                 sample_continuous)
from active_tracking_rl_tpu.rl.host_loop import wrap_action


def torch_oracle_sample(mu_multi, sigma_multi, eps):
    """Reference sample_action continuous branch (model.py:24-39) with the
    normal() pdf of utils.py:75-81, at an externally supplied eps."""
    mu = torch.clamp(mu_multi, -1.0, 1.0)
    sigma = F.softplus(sigma_multi) + 1e-5
    raw = (mu + sigma.sqrt() * eps).detach()
    prob = (torch.exp(-(raw - mu) ** 2 / (2 * sigma))
            / torch.sqrt(2 * sigma * math.pi))
    log_prob = (prob + 1e-6).log()
    entropy = 0.5 * ((sigma * 2 * math.pi).log() + 1)
    action_env = torch.clamp(raw, -1.0, 1.0)
    return action_env, entropy, log_prob, raw


def test_sample_continuous_torch_parity():
    rng = np.random.default_rng(0)
    # mu_raw beyond [-1,1] so the mu clamp binds on some rows; large sigma_raw
    # so the action clamp binds on some samples.
    mu_raw = rng.normal(0.0, 1.5, (64, 3)).astype(np.float32)
    sigma_raw = rng.normal(0.0, 2.0, (64, 3)).astype(np.float32)

    s = sample_continuous(jnp.asarray(mu_raw), jnp.asarray(sigma_raw),
                          jax.random.PRNGKey(7))
    # Recover the eps our sampler drew, feed the same eps to the oracle.
    mu_c = np.clip(mu_raw, -1.0, 1.0)
    sigma = np.log1p(np.exp(-np.abs(sigma_raw))) + np.maximum(sigma_raw, 0) + 1e-5
    eps = (np.asarray(s.raw_action) - mu_c) / np.sqrt(sigma)

    a_env, ent, lp, raw = torch_oracle_sample(
        torch.tensor(mu_raw), torch.tensor(sigma_raw), torch.tensor(eps))
    np.testing.assert_allclose(np.asarray(s.raw_action), raw.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s.action), a_env.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s.entropy), ent.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s.log_prob), lp.numpy(),
                               rtol=1e-4, atol=1e-4)
    # the clamp must bind somewhere or this test isn't exercising it
    assert (np.abs(np.asarray(s.raw_action)) > 1.0).any()
    assert (np.abs(np.asarray(s.action)) <= 1.0).all()


def test_log_prob_at_raw_not_clamped():
    """The reference evaluates the density BEFORE clamping (model.py:34-36):
    where the clamp binds, log_prob must match the raw sample, not the
    clamped action."""
    mu_raw = jnp.full((8, 1), 0.9)
    sigma_raw = jnp.full((8, 1), 3.0)   # large variance -> samples beyond 1
    s = sample_continuous(mu_raw, sigma_raw, jax.random.PRNGKey(1))
    clipped = np.abs(np.asarray(s.raw_action)) > 1.0
    assert clipped.any()
    _, lp_raw = eval_continuous(mu_raw, sigma_raw, s.raw_action)
    _, lp_act = eval_continuous(mu_raw, sigma_raw, s.action)
    np.testing.assert_allclose(np.asarray(s.log_prob), np.asarray(lp_raw),
                               rtol=1e-6)
    assert not np.allclose(np.asarray(lp_raw)[clipped],
                           np.asarray(lp_act)[clipped])


def test_eval_continuous_torch_parity():
    """Teacher-forced replay density (rl/host_loop.py) vs the reference
    normal()+log formula at a GIVEN action."""
    rng = np.random.default_rng(3)
    mu_raw = rng.normal(0.0, 1.2, (32, 2)).astype(np.float32)
    sigma_raw = rng.normal(0.0, 1.5, (32, 2)).astype(np.float32)
    x = rng.normal(0.0, 1.5, (32, 2)).astype(np.float32)

    ent_j, lp_j = eval_continuous(jnp.asarray(mu_raw), jnp.asarray(sigma_raw),
                                  jnp.asarray(x))
    mu = torch.clamp(torch.tensor(mu_raw), -1.0, 1.0)
    sigma = F.softplus(torch.tensor(sigma_raw)) + 1e-5
    prob = (torch.exp(-(torch.tensor(x) - mu) ** 2 / (2 * sigma))
            / torch.sqrt(2 * sigma * math.pi))
    lp_t = (prob + 1e-6).log()
    ent_t = 0.5 * ((sigma * 2 * math.pi).log() + 1)
    np.testing.assert_allclose(np.asarray(lp_j), lp_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ent_j), ent_t.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_wrap_action_rescale():
    """player_util.py:39-42: out = a*(high-low)/2 + (high+low)/2."""
    a = np.array([[-1.0, 0.0], [1.0, 0.5]], np.float32)
    low = np.array([0.0, -30.0], np.float32)
    high = np.array([100.0, 30.0], np.float32)
    out = wrap_action(a, low, high)
    np.testing.assert_allclose(out, [[0.0, 0.0], [100.0, 15.0]])
    # [-1, 1] bounds are the identity
    np.testing.assert_allclose(wrap_action(a, -1.0, 1.0), a)


class DirectionPool:
    """Synthetic continuous-action host env batch (gym-pool API).

    Obs: a 13x13 one-hot image marking a per-episode unit direction d
    (bright pixel at center + round(4*d)). Action: 2-d box [-2, 2] (so
    wrap_action from the policy's [-1,1] is a real x2 rescale). Reward:
    (a_env . d) / 2 per step — maximized by mu pointing along d. Episodes
    last 16 steps, then a fresh direction is drawn.
    """

    EP_LEN = 16

    def __init__(self, batch: int, seed: int = 0):
        self.B = batch
        self.rng = np.random.default_rng(seed)
        self.t = np.zeros(batch, np.int64)
        self.dir = np.zeros((batch, 2), np.float32)

    def __len__(self):
        return self.B

    def _redraw(self, rows):
        ang = self.rng.uniform(0, 2 * np.pi, size=rows.sum())
        self.dir[rows] = np.stack([np.cos(ang), np.sin(ang)], -1)
        self.t[rows] = 0

    def _obs(self):
        img = np.zeros((self.B, 1, 1, 13, 13), np.float32)
        px = 6 + np.round(4 * self.dir).astype(int)
        img[np.arange(self.B), 0, 0, px[:, 0], px[:, 1]] = 1.0
        return img

    def reset(self):
        self._redraw(np.ones(self.B, bool))
        return self._obs()

    def step(self, actions):
        a = np.asarray(actions, np.float32).reshape(self.B, 2)
        assert np.abs(a).max() <= 2.0 + 1e-5   # wrapped to the env box
        r = (a * self.dir).sum(-1) / 2.0
        self.t += 1
        done = self.t >= self.EP_LEN
        if done.any():
            self._redraw(done)
        return self._obs(), r[:, None], done, {}


@pytest.mark.slow
def test_continuous_host_training_improves():
    """End-to-end: a maze-lstm-continuous tracker trained by HostTrainer
    (teacher-forced replay + wrap_action) must improve its return on the
    synthetic direction-following env."""
    from active_tracking_rl_tpu.config import NetConfig, TrainConfig
    from active_tracking_rl_tpu.models.dueling import build_model
    from active_tracking_rl_tpu.rl.host_loop import HostTrainer

    tcfg = TrainConfig(num_envs=32, num_steps=8, train_mode=0, lr=1e-3)
    ncfg = NetConfig.from_name("maze-lstm-continuous", aux="none")
    model = build_model(ncfg, num_actions=2, obs_hw=(13, 13), single=True)
    pool = DirectionPool(32, seed=5)
    tr = HostTrainer(model, ncfg, tcfg, pool, seed=0,
                     action_low=np.full(2, -2.0), action_high=np.full(2, 2.0))

    for _ in range(120):
        tr.train_iter(mode=0)
    # Judge on finished-episode returns: early third vs late third.
    rets = np.asarray(tr.finished_returns, np.float64)
    assert len(rets) > 30
    early = rets[: len(rets) // 3].mean()
    late = rets[-len(rets) // 3:].mean()
    # random policy ~0 expected return; a learned one is clearly positive
    assert late > early + 2.0, (early, late)
    assert late > 4.0, late
