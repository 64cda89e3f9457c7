"""Continuous dueling (TAT + continuous heads) — the last never-executed
reference model configuration (round-4 verdict missing #1).

The reference's 3D recipes pair the TAT target with continuous heads
(README.md:97-106): the CLAMPED tracker action is fed RAW (no one-hot) to
``fc_action_tracker`` (model.py:249-251) on top of the concatenated dual
observation (model.py:255). Covered here:

1. torch-oracle parity of the FULL continuous ``target_fwd`` trunk
   (encoder + raw-action embed add + LSTM + value/mu/sigma/reward_aux);
2. step_both two-player continuous shape/semantics (raw actions returned,
   per-dim stats reduced, target conditioned on the tracker sample);
3. an end-to-end HostTrainer learning smoke on a two-player synthetic
   continuous env: a ``tat-maze-lstm-continuous`` dueling model where the
   tracker's return improves and the TAT aux head's pred_R_loss falls.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from active_tracking_rl_tpu.config import NetConfig, TrainConfig
from active_tracking_rl_tpu.models.dueling import build_model

ATOL = 2e-5


class TorchContinuousTAT(nn.Module):
    """Reference TAT with continuous heads (model.py:148-209 + :67-99),
    batch 1: CNN_maze encoder over the concatenated dual obs (stack 2*k),
    fc_action_tracker embed ADDED pre-LSTM, LSTMCell, value / softsign-mu /
    raw-sigma / reward_aux heads."""

    def __init__(self, a_dim):
        super().__init__()
        self.conv1 = nn.Conv2d(1, 16, 3, stride=2, padding=1)
        self.conv2 = nn.Conv2d(16, 32, 3, stride=2, padding=1)
        self.fc = nn.Linear(1024, 256)
        self.fc_action_tracker = nn.Linear(a_dim, 256)
        self.lstm = nn.LSTMCell(256, 128)
        self.critic = nn.Linear(128, 1)
        self.actor_mu = nn.Linear(128, a_dim)
        self.actor_sigma = nn.Linear(128, a_dim)
        self.reward_aux = nn.Linear(128, 1)

    def forward(self, x, a, hx, cx):  # x: (2k, 1, 13, 13)
        f = F.relu(self.conv1(x))
        f = F.relu(self.conv2(f))
        f = F.relu(self.fc(f.reshape(1, -1)))
        f = f + self.fc_action_tracker(a)
        hx, cx = self.lstm(f, (hx, cx))
        return (self.critic(hx), torch.nn.functional.softsign(self.actor_mu(hx)),
                self.actor_sigma(hx), self.reward_aux(hx), hx, cx)


def _copy_dense(tlin, p):
    tlin.weight.copy_(torch.tensor(np.array(p["kernel"]).T))
    tlin.bias.copy_(torch.tensor(np.array(p["bias"])))


def test_target_fwd_continuous_torch_parity():
    """target_fwd(continuous=True) == the torch reference trunk, including
    the raw (B, A) float action feed (model.py:249-251: NO one-hot)."""
    ncfg = NetConfig.from_name("tat-maze-lstm-continuous", aux="reward")
    assert ncfg.continuous and ncfg.tat and ncfg.aux_reward
    model = build_model(ncfg, 2, (13, 13))
    params = model.init(jax.random.PRNGKey(0))
    p1 = params["player1"]

    rng = np.random.default_rng(0)
    obs0 = rng.random((1, 1, 13, 13, 1), np.float32)
    obs1 = rng.random((1, 1, 13, 13, 1), np.float32)
    a0 = np.clip(rng.normal(0, 1, (1, 2)), -1, 1).astype(np.float32)
    hx = rng.normal(0, 0.3, (1, 128)).astype(np.float32)
    cx = rng.normal(0, 0.3, (1, 128)).astype(np.float32)

    out = model.target_fwd(params, jnp.asarray(obs0), jnp.asarray(obs1),
                           jnp.asarray(hx), jnp.asarray(cx), jnp.asarray(a0))

    tm = TorchContinuousTAT(2)
    with torch.no_grad():
        enc = p1["CNNMaze_0"]
        tm.conv1.weight.copy_(torch.tensor(
            np.array(enc["Conv_0"]["kernel"]).transpose(3, 2, 0, 1)))
        tm.conv1.bias.copy_(torch.tensor(np.array(enc["Conv_0"]["bias"])))
        tm.conv2.weight.copy_(torch.tensor(
            np.array(enc["Conv_1"]["kernel"]).transpose(3, 2, 0, 1)))
        tm.conv2.bias.copy_(torch.tensor(np.array(enc["Conv_1"]["bias"])))
        # flax flattens NHWC per stack frame, torch reshape(1,-1) is NCHW
        kern = np.array(enc["Dense_0"]["kernel"])          # (2*512, 256)
        kern = kern.reshape(2, 4, 4, 32, 256).transpose(0, 3, 1, 2, 4)
        tm.fc.weight.copy_(torch.tensor(kern.reshape(-1, 256).T))
        tm.fc.bias.copy_(torch.tensor(np.array(enc["Dense_0"]["bias"])))
        _copy_dense(tm.fc_action_tracker, p1["fc_action_tracker"])
        lstm = p1["LSTMCell_0"]
        tm.lstm.weight_ih.copy_(torch.tensor(np.array(lstm["w_ih"]).T))
        tm.lstm.weight_hh.copy_(torch.tensor(np.array(lstm["w_hh"]).T))
        tm.lstm.bias_ih.copy_(torch.tensor(np.array(lstm["b_ih"])))
        tm.lstm.bias_hh.copy_(torch.tensor(np.array(lstm["b_hh"])))
        _copy_dense(tm.critic, p1["ValueNet_0"]["Dense_0"])
        _copy_dense(tm.actor_mu, p1["PolicyNet_0"]["Dense_0"])
        _copy_dense(tm.actor_sigma, p1["PolicyNet_0"]["Dense_1"])
        _copy_dense(tm.reward_aux, p1["reward_aux"])

        # obs concat over the stack axis (model.py:255) -> (2k,1,13,13) NCHW
        x = np.concatenate([obs0, obs1], axis=1)[0].transpose(0, 3, 1, 2)
        tv, tmu, tsig, trp, th, tc = tm(torch.tensor(x), torch.tensor(a0),
                                        torch.tensor(hx), torch.tensor(cx))

    np.testing.assert_allclose(np.array(out.value), tv.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.array(out.logits), tmu.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.array(out.sigma), tsig.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.array(out.r_pred), trp.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.array(out.h), th.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.array(out.c), tc.numpy(), atol=ATOL)


def test_step_both_continuous_two_player():
    """Two-player continuous joint step: raw (B,2,A) actions, per-agent
    scalar stats, and the target genuinely conditioned on the tracker's
    action."""
    ncfg = NetConfig.from_name("tat-maze-lstm-continuous", aux="reward")
    model = build_model(ncfg, 3, (13, 13))
    params = model.init(jax.random.PRNGKey(0))
    B = 5
    obs = jax.random.uniform(jax.random.PRNGKey(1), (B, 2, 1, 13, 13, 1))
    hx = jnp.zeros((B, 2, 128))
    vals, acts, ents, lps, hx2, cx2, rp = model.step_both(
        params, obs, hx, hx, jax.random.PRNGKey(2))
    assert vals.shape == (B, 2)
    assert acts.shape == (B, 2, 3)          # raw continuous samples
    assert ents.shape == (B, 2) and lps.shape == (B, 2)
    assert rp.shape == (B, 1)
    # conditioning: different tracker actions -> different target value
    a_lo = jnp.full((B, 3), -1.0)
    a_hi = jnp.full((B, 3), 1.0)
    o1 = model.target_fwd(params, obs[:, 0], obs[:, 1], hx[:, 1], hx[:, 1], a_lo)
    o2 = model.target_fwd(params, obs[:, 0], obs[:, 1], hx[:, 1], hx[:, 1], a_hi)
    assert not np.allclose(np.array(o1.value), np.array(o2.value))


class TwoPlayerDirectionPool:
    """Two-player continuous synthetic env (gym-pool API), zero-sum-ish.

    Both players see the same 13x13 one-hot direction image. Tracker reward
    = (a0_env . d)/2, target reward = -tracker reward. The TAT target sees
    the tracker's raw action + the obs containing d, so its reward_aux head
    can predict the tracker's immediate reward (player_util.py:129-130) —
    pred_R_loss must fall."""

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
        img = np.zeros((self.B, 2, 1, 13, 13), np.float32)
        px = 6 + np.round(4 * self.dir).astype(int)
        img[np.arange(self.B), :, 0, px[:, 0], px[:, 1]] = 1.0
        return img

    def reset(self):
        self._redraw(np.ones(self.B, bool))
        return self._obs()

    def step(self, actions):
        a = np.asarray(actions, np.float32)     # (B, 2, 2): [player, dim]
        assert a.shape == (self.B, 2, 2)
        assert np.abs(a).max() <= 2.0 + 1e-5    # wrapped to the env box
        r0 = (a[:, 0] * self.dir).sum(-1) / 2.0
        self.t += 1
        done = self.t >= self.EP_LEN
        if done.any():
            self._redraw(done)
        return self._obs(), np.stack([r0, -r0], -1), done, {}


@pytest.mark.slow
def test_tat_continuous_host_training():
    """End-to-end: the full continuous dueling configuration (TAT target +
    continuous heads + reward aux) trains jointly on a host env pool; the
    tracker's return improves and pred_R_loss falls."""
    from active_tracking_rl_tpu.rl.host_loop import HostTrainer

    tcfg = TrainConfig(num_envs=32, num_steps=8, train_mode=-1, lr=1e-3,
                       entropy_target=0.01)
    ncfg = NetConfig.from_name("tat-maze-lstm-continuous", aux="reward")
    model = build_model(ncfg, num_actions=2, obs_hw=(13, 13))
    pool = TwoPlayerDirectionPool(32, seed=5)
    tr = HostTrainer(model, ncfg, tcfg, pool, seed=0,
                     action_low=np.full(2, -2.0), action_high=np.full(2, 2.0))

    pred_losses = []
    for _ in range(150):
        m = tr.train_iter(mode=-1)
        pred_losses.append(float(m.pred_loss))
    rets = np.asarray(tr.finished_returns, np.float64)
    assert len(rets) > 30
    early = rets[: len(rets) // 3].mean()
    late = rets[-len(rets) // 3:].mean()
    # tracker learns to follow the direction despite the adversarial target
    assert late > early + 2.0, (early, late)
    # the aux head learns to predict the tracker's immediate reward — a
    # NONSTATIONARY regression target (the tracker keeps improving), so
    # judge a clear downward trend, not convergence (measured ~0.6x at 120
    # iters, seed 0)
    p_early = np.mean(pred_losses[:20])
    p_late = np.mean(pred_losses[-20:])
    assert p_late < 0.8 * p_early, (p_early, p_late)
