"""Two-player dueling model (model.py:102-265), batched.

`A3CPlayer` == reference `A3C` (encoder -> optional LSTM/GRU -> heads).
`TATPlayer` == reference `TAT` (tracker-aware target): the tracker's one-hot
action is linearly embedded and ADDED to the visual feature pre-RNN
(model.py:193-194); the target sees tracker-obs and target-obs concatenated
along the frame-stack axis (model.py:255 cat on dim 0 == our stack axis,
handled by the encoder's stack-folding contract — encoders.py); an aux head
predicts the tracker's immediate reward (model.py:182-185,205-207).

The joint forward is two-phase (tracker samples first, model.py:242-257);
`DuelingModel.tracker_fwd` / `target_fwd` expose the phases and
`step_both` composes them for single-call use (entry point / eval).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from active_tracking_rl_tpu.config import NetConfig
from active_tracking_rl_tpu.models.encoders import make_encoder
from active_tracking_rl_tpu.models.heads import (ActionSample, PolicyNet,
                                                 ValueNet, sample_continuous,
                                                 sample_discrete)
from active_tracking_rl_tpu.models.init import ref_uniform_linear, zeros
from active_tracking_rl_tpu.models.recurrent import GRUCell, LSTMCell


class PlayerOut(NamedTuple):
    value: jnp.ndarray              # (B, 1)
    logits: jnp.ndarray             # (B, A) discrete; mu for continuous
    sigma: Optional[jnp.ndarray]    # continuous only
    h: jnp.ndarray                  # (B, R)
    c: jnp.ndarray                  # (B, R)
    r_pred: Optional[jnp.ndarray]   # (B, 1), TAT aux head only


class A3CPlayer(nn.Module):
    cfg: NetConfig
    num_actions: int

    @nn.compact
    def __call__(self, obs, h, c) -> PlayerOut:
        dt = self.cfg.compute_dtype if self.cfg.bf16 else None
        feat = make_encoder(self.cfg.encoder, dt)(obs)
        if self.cfg.rnn == "lstm":
            h, c = LSTMCell(self.cfg.rnn_out, dtype=dt)(feat, h, c)
            feat = h
        elif self.cfg.rnn == "gru":
            h, c = GRUCell(self.cfg.rnn_out, dtype=dt)(feat, h, c)
            feat = h
        value = ValueNet()(feat)
        pol, sigma = PolicyNet(self.num_actions, self.cfg.continuous)(feat)
        return PlayerOut(value, pol, sigma, h, c, None)


class TATPlayer(nn.Module):
    cfg: NetConfig
    num_actions: int
    dim_action_tracker: int

    @nn.compact
    def __call__(self, obs, h, c, action_tracker) -> PlayerOut:
        dt = self.cfg.compute_dtype if self.cfg.bf16 else None
        feat = make_encoder(self.cfg.encoder, dt)(obs)
        f_a = nn.Dense(feat.shape[-1], kernel_init=ref_uniform_linear,
                       bias_init=zeros, name="fc_action_tracker")(action_tracker)
        feat = feat + f_a
        if self.cfg.rnn == "lstm":
            h, c = LSTMCell(self.cfg.rnn_out, dtype=dt)(feat, h, c)
            feat = h
        elif self.cfg.rnn == "gru":
            h, c = GRUCell(self.cfg.rnn_out, dtype=dt)(feat, h, c)
            feat = h
        value = ValueNet()(feat)
        pol, sigma = PolicyNet(self.num_actions, self.cfg.continuous)(feat)
        r_pred = nn.Dense(1, kernel_init=ref_uniform_linear, bias_init=zeros,
                          name="reward_aux")(feat)
        return PlayerOut(value, pol, sigma, h, c, r_pred)


class DuelingModel:
    """Parameter container + pure apply fns for both players.

    Params live in one tree {"player0": ..., "player1": ...} so the
    split-checkpoint semantics (test.py:124-127) and per-player train-mode
    param selection (main.py:74-79) map onto subtree operations.
    """

    def __init__(self, net_cfg: NetConfig, num_actions: int,
                 obs_hw: Tuple[int, int], single: bool = False):
        self.cfg = net_cfg
        self.num_actions = num_actions
        self.obs_hw = obs_hw
        self.single = single
        self.player0 = A3CPlayer(net_cfg, num_actions)
        if single:
            self.player1 = None
        elif net_cfg.tat:
            self.player1 = TATPlayer(net_cfg, num_actions, num_actions)
        else:
            self.player1 = A3CPlayer(net_cfg, num_actions)

    # --- init ---
    def init(self, key: jax.Array):
        k0, k1 = jax.random.split(key)
        h, w = self.obs_hw
        k = self.cfg.stack_frames
        dummy = jnp.zeros((1, k, h, w, 1), jnp.float32)
        hx = jnp.zeros((1, self.cfg.rnn_out), jnp.float32)
        params = {"player0": self.player0.init(k0, dummy, hx, hx)["params"]}
        if self.player1 is not None:
            if self.cfg.tat:
                dummy2 = jnp.zeros((1, 2 * k, h, w, 1), jnp.float32)
                a = jnp.zeros((1, self.num_actions), jnp.float32)
                params["player1"] = self.player1.init(
                    k1, dummy2, hx, hx, a)["params"]
            else:
                params["player1"] = self.player1.init(
                    k1, dummy, hx, hx)["params"]
        return params

    # --- per-phase forwards (obs: (B, k, H, W, 1) float) ---
    def tracker_fwd(self, params, obs0, h0, c0) -> PlayerOut:
        return self.player0.apply({"params": params["player0"]}, obs0, h0, c0)

    def target_fwd(self, params, obs0, obs1, h1, c1,
                   tracker_action) -> PlayerOut:
        """model.py:249-259. tracker_action: (B,) int32 (discrete) or
        (B, A) float (continuous, fed raw — model.py:251)."""
        if self.cfg.tat:
            if self.cfg.continuous:
                a2t = tracker_action
            else:
                a2t = jax.nn.one_hot(tracker_action, self.num_actions)
            obs_cat = jnp.concatenate([obs0, obs1], axis=1)  # stack axis
            return self.player1.apply({"params": params["player1"]},
                                      obs_cat, h1, c1, a2t)
        return self.player1.apply({"params": params["player1"]}, obs1, h1, c1)

    def sample(self, out: PlayerOut, key: jax.Array,
               test: bool = False) -> ActionSample:
        if self.cfg.continuous:
            return sample_continuous(out.logits, out.sigma, key, test)
        return sample_discrete(out.logits, key, test)

    def step_both(self, params, obs, hx, cx, key, test: bool = False):
        """Joint forward (model.py:238-265).

        obs: (B, 2, k, H, W, 1) float; hx/cx: (B, 2, R).
        Returns (values (B,2), actions (B,2) int32 | (B,2,A) f32 raw samples
        for continuous, entropies (B,2), log_probs (B,2), hx', cx',
        r_pred (B,1) or None).
        """
        k0, k1 = jax.random.split(key)
        out0 = self.tracker_fwd(params, obs[:, 0], hx[:, 0], cx[:, 0])
        s0 = self.sample(out0, k0, test)
        cont = self.cfg.continuous

        def agent_action(s: ActionSample):
            # Continuous: hand back the RAW sample (B, A) — the consumer
            # clamps/wraps for the env (player_util.py:49-51) and stores the
            # raw value for teacher-forced replay (heads.ActionSample).
            return s.raw_action if cont else s.action

        def agent_stats(x):
            # Continuous per-dim entropy/log_prob reduce to a per-agent
            # scalar by mean over dims — the reference's `.mean()` over the
            # (A,)-shaped per-agent loss rows (player_util.py:143-146)
            # commutes to exactly this reduction.
            return x.mean(-1, keepdims=True) if cont else x

        if self.single or self.player1 is None:
            hx1 = out0.h[:, None]
            return (out0.value, agent_action(s0)[:, None], agent_stats(s0.entropy),
                    agent_stats(s0.log_prob), hx1, out0.c[:, None], None)
        out1 = self.target_fwd(params, obs[:, 0], obs[:, 1], hx[:, 1],
                               cx[:, 1], s0.action)
        s1 = self.sample(out1, k1, test)
        values = jnp.concatenate([out0.value, out1.value], axis=-1)
        # discrete: (B, 2); continuous: (B, 2, A) raw samples
        actions = jnp.stack([agent_action(s0), agent_action(s1)], axis=1) \
            if cont else jnp.stack([s0.action, s1.action], axis=-1)
        entropies = jnp.concatenate([agent_stats(s0.entropy),
                                     agent_stats(s1.entropy)], axis=-1)
        log_probs = jnp.concatenate([agent_stats(s0.log_prob),
                                     agent_stats(s1.log_prob)], axis=-1)
        hx_new = jnp.stack([out0.h, out1.h], axis=1)
        cx_new = jnp.stack([out0.c, out1.c], axis=1)
        return values, actions, entropies, log_probs, hx_new, cx_new, out1.r_pred


def build_model(net_cfg: NetConfig, num_actions: int,
                obs_hw: Tuple[int, int], single: bool = False) -> DuelingModel:
    """model.py:12-15 equivalent."""
    return DuelingModel(net_cfg, num_actions, obs_hw, single)
