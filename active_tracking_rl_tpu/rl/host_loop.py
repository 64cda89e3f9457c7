"""Host-env training loop: the external (3D / gym-unrealcv) family behind
the same jitted learner.

The reference trains 3D envs with the identical worker loop it uses for 2D —
a host gym env stepped one transition at a time (train.py:69-95). Here the
split is: **act** on device (one jitted `model.step_both` per env step over
the whole `HostEnvPool` batch), **step** the B host envs on CPU threads
(envs/bridge.py HostEnvPool), and **update** on device by teacher-forced
replay — a jitted scan re-runs the model over the stored (obs, action)
sequence, which reproduces the rollout's log-probs/values exactly (same
params, same inputs) while remaining differentiable, then applies the same
`dueling_loss` + shared optimizer as the on-device learner
(player_util.py:108-162 semantics).

For Track2D use `rl/learner.py` (fully on-device, orders of magnitude
faster); this loop exists so any env that only speaks the host gym API —
UnrealCV included — trains against the TPU with no other code change.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import chex
import jax
import jax.numpy as jnp
import numpy as np
import optax

from active_tracking_rl_tpu.config import NetConfig, TrainConfig
from active_tracking_rl_tpu.models.dueling import DuelingModel
from active_tracking_rl_tpu.models.heads import eval_continuous, eval_discrete
from active_tracking_rl_tpu.ops.losses import dueling_loss
from active_tracking_rl_tpu.rl.learner import TrainMetrics, make_optimizer_for


class HostBatch(NamedTuple):
    """One T-step host rollout, stacked time-major."""

    obs: chex.Array        # (T+1, B, P, k, H, W, 1) f32  (T+1 for bootstrap)
    actions: chex.Array    # (T, B, P) int32 | (T, B, P, A) f32 continuous
    rewards: chex.Array    # (T, B, P) f32
    done: chex.Array       # (T, B) bool
    hx0: chex.Array        # (B, P, R) rnn state BEFORE step 0
    cx0: chex.Array


def wrap_action(action: np.ndarray, low, high) -> np.ndarray:
    """player_util.py:39-42: rescale a [-1, 1] policy action to the env's
    [low, high] box. Applied to the CLAMPED action (action_train,
    player_util.py:49-51)."""
    low = np.asarray(low, np.float32)
    high = np.asarray(high, np.float32)
    return np.asarray(action) * (high - low) / 2.0 + (high + low) / 2.0


def _obs_to_model(obs: np.ndarray, channel_first: bool = True) -> np.ndarray:
    """(B, P, k, ...) uint8/float -> (B, P, k, H, W, C) float32.

    `channel_first` states the pool's per-frame layout explicitly (the
    create_env wrapper chain yields channel-FIRST (C, H, W) frames,
    track_1v1.py:326 / ImagePreprocess; encoders here are channel-last).
    Channel-less (B, P, k, H, W) input gets a trailing channel axis either
    way; 6-dim input is transposed only when channel_first.
    """
    o = np.asarray(obs, np.float32)
    if o.ndim == 5:                       # (B, P, k, H, W) -> add channel
        o = o[..., None]
    elif o.ndim == 6 and channel_first:   # (B, P, k, C, H, W)
        o = np.moveaxis(o, 3, -1)
    return o


def _replay(model: DuelingModel, params, batch: HostBatch, two_player: bool):
    """Teacher-forced forward over the stored sequence.

    Returns (values, log_probs, entropies, r_pred) each (T, B, 2) (lane 1
    zero-padded in single-player mode) — the differentiable tensors
    `dueling_loss` needs.
    """
    cfg = model.cfg

    def eval_out(out, action):
        if cfg.continuous:
            ent, lp = eval_continuous(out.logits, out.sigma, action)
            # mean over action dims: the reference's final `.mean()` over the
            # (A,)-shaped per-agent loss rows (player_util.py:143-146)
            # commutes to this per-step reduction (gae and the entropy
            # weight are scalar per agent).
            return ent.mean(-1, keepdims=True), lp.mean(-1, keepdims=True)
        return eval_discrete(out.logits, action)

    def step(c, xs):
        hx, cx = c
        obs_t, a_t, done_t = xs
        out0 = model.tracker_fwd(params, obs_t[:, 0], hx[:, 0], cx[:, 0])
        a0 = a_t[:, 0]
        ent0, lp0 = eval_out(out0, a0)
        # TAT conditioning uses the CLAMPED action (the reference feeds the
        # env-facing action_0, model.py:249-251); stored actions are raw.
        a0_cond = jnp.clip(a0, -1.0, 1.0) if cfg.continuous else a0
        if two_player:
            out1 = model.target_fwd(params, obs_t[:, 0], obs_t[:, 1],
                                    hx[:, 1], cx[:, 1], a0_cond)
            ent1, lp1 = eval_out(out1, a_t[:, 1])
            values = jnp.concatenate([out0.value, out1.value], -1)
            lps = jnp.concatenate([lp0, lp1], -1)
            ents = jnp.concatenate([ent0, ent1], -1)
            rp = (out1.r_pred[..., 0] if out1.r_pred is not None
                  else jnp.zeros_like(lp0[..., 0]))
            hx_n = jnp.stack([out0.h, out1.h], 1)
            cx_n = jnp.stack([out0.c, out1.c], 1)
        else:
            pad = jnp.zeros_like(out0.value)
            values = jnp.concatenate([out0.value, pad], -1)
            lps = jnp.concatenate([lp0, pad], -1)
            ents = jnp.concatenate([ent0, pad], -1)
            rp = jnp.zeros_like(lp0[..., 0])
            hx_n = out0.h[:, None]
            cx_n = out0.c[:, None]
        # episode boundary: zero recurrent state (player_util.py:98-102)
        mask = done_t[:, None, None]
        return ((jnp.where(mask, 0.0, hx_n), jnp.where(mask, 0.0, cx_n)),
                (values, lps, ents, rp))

    (hx, cx), (values, lps, ents, rp) = jax.lax.scan(
        step, (batch.hx0, batch.cx0),
        (batch.obs[:-1], batch.actions, batch.done))
    return values, lps, ents, rp, (hx, cx)


def make_host_update(model: DuelingModel, net_cfg: NetConfig,
                     tcfg: TrainConfig, opt: optax.GradientTransformation,
                     two_player: bool):
    """Jit-able update(params, opt_state, batch, mode, key)."""
    aux = net_cfg.tat and net_cfg.aux_reward and two_player

    def loss_fn(params, batch: HostBatch, mode, key):
        values, lps, ents, rp, (hx, cx) = _replay(model, params, batch,
                                                  two_player)
        # bootstrap V(s_T) (player_util.py:109-117); fresh tracker action for
        # the TAT target's conditional value, as in learner.bootstrap_values.
        obs_T = batch.obs[-1]
        out0 = model.tracker_fwd(params, obs_T[:, 0], hx[:, 0], cx[:, 0])
        if two_player:
            s0 = model.sample(out0, key)
            out1 = model.target_fwd(params, obs_T[:, 0], obs_T[:, 1],
                                    hx[:, 1], cx[:, 1], s0.action)
            boot = jnp.concatenate([out0.value, out1.value], -1)
        else:
            boot = jnp.concatenate([out0.value,
                                    jnp.zeros_like(out0.value)], -1)

        def per_row(rew, val, bs, logp, ent, done, rpred):
            return dueling_loss(rew, val, bs, logp, ent, done, rpred,
                                mode, tcfg.gamma, tcfg.tau,
                                tcfg.entropy, tcfg.entropy_target, aux)

        stats = jax.vmap(per_row, in_axes=(1, 1, 0, 1, 1, 1,
                                           (1 if aux else None)))(
            batch.rewards, values, boot, lps, ents, batch.done,
            rp if aux else None)
        return stats.loss.mean(), stats

    def update(params, opt_state, batch: HostBatch, mode, key):
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, mode, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = TrainMetrics(
            loss=loss,
            policy_loss=stats.policy_loss.mean(0),
            value_loss=stats.value_loss.mean(0),
            entropy=stats.entropy.mean(0) / tcfg.num_steps,
            pred_loss=stats.pred_loss.mean(),
            ep_return=jnp.zeros((2,)), ep_len=jnp.zeros(()),
            ep_count=batch.done.sum().astype(jnp.float32),
            grad_norm=optax.global_norm(grads),
        )
        return params, opt_state, metrics

    return update


class HostTrainer:
    """Drives a HostEnvPool against the jitted act/update pair.

    `pool` must yield per-env obs shaped (P, k, ...) (the create_env wrapper
    chain's FrameStack output, envs/bridge.py) and accept (P,) action rows.
    """

    def __init__(self, model: DuelingModel, net_cfg: NetConfig,
                 tcfg: TrainConfig, pool, seed: int = 0,
                 channel_first: bool = True,
                 action_low=None, action_high=None):
        self.model = model
        self.ncfg = net_cfg
        self.tcfg = tcfg
        self.pool = pool
        self.channel_first = channel_first
        # Continuous action bounds for wrap_action (player_util.py:49-51);
        # None -> actions stay in [-1, 1] (identity rescale).
        self.action_low = action_low
        self.action_high = action_high
        self.two_player = model.player1 is not None
        self.params = model.init(jax.random.PRNGKey(seed))
        self.opt = make_optimizer_for(net_cfg, tcfg, self.params)
        self.opt_state = self.opt.init(self.params)
        self.key = jax.random.PRNGKey(seed + 1)
        self._act = jax.jit(functools.partial(model.step_both, test=False))
        self._update = jax.jit(make_host_update(model, net_cfg, tcfg,
                                                self.opt, self.two_player))
        B = len(pool)
        R = net_cfg.rnn_out
        P = 2 if self.two_player else 1
        self.hx = jnp.zeros((B, P, R), jnp.float32)
        self.cx = jnp.zeros((B, P, R), jnp.float32)
        self.obs = _obs_to_model(pool.reset(), channel_first)
        self.ep_returns = np.zeros((B,), np.float64)
        self.ep_lens = np.zeros((B,), np.int64)
        self.finished_returns: list = []
        self.finished_lens: list = []

    def train_iter(self, mode: int = 0) -> TrainMetrics:
        """One T-step rollout + one update. Returns device metrics."""
        T = self.tcfg.num_steps
        obs_seq = [self.obs]
        acts, rews, dones = [], [], []
        hx0, cx0 = self.hx, self.cx
        for _ in range(T):
            self.key, k = jax.random.split(self.key)
            (_, actions, _, _, self.hx, self.cx, _) = self._act(
                self.params, jnp.asarray(self.obs), self.hx, self.cx, k)
            a_host = np.asarray(actions)
            if self.ncfg.continuous:
                # Stored actions are the RAW samples (for replay); the env
                # gets the clamp + wrap_action rescale (player_util.py:44-54).
                a_env = np.clip(a_host, -1.0, 1.0)
                if self.action_low is not None:
                    a_env = wrap_action(a_env, self.action_low,
                                        self.action_high)
            else:
                a_env = a_host
            if not self.two_player:
                # Single-agent pools expect per-env actions of the env's own
                # Box/Discrete shape, not a length-1 agent list — the
                # reference squeezes before env.step (player_util.py:40).
                a_env = a_env[:, 0]
            obs, r, done, _ = self.pool.step(a_env)
            r = np.asarray(r, np.float32)
            if r.ndim == 1:            # single-agent pools return (B,)
                r = r[:, None]
            if not self.two_player:
                r = np.concatenate([r[:, :1], np.zeros_like(r[:, :1])], 1)
            elif r.shape[1] == 1:
                r = np.concatenate([r, -r], 1)
            self.obs = _obs_to_model(obs, self.channel_first)
            self.ep_returns += r[:, 0]
            self.ep_lens += 1
            for i, d in enumerate(done):
                if d:
                    self.finished_returns.append(self.ep_returns[i])
                    self.finished_lens.append(self.ep_lens[i])
                    self.ep_returns[i] = 0.0
                    self.ep_lens[i] = 0
            mask = jnp.asarray(done)[:, None, None]
            self.hx = jnp.where(mask, 0.0, self.hx)
            self.cx = jnp.where(mask, 0.0, self.cx)
            obs_seq.append(self.obs)
            acts.append(a_host)
            rews.append(r)
            dones.append(done)

        batch = HostBatch(
            obs=jnp.asarray(np.stack(obs_seq)),
            actions=jnp.asarray(np.stack(acts)),
            rewards=jnp.asarray(np.stack(rews)),
            done=jnp.asarray(np.stack(dones)),
            hx0=hx0, cx0=cx0,
        )
        self.key, k = jax.random.split(self.key)
        self.params, self.opt_state, m = self._update(
            self.params, self.opt_state, batch, jnp.int32(mode), k)
        return m
