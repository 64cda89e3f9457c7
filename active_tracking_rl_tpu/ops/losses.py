"""A3C dueling loss, replicating player_util.py:108-162 per rollout.

Per agent i over a T-step rollout:
    value_loss_i  = sum_t 0.5 * (R_t,i - V_t,i)^2
    policy_loss_i = sum_t -(logpi_t,i * stopgrad(gae_t,i) + w_ent,i * H_t,i)
    pred_loss     = sum_t |R_pred_t - r_t,tracker|        (aux 'reward')

Entropy weights are asymmetric: tracker gets `entropy` (0.01), target rows
get `entropy_target` (0.2 AD-VAT / 0.01 naive dueling)
(player_util.py:121-124). Loss selection by training mode
(player_util.py:147-154): 0 -> tracker only, 1 -> target only, else both;
pred_loss added when aux enabled and mode != 0.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from active_tracking_rl_tpu.ops.gae import gae_returns


class LossStats(NamedTuple):
    loss: jnp.ndarray
    policy_loss: jnp.ndarray   # (2,)
    value_loss: jnp.ndarray    # (2,)
    entropy: jnp.ndarray       # (2,) summed over T (train.py:140 parity)
    pred_loss: jnp.ndarray     # ()


def dueling_loss(rewards: jnp.ndarray,      # (T, 2)
                 values: jnp.ndarray,       # (T, 2)
                 bootstrap: jnp.ndarray,    # (2,)  V(s_T), detached
                 log_probs: jnp.ndarray,    # (T, 2)
                 entropies: jnp.ndarray,    # (T, 2)
                 done: jnp.ndarray,         # (T,)
                 r_preds: Optional[jnp.ndarray],  # (T,) or None
                 training_mode: jnp.ndarray,      # () int32, dynamic
                 gamma: float, tau: float,
                 w_entropy: float, w_entropy_target: float,
                 aux_reward: bool) -> LossStats:
    bootstrap = jax.lax.stop_gradient(bootstrap)
    # returns/gae are grad-free (player_util.py:131-140: R chains only
    # rewards + detached bootstrap; gae uses values[i].data); the
    # grad-carrying V enters only through `advantage` below.
    ret, gae = gae_returns(rewards, jax.lax.stop_gradient(values),
                           bootstrap, done, gamma, tau)
    advantage = ret - values
    value_loss = (0.5 * advantage ** 2).sum(0)                       # (2,)
    w_ent = jnp.array([w_entropy, w_entropy_target], rewards.dtype)
    policy_loss = (-(log_probs * jax.lax.stop_gradient(gae))
                   - w_ent[None, :] * entropies).sum(0)              # (2,)
    entropy_sum = entropies.sum(0)

    if r_preds is not None and aux_reward:
        pred_loss = jnp.abs(r_preds - rewards[:, 0]).sum()
    else:
        pred_loss = jnp.zeros((), rewards.dtype)

    loss_tracker = policy_loss[0] + 0.5 * value_loss[0]
    loss_target = policy_loss[1] + 0.5 * value_loss[1]
    loss = jnp.where(training_mode == 0, loss_tracker,
                     jnp.where(training_mode == 1, loss_target,
                               loss_tracker + loss_target))
    if r_preds is not None and aux_reward:
        loss = loss + jnp.where(training_mode != 0, pred_loss, 0.0)
    return LossStats(loss, policy_loss, value_loss, entropy_sum, pred_loss)
