"""n-step returns + Generalized Advantage Estimation as a reverse scan.

Replicates the reversed-time loop of player_util.py:128-140 per agent:
    R       = gamma * R + r_t                      (n-step return)
    delta_t = r_t + gamma * V_{t+1} - V_t
    gae     = gamma * tau * gae + delta_t

The reference truncates a rollout at episode end (train.py:81-88 breaks on
done) and bootstraps R with V(s_T) iff the episode continues
(player_util.py:109-117). The synchronous vectorized equivalent keeps fixed
T and masks across episode boundaries with (1 - done_t), which reproduces the
same per-segment math (SURVEY.md §7 async->sync gap).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def gae_returns(rewards: jnp.ndarray, values: jnp.ndarray,
                bootstrap: jnp.ndarray, done: jnp.ndarray,
                gamma: float, tau: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """rewards (T, ...), values (T, ...), bootstrap (...) = V(s_T) (detached),
    done (T,) broadcastable to rewards. Returns (R (T, ...), gae (T, ...))."""
    cont = 1.0 - done.astype(rewards.dtype)
    if cont.ndim < rewards.ndim:
        cont = cont.reshape(cont.shape + (1,) * (rewards.ndim - cont.ndim))
    v_next = jnp.concatenate([values[1:], bootstrap[None]], axis=0)

    def body(carry, xs):
        r_acc, gae_acc = carry
        r_t, v_t, vn_t, c_t = xs
        r_acc = gamma * r_acc * c_t + r_t
        delta = r_t + gamma * vn_t * c_t - v_t
        gae_acc = gae_acc * gamma * tau * c_t + delta
        return (r_acc, gae_acc), (r_acc, gae_acc)

    init = (bootstrap, jnp.zeros_like(bootstrap))
    (_, _), (ret, gae) = jax.lax.scan(
        body, init, (rewards, values, v_next, cont), reverse=True)
    return ret, gae
