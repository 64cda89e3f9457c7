"""Optimizers replicating shared_optim.py numerics as optax transforms.

The reference's SharedAdam (shared_optim.py:90-175) deviates from stock Adam:
  * eps = 1e-3 (nonstandard, shared_optim.py:98),
  * amsgrad ON by default,
  * denom = sqrt(max_exp_avg_sq) + eps, step = lr*sqrt(1-b2^t)/(1-b1^t).
Its Hogwild sharing (`share_memory`, lock-free concurrent `step()`) collapses
into a single synchronous sharded update under pjit (SURVEY.md §2.5); the
numerics below are what must match.
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class SharedAdamState(NamedTuple):
    step: chex.Array
    exp_avg: chex.ArrayTree
    exp_avg_sq: chex.ArrayTree
    max_exp_avg_sq: chex.ArrayTree


def shared_adam(lr: float, b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-3, amsgrad: bool = True) -> optax.GradientTransformation:
    """shared_optim.py:122-175 (per-parameter math, weight_decay=0)."""

    def init(params):
        z = lambda p: jnp.zeros_like(p)
        return SharedAdamState(
            step=jnp.zeros((), jnp.int32),
            exp_avg=jax.tree_util.tree_map(z, params),
            exp_avg_sq=jax.tree_util.tree_map(z, params),
            max_exp_avg_sq=jax.tree_util.tree_map(z, params),
        )

    def update(grads, state, params=None):
        del params
        step = state.step + 1
        m = jax.tree_util.tree_map(
            lambda m_, g: b1 * m_ + (1 - b1) * g, state.exp_avg, grads)
        v = jax.tree_util.tree_map(
            lambda v_, g: b2 * v_ + (1 - b2) * (g * g), state.exp_avg_sq, grads)
        vmax = jax.tree_util.tree_map(jnp.maximum, state.max_exp_avg_sq, v)
        denom_src = vmax if amsgrad else v
        t = step.astype(jnp.float32)
        bias1 = 1 - b1 ** t
        bias2 = 1 - b2 ** t
        step_size = lr * jnp.sqrt(bias2) / bias1
        updates = jax.tree_util.tree_map(
            lambda m_, d_: -step_size * m_ / (jnp.sqrt(d_) + eps),
            m, denom_src)
        return updates, SharedAdamState(step, m, v, vmax)

    return optax.GradientTransformation(init, update)


class SharedRMSpropState(NamedTuple):
    step: chex.Array
    square_avg: chex.ArrayTree
    grad_avg: chex.ArrayTree
    momentum: chex.ArrayTree


def shared_rmsprop(lr: float = 7e-4, alpha: float = 0.99, eps: float = 0.1,
                   momentum: float = 0.0,
                   centered: bool = False) -> optax.GradientTransformation:
    """shared_optim.py:8-87."""

    def init(params):
        z = lambda p: jnp.zeros_like(p)
        return SharedRMSpropState(
            step=jnp.zeros((), jnp.int32),
            square_avg=jax.tree_util.tree_map(z, params),
            grad_avg=jax.tree_util.tree_map(z, params),
            momentum=jax.tree_util.tree_map(z, params),
        )

    def update(grads, state, params=None):
        del params
        sq = jax.tree_util.tree_map(
            lambda s, g: alpha * s + (1 - alpha) * g * g,
            state.square_avg, grads)
        ga = state.grad_avg
        if centered:
            ga = jax.tree_util.tree_map(
                lambda a, g: alpha * a + (1 - alpha) * g, ga, grads)
            avg = jax.tree_util.tree_map(
                lambda s, a: jnp.sqrt(s - a * a) + eps, sq, ga)
        else:
            avg = jax.tree_util.tree_map(lambda s: jnp.sqrt(s) + eps, sq)
        if momentum > 0:
            buf = jax.tree_util.tree_map(
                lambda b, g, a: momentum * b + g / a,
                state.momentum, grads, avg)
            updates = jax.tree_util.tree_map(lambda b: -lr * b, buf)
            mom = buf
        else:
            updates = jax.tree_util.tree_map(
                lambda g, a: -lr * g / a, grads, avg)
            mom = state.momentum
        return updates, SharedRMSpropState(state.step + 1, sq, ga, mom)

    return optax.GradientTransformation(init, update)


def make_optimizer(name: str, lr: float, grad_clip: float,
                   amsgrad: bool = True) -> optax.GradientTransformation:
    """Grad-norm clip 50 then the shared update (player_util.py:157-160)."""
    opt = shared_adam(lr, amsgrad=amsgrad) if name == "Adam" else shared_rmsprop(lr)
    return optax.chain(optax.clip_by_global_norm(grad_clip), opt)
