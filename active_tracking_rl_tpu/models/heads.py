"""Policy / value heads and action sampling (model.py:24-99).

Sampling is a pure function of (logits, key) so the two-phase dueling step
(tracker samples -> target conditions on the sampled action, model.py:249-257)
can interleave with module applications inside one jitted program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from active_tracking_rl_tpu.models.init import ref_uniform_linear, zeros


def _select_lane(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x[i, idx[i]] as a one-hot masked sum, keepdims — bit-exact
    replacement for take_along_axis, which lowers to a gather in the
    rollout scan's hot path (round-5 xprof: two ~1 ms/iter fusions)."""
    lane = jnp.arange(x.shape[-1], dtype=idx.dtype)
    return jnp.where(lane == idx[:, None], x, 0).sum(-1, keepdims=True)


class ValueNet(nn.Module):
    """model.py:55-64."""

    @nn.compact
    def __call__(self, x):
        return nn.Dense(1, kernel_init=ref_uniform_linear, bias_init=zeros)(x)


class PolicyNet(nn.Module):
    """model.py:67-99. Discrete -> logits (B, n); continuous -> (mu, sigma_raw)."""

    num_outputs: int
    continuous: bool = False

    @nn.compact
    def __call__(self, x):
        lin = nn.Dense(self.num_outputs, kernel_init=ref_uniform_linear,
                       bias_init=zeros)
        if not self.continuous:
            return lin(x), None
        mu = nn.soft_sign(lin(x))
        sigma = nn.Dense(self.num_outputs, kernel_init=ref_uniform_linear,
                         bias_init=zeros)(x)
        return mu, sigma


class ActionSample(NamedTuple):
    action: jnp.ndarray      # (B,) int32  | (B, A) f32 continuous (clamped)
    entropy: jnp.ndarray     # (B, 1)      | (B, A)
    log_prob: jnp.ndarray    # (B, 1)      | (B, A)
    #: continuous only: the UNCLAMPED sample mu + sqrt(sigma)*eps. The
    #: reference evaluates the density at this value, then clamps only the
    #: env-facing action (model.py:34-38) — teacher-forced replay must use
    #: this one to reproduce the rollout's log_prob.
    raw_action: Optional[jnp.ndarray] = None


def sample_discrete(logits: jnp.ndarray, key: jax.Array,
                    test: bool = False) -> ActionSample:
    """model.py:40-51: softmax probs, entropy = -sum p log p, multinomial
    sample (train) or argmax (test), gathered log-prob."""
    log_p = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(log_p)
    entropy = -(log_p * p).sum(-1, keepdims=True)
    greedy = jnp.argmax(p, axis=-1)
    sampled = jax.random.categorical(key, logits, axis=-1)
    action = jnp.where(jnp.bool_(test), greedy, sampled).astype(jnp.int32)
    log_prob = _select_lane(log_p, action)
    return ActionSample(action, entropy, log_prob)


def sample_continuous(mu: jnp.ndarray, sigma_raw: jnp.ndarray, key: jax.Array,
                      test: bool = False) -> ActionSample:
    """model.py:24-39 exactly: sigma = softplus + 1e-5 is a VARIANCE in the
    reference's pdf (utils.py:75-81); the density/entropy are evaluated at
    the UNCLAMPED sample mu + sqrt(sigma)*eps, and only the env-facing
    action is clamped to [-1, 1]; log_prob = log(pdf + 1e-6),
    entropy = 0.5*(log(2*pi*sigma) + 1).

    `test` is accepted for signature parity but ignored: the reference's
    sample_action has no test branch for continuous heads (model.py:24-39 —
    3D evaluation runs stochastic actions)."""
    del test
    mu = jnp.clip(mu, -1.0, 1.0)
    sigma = jax.nn.softplus(sigma_raw) + 1e-5
    eps = jax.random.normal(key, mu.shape)
    raw = jax.lax.stop_gradient(mu + jnp.sqrt(sigma) * eps)
    pdf = jnp.exp(-((raw - mu) ** 2) / (2 * sigma)) / jnp.sqrt(2 * sigma * jnp.pi)
    log_prob = jnp.log(pdf + 1e-6)
    entropy = 0.5 * (jnp.log(2 * jnp.pi * sigma) + 1.0)
    action = jnp.clip(raw, -1.0, 1.0)
    return ActionSample(action, entropy, log_prob, raw)


def eval_discrete(logits: jnp.ndarray, action: jnp.ndarray
                  ) -> "tuple[jnp.ndarray, jnp.ndarray]":
    """(entropy (B,1), log_prob (B,1)) of a GIVEN action under `logits`.

    Teacher-forced replay for host-env training (rl/host_loop.py): identical
    numbers to sample_discrete at the stored action, but differentiable
    w.r.t. the current params.
    """
    log_p = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(log_p)
    entropy = -(log_p * p).sum(-1, keepdims=True)
    log_prob = _select_lane(log_p, action)
    return entropy, log_prob


def eval_continuous(mu: jnp.ndarray, sigma_raw: jnp.ndarray,
                    action: jnp.ndarray
                    ) -> "tuple[jnp.ndarray, jnp.ndarray]":
    """(entropy, log_prob) of a GIVEN continuous action (model.py:24-39
    density, sigma is a variance). `action` must be the RAW (unclamped)
    sample stored at rollout time (ActionSample.raw_action) — the reference
    evaluates the density before clamping."""
    mu = jnp.clip(mu, -1.0, 1.0)
    sigma = jax.nn.softplus(sigma_raw) + 1e-5
    pdf = (jnp.exp(-((action - mu) ** 2) / (2 * sigma))
           / jnp.sqrt(2 * sigma * jnp.pi))
    log_prob = jnp.log(pdf + 1e-6)
    entropy = 0.5 * (jnp.log(2 * jnp.pi * sigma) + 1.0)
    return entropy, log_prob
