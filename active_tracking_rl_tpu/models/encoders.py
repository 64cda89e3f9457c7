"""Perception encoders (batched re-designs of perception.py).

The reference encoders are hard-coded to batch size 1 — they flatten with
`x.view(1, -1)` (perception.py:37,62,89), which also folds the *frame-stack
axis* into the feature dim: a (stack, C, H, W) input is convolved as a batch
of `stack` frames and the flattened features of all frames feed one fc layer.
These modules reproduce that contract with a real batch axis:
input (B, stack, H, W, C) -> features (B, outdim).

Layouts are NHWC (TPU-native for XLA convolutions); conv arithmetic (kernel /
stride / padding, floor max-pool) matches the torch modules exactly.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from active_tracking_rl_tpu.models.init import ref_uniform_conv, ref_uniform_linear, zeros


def _conv(features, kernel, stride, padding, dtype=None):
    # dtype=bfloat16 casts inputs + kernel for the conv (MXU double-rate);
    # params stay float32 (flax param_dtype default).
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(padding, padding), (padding, padding)],
                   kernel_init=ref_uniform_conv, bias_init=zeros, dtype=dtype)


def _maxpool2(x):
    # torch MaxPool2d(2, 2): floor mode — drop trailing row/col if odd.
    h, w = x.shape[-3], x.shape[-2]
    x = x[..., : (h // 2) * 2, : (w // 2) * 2, :]
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class _StackedConvEncoder(nn.Module):
    """Shared skeleton: fold stack into batch, conv, flatten stack*feat.

    With ``dtype=bfloat16`` the convolutions and fc run with bf16 inputs
    (relu between them stays in bf16 — precision-insensitive); the returned
    features are always float32 so RNN state and heads are unaffected.
    """

    def conv_stack(self, x):  # pragma: no cover - overridden
        raise NotImplementedError

    has_fc: bool = True
    fc_out: int = 256
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, k = x.shape[0], x.shape[1]
        x = x.reshape((b * k,) + x.shape[2:])
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = self.conv_stack(x)
        x = x.reshape(b, -1)  # (B, k * conv_feat)
        if self.has_fc:
            x = nn.Dense(self.fc_out, kernel_init=ref_uniform_linear,
                         bias_init=zeros, dtype=self.dtype)(x)
            x = nn.relu(x)
        return x.astype(jnp.float32)


class CNNMaze(_StackedConvEncoder):
    """perception.py:68-92 — the 2D workhorse (maze-lstm / tat-maze-lstm):
    conv(16,3,s2,p1) relu, conv(32,3,s2,p1) relu, fc 256 relu."""

    def conv_stack(self, x):
        x = nn.relu(_conv(16, 3, 2, 1, self.dtype)(x))
        x = nn.relu(_conv(32, 3, 2, 1, self.dtype)(x))
        return x


class ICML(_StackedConvEncoder):
    """perception.py:41-65 — conv(16,8,s4,p2) relu, conv(32,4,s2,p1) relu, fc 256."""

    def conv_stack(self, x):
        x = nn.relu(_conv(16, 8, 4, 2, self.dtype)(x))
        x = nn.relu(_conv(32, 4, 2, 1, self.dtype)(x))
        return x


class CNNSimple(_StackedConvEncoder):
    """perception.py:8-38 — 4x [conv + maxpool2 + relu], no fc."""

    has_fc: bool = False

    def conv_stack(self, x):
        x = nn.relu(_maxpool2(_conv(32, 5, 1, 2, self.dtype)(x)))
        x = nn.relu(_maxpool2(_conv(32, 5, 1, 1, self.dtype)(x)))
        x = nn.relu(_maxpool2(_conv(64, 4, 1, 1, self.dtype)(x)))
        x = nn.relu(_maxpool2(_conv(64, 3, 1, 1, self.dtype)(x)))
        return x


def make_encoder(name: str, dtype=None) -> nn.Module:
    if name == "maze":
        return CNNMaze(dtype=dtype)
    if name == "icml":
        return ICML(dtype=dtype)
    if name == "cnn":
        return CNNSimple(dtype=dtype)
    raise ValueError(f"unknown encoder {name!r}")
