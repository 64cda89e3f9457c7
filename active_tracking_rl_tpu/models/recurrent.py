"""Recurrent cells with torch-exact gate semantics.

The reference uses `nn.LSTMCell` / `nn.GRUCell` with biases zeroed at build
time (model.py:115-124). flax's cells differ in parameterization and init, so
these are explicit re-implementations of the torch cell math with the torch
default U(-1/sqrt(H), 1/sqrt(H)) weight init and zero biases.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from active_tracking_rl_tpu.models.init import torch_rnn_uniform, zeros


def _mm(x: jnp.ndarray, w: jnp.ndarray, dtype) -> jnp.ndarray:
    """Matmul with optional bf16 inputs; result cast back to f32 so bias adds
    and gate nonlinearities stay full precision (the mixed-precision recipe:
    only the MXU-bound contraction runs at reduced precision)."""
    if dtype is None:
        return x @ w
    return (x.astype(dtype) @ w.astype(dtype)).astype(jnp.float32)


class LSTMCell(nn.Module):
    """torch nn.LSTMCell: gates [i, f, g, o] from x@W_ih^T + b_ih + h@W_hh^T + b_hh."""

    hidden: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray,
                 c: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h4 = 4 * self.hidden
        init = torch_rnn_uniform(self.hidden)
        w_ih = self.param("w_ih", init, (x.shape[-1], h4))
        w_hh = self.param("w_hh", init, (self.hidden, h4))
        b_ih = self.param("b_ih", zeros, (h4,))
        b_hh = self.param("b_hh", zeros, (h4,))
        gates = _mm(x, w_ih, self.dtype) + b_ih + _mm(h, w_hh, self.dtype) + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = nn.sigmoid(i)
        f = nn.sigmoid(f)
        g = jnp.tanh(g)
        o = nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return h_new, c_new


class GRUCell(nn.Module):
    """torch nn.GRUCell: r/z/n gates with the torch n-gate composition."""

    hidden: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray,
                 c: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h3 = 3 * self.hidden
        init = torch_rnn_uniform(self.hidden)
        w_ih = self.param("w_ih", init, (x.shape[-1], h3))
        w_hh = self.param("w_hh", init, (self.hidden, h3))
        b_ih = self.param("b_ih", zeros, (h3,))
        b_hh = self.param("b_hh", zeros, (h3,))
        gi = _mm(x, w_ih, self.dtype) + b_ih
        gh = _mm(h, w_hh, self.dtype) + b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = nn.sigmoid(i_r + h_r)
        z = nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        # GRU has no cell state; keep the (h, c) interface, c passes through.
        return h_new, c
