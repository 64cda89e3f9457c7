"""Model numerics vs torch oracles (torch is CPU-only in this image).

The torch modules below are built from the documented architecture
(perception.py / model.py semantics per SURVEY.md §2.3), weights copied from
our flax params, outputs compared elementwise.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from active_tracking_rl_tpu.config import NetConfig
from active_tracking_rl_tpu.models.dueling import build_model
from active_tracking_rl_tpu.models.encoders import CNNMaze
from active_tracking_rl_tpu.models.heads import sample_discrete
from active_tracking_rl_tpu.models.recurrent import GRUCell, LSTMCell

ATOL = 2e-5


def test_lstm_cell_matches_torch():
    H, IN, B = 16, 12, 5
    cell = LSTMCell(H)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, IN))
    h = jax.random.normal(jax.random.fold_in(key, 1), (B, H))
    c = jax.random.normal(jax.random.fold_in(key, 2), (B, H))
    params = cell.init(jax.random.PRNGKey(3), x, h, c)["params"]
    h2, c2 = cell.apply({"params": params}, x, h, c)

    t = nn.LSTMCell(IN, H)
    with torch.no_grad():
        t.weight_ih.copy_(torch.tensor(np.array(params["w_ih"]).T))
        t.weight_hh.copy_(torch.tensor(np.array(params["w_hh"]).T))
        t.bias_ih.copy_(torch.tensor(np.array(params["b_ih"])))
        t.bias_hh.copy_(torch.tensor(np.array(params["b_hh"])))
        th, tc = t(torch.tensor(np.array(x)),
                   (torch.tensor(np.array(h)), torch.tensor(np.array(c))))
    np.testing.assert_allclose(np.array(h2), th.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.array(c2), tc.numpy(), atol=ATOL)


def test_gru_cell_matches_torch():
    H, IN, B = 16, 12, 5
    cell = GRUCell(H)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, IN))
    h = jax.random.normal(jax.random.fold_in(key, 1), (B, H))
    params = cell.init(jax.random.PRNGKey(3), x, h, h)["params"]
    h2, _ = cell.apply({"params": params}, x, h, h)
    t = nn.GRUCell(IN, H)
    with torch.no_grad():
        t.weight_ih.copy_(torch.tensor(np.array(params["w_ih"]).T))
        t.weight_hh.copy_(torch.tensor(np.array(params["w_hh"]).T))
        t.bias_ih.copy_(torch.tensor(np.array(params["b_ih"])))
        t.bias_hh.copy_(torch.tensor(np.array(params["b_hh"])))
        th = t(torch.tensor(np.array(x)), torch.tensor(np.array(h)))
    np.testing.assert_allclose(np.array(h2), th.numpy(), atol=ATOL)


class TorchCNNMaze(nn.Module):
    """perception.py:68-92 semantics: conv(16,3,s2,p1), conv(32,3,s2,p1),
    flatten stack*feat, fc 256, relu after each."""

    def __init__(self, in_ch, flat_dim):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, 16, 3, stride=2, padding=1)
        self.conv2 = nn.Conv2d(16, 32, 3, stride=2, padding=1)
        self.fc = nn.Linear(flat_dim, 256)

    def forward(self, x):  # x: (stack*B? no — (N, C, H, W)), batch handling by caller
        x = F.relu(self.conv1(x))
        x = F.relu(self.conv2(x))
        x = x.reshape(1, -1)
        return F.relu(self.fc(x))


def test_cnn_maze_matches_torch_batch1():
    k = 1
    enc = CNNMaze()
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, k, 13, 13, 1))
    params = enc.init(jax.random.PRNGKey(1), x)["params"]
    out = enc.apply({"params": params}, x)
    assert out.shape == (1, 256)

    tm = TorchCNNMaze(1, 512 * k)
    with torch.no_grad():
        tm.conv1.weight.copy_(torch.tensor(
            np.array(params["Conv_0"]["kernel"]).transpose(3, 2, 0, 1)))
        tm.conv1.bias.copy_(torch.tensor(np.array(params["Conv_0"]["bias"])))
        tm.conv2.weight.copy_(torch.tensor(
            np.array(params["Conv_1"]["kernel"]).transpose(3, 2, 0, 1)))
        tm.conv2.bias.copy_(torch.tensor(np.array(params["Conv_1"]["bias"])))
        # our encoder flattens NHWC (k, H, W, C) while torch's reshape(1,-1)
        # flattens NCHW (k, C, H, W): permute the fc input rows to match.
        kern = np.array(params["Dense_0"]["kernel"])  # (k*H*W*C, 256)
        kern = kern.reshape(k, 4, 4, 32, 256).transpose(0, 3, 1, 2, 4)
        tm.fc.weight.copy_(torch.tensor(kern.reshape(-1, 256).T))
        tm.fc.bias.copy_(torch.tensor(np.array(params["Dense_0"]["bias"])))
        tx = torch.tensor(np.array(x)[0].transpose(0, 3, 1, 2))  # (k,1,13,13)
        tout = tm(tx)
    np.testing.assert_allclose(np.array(out)[0], tout.numpy()[0], atol=ATOL)


def test_cnn_maze_stack_folding():
    """stack=2 doubles the fc input (perception.py:26,78-81 dummy discovery)."""
    enc = CNNMaze()
    x = jax.random.uniform(jax.random.PRNGKey(0), (3, 2, 13, 13, 1))
    params = enc.init(jax.random.PRNGKey(1), x)["params"]
    assert params["Dense_0"]["kernel"].shape == (1024, 256)
    out = enc.apply({"params": params}, x)
    assert out.shape == (3, 256)


def test_dueling_model_shapes_and_tat_conditioning():
    ncfg = NetConfig.from_name("tat-maze-lstm")
    model = build_model(ncfg, 4, (13, 13))
    params = model.init(jax.random.PRNGKey(0))
    assert set(params.keys()) == {"player0", "player1"}
    B = 6
    obs = jax.random.uniform(jax.random.PRNGKey(1), (B, 2, 1, 13, 13, 1))
    hx = jnp.zeros((B, 2, 128))
    vals, acts, ents, lps, hx2, cx2, rp = model.step_both(
        params, obs, hx, hx, jax.random.PRNGKey(2))
    assert vals.shape == (B, 2) and acts.shape == (B, 2)
    assert rp.shape == (B, 1)
    assert hx2.shape == (B, 2, 128)
    # TAT target output depends on the tracker action
    out_a = model.target_fwd(params, obs[:, 0], obs[:, 1], hx[:, 1], hx[:, 1],
                             jnp.zeros((B,), jnp.int32))
    out_b = model.target_fwd(params, obs[:, 0], obs[:, 1], hx[:, 1], hx[:, 1],
                             jnp.ones((B,), jnp.int32))
    assert not np.allclose(np.array(out_a.value), np.array(out_b.value))


def test_sample_discrete_greedy_and_logprob():
    logits = jnp.array([[0.0, 3.0, 0.0, 0.0], [5.0, 0.0, 0.0, 0.0]])
    s = sample_discrete(logits, jax.random.PRNGKey(0), test=True)
    assert s.action.tolist() == [1, 0]
    lp = jax.nn.log_softmax(logits)
    np.testing.assert_allclose(np.array(s.log_prob)[:, 0],
                               np.array(lp)[[0, 1], [1, 0]], atol=1e-6)
    # entropy matches -sum p log p
    p = jax.nn.softmax(logits)
    ent = -(p * lp).sum(-1)
    np.testing.assert_allclose(np.array(s.entropy)[:, 0], np.array(ent),
                               atol=1e-6)


def test_sampling_distribution():
    logits = jnp.log(jnp.array([[0.7, 0.1, 0.1, 0.1]])).repeat(4000, 0)
    s = sample_discrete(logits, jax.random.PRNGKey(0), test=False)
    freq = np.bincount(np.array(s.action), minlength=4) / 4000
    assert abs(freq[0] - 0.7) < 0.05


def test_init_distribution_bounds():
    """Conv/linear weights are U(-b, b), b = sqrt(6/(fan_in+fan_out))
    (the reference's effective init — see models/init.py docstring)."""
    enc = CNNMaze()
    x = jnp.zeros((1, 1, 13, 13, 1))
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    w = np.array(params["Conv_0"]["kernel"])  # (3,3,1,16)
    b = np.sqrt(6.0 / (1 * 9 + 9 * 16))
    assert np.abs(w).max() <= b
    assert np.abs(w).max() > 0.8 * b
    assert (np.array(params["Conv_0"]["bias"]) == 0).all()
