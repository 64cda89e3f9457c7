"""Loss / GAE / optimizer numerics vs torch oracles implementing the
reference's documented update math (player_util.py:108-162,
shared_optim.py:90-175 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from active_tracking_rl_tpu.ops.gae import gae_returns
from active_tracking_rl_tpu.ops.losses import dueling_loss
from active_tracking_rl_tpu.rl.optim import shared_adam, shared_rmsprop
from tests.oracles import gae_reference


def test_gae_no_done_matches_reference_loop():
    T = 20
    rng = np.random.RandomState(0)
    rewards = rng.randn(T, 2).astype(np.float32)
    values = rng.randn(T, 2).astype(np.float32)
    boot = rng.randn(2).astype(np.float32)
    done = np.zeros(T, bool)
    ret, gae = gae_returns(jnp.array(rewards), jnp.array(values),
                           jnp.array(boot), jnp.array(done), 0.9, 1.0)
    for a in range(2):
        R_ref, g_ref = gae_reference(rewards[:, a], values[:, a], boot[a],
                                     0.9, 1.0)
        np.testing.assert_allclose(np.array(ret)[:, a], R_ref, rtol=1e-5)
        np.testing.assert_allclose(np.array(gae)[:, a], g_ref, rtol=1e-5)


def test_gae_masks_episode_boundaries():
    """A done at step t must cut bootstrapping: the segment before the done
    behaves as if it ended with bootstrap 0."""
    T = 10
    rng = np.random.RandomState(1)
    rewards = rng.randn(T, 1).astype(np.float32)
    values = rng.randn(T, 1).astype(np.float32)
    boot = rng.randn(1).astype(np.float32)
    done = np.zeros(T, bool)
    done[5] = True
    ret, gae = gae_returns(jnp.array(rewards), jnp.array(values),
                           jnp.array(boot), jnp.array(done), 0.9, 1.0)
    # segment 0..5: terminal, bootstrap 0
    R_ref, g_ref = gae_reference(rewards[:6, 0], values[:6, 0], 0.0, 0.9, 1.0)
    np.testing.assert_allclose(np.array(ret)[:6, 0], R_ref, rtol=1e-5)
    np.testing.assert_allclose(np.array(gae)[:6, 0], g_ref, rtol=1e-5)
    # segment 6..: bootstrapped
    R_ref2, g_ref2 = gae_reference(rewards[6:, 0], values[6:, 0], boot[0],
                                   0.9, 1.0)
    np.testing.assert_allclose(np.array(ret)[6:, 0], R_ref2, rtol=1e-5)
    np.testing.assert_allclose(np.array(gae)[6:, 0], g_ref2, rtol=1e-5)


def torch_optimize_oracle(rewards, values, boot, log_probs, entropies,
                          r_preds, mode, gamma, tau, w_ent, w_ent_t, aux):
    """player_util.py:118-154 in torch (values/log_probs require grad)."""
    T = rewards.shape[0]
    R = boot.detach().clone()
    policy_loss = torch.zeros(2)
    value_loss = torch.zeros(2)
    pred_loss = torch.zeros(())
    gae = torch.zeros(2)
    w = torch.tensor([w_ent, w_ent_t])
    values_ext = list(values) + [boot.detach()]
    l1 = torch.nn.L1Loss()
    for i in reversed(range(T)):
        if aux:
            pred_loss = pred_loss + l1(r_preds[i], rewards[i][0])
        R = gamma * R + rewards[i]
        adv = R - values_ext[i]
        value_loss = value_loss + 0.5 * adv.pow(2)
        delta = rewards[i] + gamma * values_ext[i + 1].detach() \
            - values_ext[i].detach()
        gae = gae * gamma * tau + delta
        policy_loss = policy_loss - log_probs[i] * gae.detach() \
            - w * entropies[i]
    lt = policy_loss[0] + 0.5 * value_loss[0]
    lg = policy_loss[1] + 0.5 * value_loss[1]
    if mode == 0:
        loss = lt
    elif mode == 1:
        loss = lg
    else:
        loss = lt + lg
    if aux and mode != 0:
        loss = loss + pred_loss
    return loss, policy_loss, value_loss, pred_loss


@pytest.mark.parametrize("mode,aux", [(-1, True), (0, True), (1, True),
                                      (-1, False)])
def test_dueling_loss_matches_torch_oracle(mode, aux):
    T = 12
    rng = np.random.RandomState(2)
    rewards = rng.randn(T, 2).astype(np.float32)
    values = rng.randn(T, 2).astype(np.float32)
    boot = rng.randn(2).astype(np.float32)
    log_probs = -np.abs(rng.randn(T, 2)).astype(np.float32)
    entropies = np.abs(rng.randn(T, 2)).astype(np.float32)
    r_preds = rng.randn(T).astype(np.float32)
    done = np.zeros(T, bool)

    stats = dueling_loss(jnp.array(rewards), jnp.array(values),
                         jnp.array(boot), jnp.array(log_probs),
                         jnp.array(entropies), jnp.array(done),
                         jnp.array(r_preds) if aux else None,
                         jnp.int32(mode), 0.9, 1.0, 0.01, 0.2, aux)

    tl, tp, tv, tpred = torch_optimize_oracle(
        torch.tensor(rewards), torch.tensor(values), torch.tensor(boot),
        torch.tensor(log_probs), torch.tensor(entropies),
        torch.tensor(r_preds), mode, 0.9, 1.0, 0.01, 0.2, aux)
    np.testing.assert_allclose(float(stats.loss), float(tl), rtol=1e-4)
    np.testing.assert_allclose(np.array(stats.policy_loss), tp.numpy(),
                               rtol=1e-4)
    np.testing.assert_allclose(np.array(stats.value_loss), tv.numpy(),
                               rtol=1e-4)
    if aux:
        np.testing.assert_allclose(float(stats.pred_loss), float(tpred),
                                   rtol=1e-4)


def test_loss_gradients_respect_mode():
    """mode 0 -> no gradient into target-side inputs and vice versa."""
    T = 6
    rng = np.random.RandomState(3)
    rewards = jnp.array(rng.randn(T, 2).astype(np.float32))
    boot = jnp.zeros((2,))
    done = jnp.zeros((T,), bool)

    def loss_of(values, log_probs, mode):
        ent = jnp.zeros_like(log_probs)
        st = dueling_loss(rewards, values, boot, log_probs, ent, done, None,
                          jnp.int32(mode), 0.9, 1.0, 0.01, 0.2, False)
        return st.loss

    v = jnp.array(rng.randn(T, 2).astype(np.float32))
    lp = jnp.array(-np.abs(rng.randn(T, 2)).astype(np.float32))
    gv, glp = jax.grad(loss_of, argnums=(0, 1))(v, lp, 0)
    assert np.abs(np.array(gv)[:, 1]).sum() == 0
    assert np.abs(np.array(glp)[:, 1]).sum() == 0
    assert np.abs(np.array(gv)[:, 0]).sum() > 0
    gv, glp = jax.grad(loss_of, argnums=(0, 1))(v, lp, 1)
    assert np.abs(np.array(gv)[:, 0]).sum() == 0
    assert np.abs(np.array(glp)[:, 1]).sum() > 0


def test_shared_adam_matches_torch_oracle():
    """SharedAdam semantics: amsgrad, eps added after sqrt, bias correction
    via step_size (shared_optim.py:122-175). Oracle in torch."""
    rng = np.random.RandomState(4)
    p0 = rng.randn(7).astype(np.float32)
    grads = [rng.randn(7).astype(np.float32) for _ in range(5)]

    opt = shared_adam(1e-3)
    params = {"w": jnp.array(p0)}
    state = opt.init(params)
    for g in grads:
        upd, state = opt.update({"w": jnp.array(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)

    # torch oracle
    tp = torch.tensor(p0.copy())
    m = torch.zeros(7)
    v = torch.zeros(7)
    vmax = torch.zeros(7)
    for t, g in enumerate(grads, start=1):
        tg = torch.tensor(g)
        m = 0.9 * m + 0.1 * tg
        v = 0.999 * v + 0.001 * tg * tg
        vmax = torch.maximum(vmax, v)
        denom = vmax.sqrt() + 1e-3
        step_size = 1e-3 * np.sqrt(1 - 0.999 ** t) / (1 - 0.9 ** t)
        tp = tp - step_size * m / denom
    np.testing.assert_allclose(np.array(params["w"]), tp.numpy(), rtol=1e-5)


@pytest.mark.parametrize("momentum,centered", [(0.0, False), (0.9, False),
                                               (0.0, True), (0.9, True)])
def test_shared_rmsprop_matches_torch_oracle(momentum, centered):
    """SharedRMSprop semantics: eps added *after* sqrt, centered subtracts
    grad_avg^2 before the sqrt, momentum buffer accumulates grad/avg
    (shared_optim.py:62-85). Oracle in torch, line-for-line."""
    rng = np.random.RandomState(11)
    p0 = rng.randn(7).astype(np.float32)
    grads = [rng.randn(7).astype(np.float32) for _ in range(6)]
    lr, alpha, eps = 7e-4, 0.99, 0.1

    opt = shared_rmsprop(lr, alpha, eps, momentum=momentum, centered=centered)
    params = {"w": jnp.array(p0)}
    state = opt.init(params)
    for g in grads:
        upd, state = opt.update({"w": jnp.array(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)

    # torch oracle (shared_optim.py:69-85)
    tp = torch.tensor(p0.copy())
    square_avg = torch.zeros(7)
    grad_avg = torch.zeros(7)
    buf = torch.zeros(7)
    for g in grads:
        tg = torch.tensor(g)
        square_avg = alpha * square_avg + (1 - alpha) * tg * tg
        if centered:
            grad_avg = alpha * grad_avg + (1 - alpha) * tg
            avg = (square_avg - grad_avg * grad_avg).sqrt() + eps
        else:
            avg = square_avg.sqrt() + eps
        if momentum > 0:
            buf = momentum * buf + tg / avg
            tp = tp - lr * buf
        else:
            tp = tp - lr * tg / avg
    np.testing.assert_allclose(np.array(params["w"]), tp.numpy(), rtol=1e-5)
