"""Measure the round-4 verdict's overlap hypothesis (next-step 1b): does
folding next-iteration reset-pool generation INTO the jitted train step
(pool threaded through the program) beat running them as two back-to-back
programs, by letting the XLA scheduler interleave the pool's VPU/VMEM work
with the rollout?

Three steady-state variants, identical semantics (fresh pool per iteration,
exact K=1 reference reset behavior):
  A. today's contract path: ONE program that generates the pool in-program
     (make_train_step external_pool=False);
  B. two programs per iteration: external-pool train step + pool_fn;
  C. MERGED: one program computing the train step AND the next iteration's
     pool (returned as an output, consumed by the next call).

Writes OVERLAP_PROBE.json. Run on the chip: python runs/probe_overlap.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from active_tracking_rl_tpu.config import NetConfig, TrainConfig, parse_env_id
from active_tracking_rl_tpu.envs.env import TrackEnv
from active_tracking_rl_tpu.models.dueling import build_model
from active_tracking_rl_tpu.rl.learner import (init_learner, init_pool_ptr,
                                               make_pool_fn, make_train_step)


def main():
    env_id = "Track2D-BlockPartialNav-v0"
    ecfg = parse_env_id(env_id)
    env = TrackEnv(ecfg)
    tcfg = TrainConfig(env_id=env_id, num_envs=4096, reset_pool=512,
                       num_steps=20, train_mode=0)
    ncfg = NetConfig.from_name("maze-lstm", aux="none")
    model = build_model(ncfg, ecfg.num_actions, ecfg.obs_shape)
    state, opt = init_learner(model, env, ncfg, tcfg, jax.random.PRNGKey(0))
    mode = jnp.int32(0)
    out = {}

    def timeit(fn, n=10):
        for _ in range(3):
            r = fn()
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(n):
            r = fn()
        jax.block_until_ready(r)
        return (time.time() - t0) / n

    # --- A: in-program pool (the contract path) ---
    ts_a = jax.jit(make_train_step(model, env, ncfg, tcfg, opt),
                   donate_argnums=(0, 1, 2))
    sa = {"p": state.params, "o": state.opt_state, "c": state.carry}

    def step_a():
        sa["p"], sa["o"], sa["c"], m = ts_a(sa["p"], sa["o"], sa["c"], mode)
        return m.loss

    out["A_in_program_s"] = timeit(step_a)

    # --- B: two programs (external pool + separate pool_fn) ---
    state, opt = init_learner(model, env, ncfg, tcfg, jax.random.PRNGKey(0))
    ts_b = jax.jit(make_train_step(model, env, ncfg, tcfg, opt,
                                   external_pool=True),
                   donate_argnums=(0, 1, 2))
    pool_fn = jax.jit(make_pool_fn(env, tcfg))
    sb = {"p": state.params, "o": state.opt_state, "c": state.carry, "i": 0}

    def step_b():
        pool = pool_fn(jax.random.fold_in(jax.random.PRNGKey(7), sb["i"]))
        sb["i"] += 1
        sb["p"], sb["o"], sb["c"], m, _ = ts_b(
            sb["p"], sb["o"], sb["c"], mode, (*pool, init_pool_ptr()))
        return m.loss

    out["B_two_programs_s"] = timeit(step_b)

    # --- C: merged — the train step also generates the NEXT pool ---
    state, opt = init_learner(model, env, ncfg, tcfg, jax.random.PRNGKey(0))
    inner = make_train_step(model, env, ncfg, tcfg, opt, external_pool=True)

    @jax.jit
    def ts_c(params, opt_state, carry, pool, it):
        params, opt_state, carry, m, _ = inner(
            params, opt_state, carry, mode, (*pool, init_pool_ptr()))
        next_pool = env.reset_batch(
            jax.random.fold_in(jax.random.PRNGKey(7), it), tcfg.reset_pool)
        return params, opt_state, carry, m, next_pool

    pool0 = pool_fn(jax.random.PRNGKey(7))
    sc = {"p": state.params, "o": state.opt_state, "c": state.carry,
          "pool": pool0, "i": jnp.int32(0)}

    def step_c():
        sc["p"], sc["o"], sc["c"], m, sc["pool"] = ts_c(
            sc["p"], sc["o"], sc["c"], sc["pool"], sc["i"])
        sc["i"] = sc["i"] + 1
        return m.loss

    out["C_merged_s"] = timeit(step_c)

    out["note"] = (
        "K=1 exact semantics, Nav maze-lstm, 4096 envs, pool 512. "
        "A = pool generated inside the train step (contract path); "
        "B = external pool_fn + train step as two dispatches; C = one "
        "merged program that also emits the next iteration's pool. If "
        "C ~= A ~= B the TPU core is executing the pool and rollout work "
        "sequentially either way (no intra-core overlap to be had); a "
        "C < A gap would indicate scheduler interleaving wins.")
    print(json.dumps(out, indent=1))
    with open("OVERLAP_PROBE.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
