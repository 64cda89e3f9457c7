"""Multi-process SPMD self-check: one rank of a 2-process (or N-process)
`jax.distributed` run over virtual CPU devices.

Run by tests/test_multihost.py as two subprocesses (SURVEY.md §4 item 5:
multi-host without a cluster). Each rank builds the SAME tiny learner, jits
the FULL train step over the global ('dp','tp') mesh, executes a few steps
and prints a digest of the (replicated) parameters. Identical digests across
ranks prove the gradient all-reduce and replicated update really ran as one
SPMD program — the TPU-native replacement for the reference's shared-memory
Hogwild plane (main.py:86,102-119, utils.py:36-44).

Usage:
    python -m active_tracking_rl_tpu.parallel.mp_check \
        --coordinator 127.0.0.1:PORT --num-processes 2 --process-id R \
        [--local-devices 4] [--steps 3]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--local-devices", type=int, default=4)
    p.add_argument("--steps", type=int, default=3)
    args = p.parse_args(argv)

    import jax
    # Order matters: force CPU + virtual device count, then distributed
    # init, all before the backend is first touched. (The host image's
    # sitecustomize pins the TPU plugin via jax.config.update, so env vars
    # alone are not enough — see tests/conftest.py.)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.local_devices)
    from active_tracking_rl_tpu.parallel.mesh import host_init
    host_init(args.coordinator, args.num_processes, args.process_id)

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from active_tracking_rl_tpu.config import (NetConfig, TrainConfig,
                                               parse_env_id)
    from active_tracking_rl_tpu.envs.env import TrackEnv
    from active_tracking_rl_tpu.models.dueling import build_model
    from active_tracking_rl_tpu.parallel.mesh import (MeshSpec,
                                                      learner_shardings,
                                                      make_mesh, shard_learner)
    from active_tracking_rl_tpu.rl.learner import init_learner, make_train_step

    n_global = args.num_processes * args.local_devices
    assert len(jax.devices()) == n_global, (
        f"expected {n_global} global devices, got {len(jax.devices())}")
    assert len(jax.local_devices()) == args.local_devices

    env_id = "Track2D-EmptyPartialPZR-v0"
    tcfg = TrainConfig(env_id=env_id, num_envs=2 * n_global,
                       reset_pool=n_global, num_steps=2)
    ncfg = NetConfig.from_name("tat-maze-lstm")
    ecfg = dataclasses.replace(parse_env_id(env_id), max_episode_steps=8,
                               nav_goal_candidates=4, flood_iters=32,
                               tape_len=16)
    env = TrackEnv(ecfg)
    model = build_model(ncfg, ecfg.num_actions, ecfg.obs_shape)
    state, opt = init_learner(model, env, ncfg, tcfg, jax.random.PRNGKey(0))

    mesh = make_mesh(MeshSpec())
    state = shard_learner(mesh, state)
    shardings = learner_shardings(mesh, state)
    train_step = jax.jit(make_train_step(model, env, ncfg, tcfg, opt),
                         in_shardings=shardings)
    params, opt_state, carry = state.params, state.opt_state, state.carry
    for _ in range(args.steps):
        params, opt_state, carry, metrics = train_step(
            params, opt_state, carry, jnp.int32(-1))
    jax.block_until_ready(params)
    loss = float(metrics.loss)
    # digest over the replicated params: all leaves are addressable on every
    # process (P() replication), so device_get works on each rank.
    leaves = jax.tree_util.tree_leaves(params)
    digest = float(sum(np.abs(np.asarray(l)).sum() for l in leaves))
    assert np.isfinite(loss) and np.isfinite(digest)
    print(f"MPCHECK rank={args.process_id} loss={loss:.6f} "
          f"digest={digest:.6f} devices={len(jax.devices())}", flush=True)


if __name__ == "__main__":
    main()
