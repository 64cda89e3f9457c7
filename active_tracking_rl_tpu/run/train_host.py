"""Host-env training CLI — the reference's 3D/UnrealCV recipe
(README.md:85-106: `main.py --env UnrealTrack...`) against the TPU learner.

Builds a HostEnvPool of `--num-envs` create_env() instances (the reference's
wrapper chain: Rescale/ImagePreprocess/FrameStack, environment.py:11-32) and
trains via rl/host_loop.py: act + update jitted on device, env stepping on
host CPU. Works with ANY gym-API env, including gym_unrealcv when installed;
smoke-testable with the built-in Track2D gym adapter.

Example:
    python -m active_tracking_rl_tpu.run.train_host \
        --env Track2D-BlockPartialRam-v0 --num-envs 8 --total-iters 200
"""

from __future__ import annotations

import argparse
import os
import time
from datetime import datetime

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="host-env (3D family) trainer")
    p.add_argument("--env", default="Track2D-BlockPartialRam-v0")
    p.add_argument("--num-envs", type=int, default=8)
    p.add_argument("--num-steps", type=int, default=20)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--gamma", type=float, default=0.9)
    p.add_argument("--tau", type=float, default=1.0)
    p.add_argument("--entropy", type=float, default=0.01)
    p.add_argument("--entropy-target", type=float, default=0.2)
    p.add_argument("--network", default="maze-lstm")
    p.add_argument("--aux", default="none")
    p.add_argument("--train-mode", type=int, default=0)
    p.add_argument("--optimizer", default="Adam")
    p.add_argument("--stack-frames", type=int, default=1)
    p.add_argument("--rnn-out", type=int, default=128)
    p.add_argument("--rescale", action="store_true",
                   help="Rescale wrapper (environment.py:20, 3D family)")
    p.add_argument("--input-size", type=int, default=80)
    p.add_argument("--gray", action="store_true")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--total-iters", type=int, default=1000)
    p.add_argument("--log-dir", default="logs")
    p.add_argument("--checkpoint-every", type=int, default=200)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from active_tracking_rl_tpu.utils.platform import respect_jax_platforms
    respect_jax_platforms()
    import jax

    from active_tracking_rl_tpu.config import (NetConfig, TrainConfig,
                                               parse_env_id)
    from active_tracking_rl_tpu.envs.bridge import HostEnvPool, create_env
    from active_tracking_rl_tpu.models.dueling import build_model
    from active_tracking_rl_tpu.rl.checkpoint import CheckpointManager
    from active_tracking_rl_tpu.rl.host_loop import HostTrainer
    from active_tracking_rl_tpu.utils.logging import MetricWriter, setup_logger

    tcfg = TrainConfig(
        env_id=args.env, lr=args.lr, gamma=args.gamma, tau=args.tau,
        entropy=args.entropy, entropy_target=args.entropy_target,
        seed=args.seed, num_steps=args.num_steps, num_envs=args.num_envs,
        optimizer=args.optimizer, train_mode=args.train_mode)
    ncfg = NetConfig.from_name(args.network, rnn_out=args.rnn_out,
                               stack_frames=args.stack_frames, aux=args.aux)

    run_dir = os.path.join(args.log_dir, args.env + "-host",
                           datetime.now().strftime("%b%d_%H-%M"))
    log = setup_logger(f"{args.env}_host_log", os.path.join(run_dir, "logger"))
    for k, v in vars(args).items():
        log.info(f"{k}: {v}")

    pool = HostEnvPool([
        (lambda i=i: create_env(args.env, rescale=args.rescale,
                                stack_frames=args.stack_frames,
                                input_size=args.input_size, gray=args.gray,
                                seed=args.seed + i))
        for i in range(args.num_envs)])
    probe = pool.envs[0]
    action_low = action_high = None
    if "Track2D" in args.env:
        ecfg = parse_env_id(args.env)
        num_actions, obs_hw = ecfg.num_actions, ecfg.obs_shape
        single = False            # 1v1: scripted/learned second agent
    else:
        space = probe.action_space
        num_actions = getattr(space, "n", None) or space.shape[-1]
        oshape = probe.observation_space.shape
        obs_hw = tuple(oshape[-2:])
        single = True             # external single-agent env
        if ncfg.continuous and hasattr(space, "low"):
            # Box bounds for the wrap_action rescale of [-1,1] policy
            # actions (player_util.py:39-42,49-51).
            action_low = np.asarray(space.low, np.float32)
            action_high = np.asarray(space.high, np.float32)

    model = build_model(ncfg, num_actions, obs_hw, single=single)
    trainer = HostTrainer(model, ncfg, tcfg, pool, seed=args.seed,
                          action_low=action_low, action_high=action_high)
    writer = MetricWriter(run_dir)
    ckpt = CheckpointManager(run_dir, split=True)

    env_steps_per_iter = args.num_envs * args.num_steps
    t_last = time.time()
    for it in range(1, args.total_iters + 1):
        m = trainer.train_iter(mode=args.train_mode)
        if it % 10 == 0 or it == 1:
            m = jax.device_get(m)
            fin = trainer.finished_returns[-50:]
            fps = (10 if it > 1 else 1) * env_steps_per_iter / (
                time.time() - t_last)
            t_last = time.time()
            writer.write(it, {
                "train/policy_loss_0": m.policy_loss[0],
                "train/value_loss_0": m.value_loss[0],
                "train/entropies0": m.entropy[0],
                "train/reward_0": np.mean(fin) if fin else 0.0,
                "train/fps": fps,
                "train/grad_norm": m.grad_norm,
            })
            log.info(f"iter {it} loss {float(m.loss):.3f} "
                     f"R0 {np.mean(fin) if fin else 0.0:.1f} "
                     f"env-steps/s {fps:.0f}")
        if it % args.checkpoint_every == 0 or it == args.total_iters:
            fin = trainer.finished_returns[-100:]
            score = float(np.mean(fin)) if fin else -1e9
            ckpt.save(jax.device_get(trainer.params),
                      {"params": jax.device_get(trainer.params),
                       "opt_state": jax.device_get(trainer.opt_state),
                       "step": it}, score, it)
            log.info(f"checkpoint iter {it}: recent R0 {score:.1f}")
    writer.close()
    return trainer.params


if __name__ == "__main__":
    main()
