"""Random-agent smoke driver — the env-only FPS check
(random_agent_multi.py:8-54 analog).

Two modes:
  * default: N vectorized envs stepped under one jit for `--seconds`,
    printing raw simulator env-steps/s (no model, no learner);
  * --episodes K: K sequential episodes with per-episode reward/length
    printed, optionally rendered to a GIF (--gif out.gif), matching the
    reference script's eyeball-the-env purpose.

Usage:
    python -m active_tracking_rl_tpu.run.random_agent -e Track2D-BlockPartialNav-v0
    python -m active_tracking_rl_tpu.run.random_agent --episodes 3 --gif /tmp/ep.gif
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=None)
    p.add_argument("-e", "--env_id", default="Track2D-BlockPartialNav-v0")
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--episodes", type=int, default=0)
    p.add_argument("--gif", default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from active_tracking_rl_tpu.utils.platform import respect_jax_platforms
    respect_jax_platforms()
    import jax
    import jax.numpy as jnp

    from active_tracking_rl_tpu.config import parse_env_id
    from active_tracking_rl_tpu.envs.env import TrackEnv

    cfg = parse_env_id(args.env_id)
    env = TrackEnv(cfg)
    key = jax.random.PRNGKey(args.seed)

    if args.episodes:
        from active_tracking_rl_tpu.envs.render import (render_state,
                                                        save_episode_gif)
        reset_j, step_j = jax.jit(env.reset), jax.jit(env.step)
        rng = np.random.default_rng(args.seed)
        frames = []
        for ep in range(args.episodes):
            key, k = jax.random.split(key)
            state, _ = reset_j(k)
            total = np.zeros(cfg.num_agents)
            done, t = False, 0
            while not done:
                a = rng.integers(0, cfg.num_actions,
                                 size=(cfg.num_agents,)).astype(np.int32)
                state, _, rew, done_a, _ = step_j(state, a)
                total += np.asarray(rew)
                done = bool(np.asarray(done_a))
                if args.gif and ep == 0:
                    frames.append(render_state(cfg, state, mode="rgb_array"))
                t += 1
            print(f"episode {ep}: len {t} rewards {total.round(2)}")
        if frames:
            save_episode_gif(frames, args.gif)
            print(f"wrote {len(frames)} frames -> {args.gif}")
        return

    # batched FPS mode: one jitted scan of 20 random steps over N envs
    n, steps = args.num_envs, 20
    reset_b = jax.jit(lambda k: env.reset_batch_chunked(k, n))

    def block(carry, k):
        state = carry
        acts = jax.random.randint(k, (n, cfg.num_agents), 0, cfg.num_actions,
                                  dtype=jnp.int32)
        state, _, _, done, _ = env.step_batch(state, acts)
        return state, done.sum()

    @jax.jit
    def run_block(state, k):
        return jax.lax.scan(block, state, jax.random.split(k, steps))

    key, k = jax.random.split(key)
    state, _ = reset_b(k)
    state, _ = run_block(state, key)  # compile
    jax.block_until_ready(state.pos)
    t0, it = time.time(), 0
    while time.time() - t0 < args.seconds:
        key, k = jax.random.split(key)
        state, _ = run_block(state, k)
        it += 1
    jax.block_until_ready(state.pos)
    dt = time.time() - t0
    fps = it * n * steps / dt
    print(f"{args.env_id}: {fps:,.0f} env-steps/s "
          f"({n} envs x {steps}-step blocks, {jax.default_backend()})")


if __name__ == "__main__":
    main()
