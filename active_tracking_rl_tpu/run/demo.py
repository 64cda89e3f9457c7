"""Render a trained agent — the reference's `gym_eval.py --render` workflow
(gym_eval.py:99-108) as a GIF writer.

    python -m active_tracking_rl_tpu.run.demo \
        --env Track2D-BlockPartialNav-v0 --load-tracker .../tracker-best.msgpack \
        --gif demo.gif
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="Track2D-BlockPartialNav-v0")
    p.add_argument("--network", default="tat-maze-lstm")
    p.add_argument("--load-tracker", default=None)
    p.add_argument("--load-target", default=None)
    p.add_argument("--load-model-dir", default=None)
    p.add_argument("--episodes", type=int, default=1)
    p.add_argument("--gif", default="demo.gif")
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--rnn-out", type=int, default=128)
    p.add_argument("--center-full-obs", action="store_true",
                   help="feed the policy egocentrically centered Full-obs "
                        "frames (must match how the checkpoint was trained; "
                        "envs/observe.py). Rendering still shows the true "
                        "map")
    args = p.parse_args(argv)
    from active_tracking_rl_tpu.utils.platform import respect_jax_platforms
    respect_jax_platforms()

    import jax
    import jax.numpy as jnp

    from active_tracking_rl_tpu.config import NetConfig, parse_env_id
    from active_tracking_rl_tpu.envs.bridge import GymTrackEnv
    from active_tracking_rl_tpu.envs.render import save_episode_gif
    from active_tracking_rl_tpu.models.dueling import build_model
    from active_tracking_rl_tpu.rl.checkpoint import load_params

    ecfg = parse_env_id(args.env)
    if args.center_full_obs:
        import dataclasses
        ecfg = dataclasses.replace(ecfg, center_full_obs=True)
    ncfg = NetConfig.from_name(args.network, rnn_out=args.rnn_out)
    model = build_model(ncfg, ecfg.num_actions, ecfg.obs_shape)
    params = load_params(model.init(jax.random.PRNGKey(0)),
                         args.load_model_dir, args.load_tracker,
                         args.load_target)
    act = jax.jit(lambda pr, o, h, c, k: model.step_both(pr, o, h, c, k,
                                                         test=True))

    env = GymTrackEnv(args.env, cfg=ecfg, seed=args.seed)
    frames = []
    key = jax.random.PRNGKey(args.seed)
    for ep in range(args.episodes):
        obs = env.reset()
        hx = jnp.zeros((1, 2, ncfg.rnn_out), jnp.float32)
        cx = jnp.zeros_like(hx)
        done, t, ret = False, 0, 0.0
        frames.append(env.render(mode="rgb_array"))
        while not done:
            # (2, 1, H, W) channel-first -> (1, 2, k=1, H, W, 1)
            o = jnp.asarray(obs, jnp.float32)[None, ..., None]
            key, k = jax.random.split(key)
            _, actions, _, _, hx, cx, _ = act(params, o, hx, cx, k)
            obs, rew, done, _ = env.step(np.asarray(actions)[0])
            ret += float(rew[0])
            frames.append(env.render(mode="rgb_array"))
            t += 1
        print(f"episode {ep}: len {t} tracker return {ret:.1f}")
    save_episode_gif(frames, args.gif)
    print(f"wrote {len(frames)} frames -> {args.gif}")


if __name__ == "__main__":
    main()
