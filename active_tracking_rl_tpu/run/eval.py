"""Offline evaluation CLI — gym_eval.py equivalent.

Example (README.md:77 equivalent):
    python -m active_tracking_rl_tpu.run.eval \
        --env Track2D-BlockPartialNav-v0 --network tat-maze-lstm \
        --load-tracker logs/.../tracker-best.msgpack --csv out.csv
"""

from __future__ import annotations

import argparse
import csv
import os

import jax

from active_tracking_rl_tpu.config import NetConfig, parse_env_id
from active_tracking_rl_tpu.envs.env import make_env
from active_tracking_rl_tpu.models.dueling import build_model
from active_tracking_rl_tpu.rl.checkpoint import load_params
from active_tracking_rl_tpu.rl.evaluate import evaluate
from active_tracking_rl_tpu.utils.logging import setup_logger


def build_argparser():
    p = argparse.ArgumentParser(description="A3C_EVAL (gym_eval.py:15-37)")
    p.add_argument("--env", default="Track2D-BlockPartialNav-v0")
    p.add_argument("--num-episodes", type=int, default=100)
    p.add_argument("--load-model-dir", default=None)
    p.add_argument("--load-tracker", default=None)
    p.add_argument("--load-target", default=None)
    p.add_argument("--log-dir", default="logs/")
    p.add_argument("--csv", default=None)
    p.add_argument("--network", default="tat-maze-lstm")
    p.add_argument("--stack-frames", type=int, default=1)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--rnn-out", type=int, default=128)
    p.add_argument("--center-full-obs", action="store_true",
                   help="evaluate with the Full-obs egocentric-centering "
                        "training aid (must match how the checkpoint was "
                        "trained; envs/observe.py)")
    return p


def main(argv=None):
    from active_tracking_rl_tpu.utils.platform import respect_jax_platforms
    respect_jax_platforms()
    args = build_argparser().parse_args(argv)
    log = setup_logger(f"{args.env}_mon_log",
                       os.path.join(args.log_dir, f"{args.env}_mon_log"))
    for k, v in vars(args).items():
        log.info(f"{k}: {v}")

    ecfg = parse_env_id(args.env)
    if args.center_full_obs:
        import dataclasses
        ecfg = dataclasses.replace(ecfg, center_full_obs=True)
    env = make_env(args.env, ecfg)
    ncfg = NetConfig.from_name(args.network, rnn_out=args.rnn_out,
                               stack_frames=args.stack_frames)
    model = build_model(ncfg, ecfg.num_actions, ecfg.obs_shape)
    params = model.init(jax.random.PRNGKey(args.seed))
    params = load_params(params, args.load_model_dir, args.load_tracker,
                         args.load_target)

    metrics = evaluate(model, env, ncfg, params,
                       jax.random.PRNGKey(args.seed), args.num_episodes)
    log.info(
        "R_mean: {0}, R_std: {1}, EL_mean: {2:.2f}, EL_std {3:.2f}, "
        "R_step: {4}, S_rate: {5}".format(
            metrics["R_mean"], metrics["R_std"], float(metrics["EL_mean"]),
            float(metrics["EL_std"]), metrics["R_step"],
            float(metrics["S_rate"])))

    if args.csv:
        header = ["Env", "Seed", "R_mean", "R_std", "EL_mean", "EL_std",
                  "S_rate"]
        row = {"Env": args.env, "Seed": args.seed,
               "R_mean": float(metrics["R_mean"][0]),
               "R_std": float(metrics["R_std"][0]),
               "EL_mean": float(metrics["EL_mean"]),
               "EL_std": float(metrics["EL_std"]),
               "S_rate": float(metrics["S_rate"])}
        exists = os.path.exists(args.csv)
        with open(args.csv, "a" if exists else "w", newline="") as f:
            w = csv.DictWriter(f, header)
            if not exists:
                w.writeheader()
            w.writerow(row)
    return metrics


if __name__ == "__main__":
    main()
