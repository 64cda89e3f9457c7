"""Paper evaluation matrix in ONE process: every tracker x every env
(reference README.md:74-83), one compile per env (the jitted evaluator from
``make_evaluator`` is parameter-generic, so trackers share the executable).

Usage:
    python -m active_tracking_rl_tpu.run.eval_matrix \
        --tracker advat=runs/r3-advat/.../tracker-best.msgpack \
        --tracker ram=runs/r3-tracker-ram/.../tracker-best.msgpack \
        --env Track2D-BlockPartialNav-v0 --env Track2D-MazePartialNav-v0 \
        --out matrix.json
"""

from __future__ import annotations

import argparse
import json

PAPER_ENVS = [
    "Track2D-BlockPartialNav-v0",
    "Track2D-BlockPartialRam-v0",
    "Track2D-MazePartialNav-v0",
    "Track2D-MazePartialRam-v0",
]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tracker", action="append", required=True,
                   help="name=path/to/tracker-best.msgpack (repeatable)")
    p.add_argument("--target", action="append", default=[],
                   help="name=path to a learned target; evaluated vs every "
                        "tracker on --adv-env (README.md:85-88)")
    p.add_argument("--env", action="append", default=None,
                   help="env id (repeatable; default: the 4 paper envs)")
    p.add_argument("--adv-env", default="Track2D-BlockPartialAdv-v0")
    p.add_argument("--network", default="tat-maze-lstm")
    p.add_argument("--num-episodes", type=int, default=100)
    p.add_argument("--eval-seeds", type=int, default=3,
                   help="independent eval seeds per cell; episodes pool "
                        "across seeds for the CI (round-3 verdict item 3)")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    from active_tracking_rl_tpu.utils.platform import respect_jax_platforms
    respect_jax_platforms()

    import jax
    import numpy as np

    from active_tracking_rl_tpu.config import NetConfig, parse_env_id
    from active_tracking_rl_tpu.envs.env import make_env
    from active_tracking_rl_tpu.models.dueling import build_model
    from active_tracking_rl_tpu.rl.checkpoint import load_params
    from active_tracking_rl_tpu.rl.evaluate import make_evaluator

    trackers = dict(t.split("=", 1) for t in args.tracker)
    targets = dict(t.split("=", 1) for t in args.target)
    envs = args.env or PAPER_ENVS
    ncfg = NetConfig.from_name(args.network)
    results: dict = {}

    from active_tracking_rl_tpu.utils.stats import wilson_ci

    def run_cell(env_id, tracker_name, tracker_path, target_path=None):
        ecfg = parse_env_id(env_id)
        model = build_model(ncfg, ecfg.num_actions, ecfg.obs_shape)
        base = model.init(jax.random.PRNGKey(args.seed))
        params = load_params(base, None, tracker_path, target_path)
        rets, lens, succs, per_seed = [], [], [], []
        for s in range(args.eval_seeds):
            ev = evaluator(params, jax.random.PRNGKey(args.seed + 101 * s))
            rets.append(ev["ep_returns"][:, 0])
            lens.append(ev["ep_lens"])
            succs.append(ev["ep_success"])
            per_seed.append({"R_mean": round(float(ev["R_mean"][0]), 2),
                             "S_rate": round(float(ev["S_rate"]), 3)})
        rets = np.concatenate(rets)
        lens = np.concatenate(lens)
        n = len(rets)
        # the evaluator's own per-episode success mask, so S_rate here always
        # agrees with the eval_fn regardless of its max_steps setting
        succ = int(np.concatenate(succs).sum())
        # 1.96 * sem: 95% normal CI on the mean return over pooled episodes
        row = {"R_mean": round(float(rets.mean()), 2),
               "R_std": round(float(rets.std()), 2),
               "R_ci95": round(1.96 * float(rets.std()) / np.sqrt(n), 2),
               "EL_mean": round(float(lens.mean()), 1),
               "EL_std": round(float(lens.std()), 1),
               "S_rate": round(succ / n, 4),
               "S_ci95": wilson_ci(succ, n),
               "episodes": n,
               "eval_seeds": args.eval_seeds,
               "per_seed": per_seed,
               "ep_returns": [round(float(r), 2) for r in rets],
               "ep_lens": [int(l) for l in lens]}
        key = tracker_name if target_path is None else f"{tracker_name}+target"
        results.setdefault(env_id, {})[key] = row
        print(env_id, key, json.dumps(
            {k: v for k, v in row.items()
             if k not in ("ep_returns", "ep_lens")}), flush=True)

    for env_id in envs:
        ecfg = parse_env_id(env_id)
        env = make_env(env_id)
        model = build_model(ncfg, ecfg.num_actions, ecfg.obs_shape)
        evaluator = make_evaluator(model, env, ncfg, args.num_episodes)
        for name, path in trackers.items():
            run_cell(env_id, name, path)

    if targets:
        env = make_env(args.adv_env)
        ecfg = parse_env_id(args.adv_env)
        model = build_model(ncfg, ecfg.num_actions, ecfg.obs_shape)
        evaluator = make_evaluator(model, env, ncfg, args.num_episodes)
        for tname, tpath in trackers.items():
            for gname, gpath in targets.items():
                run_cell(args.adv_env, tname, tpath, gpath)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
