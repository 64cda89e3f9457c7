"""Op-level train-step profiling: capture a jax.profiler trace and reduce
its `hlo_stats` to a JSON summary (top ops + category shares).

The reference has no profiling beyond wall-clock FPS counters
(train.py:80,89 — SURVEY.md §5.1); the trainer here exposes `--profile-dir`
for raw traces, and this CLI turns a trace into the numbers that matter:
which HLO ops the step spends its time in, what they are bound by, and
whether anything lowered to a pathological per-row loop (round-4 found 80%
of the core in two such ops — see RESULTS.md §3.2c).

Usage:
    # capture + summarize the bench train step on the current backend:
    python -m active_tracking_rl_tpu.run.xprof_summary --capture
    # summarize an existing trace dir (e.g. from run.train --profile-dir):
    python -m active_tracking_rl_tpu.run.xprof_summary --trace-dir logs/prof
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os


def summarize_trace(trace_dir: str, top: int = 15) -> dict:
    """Parse the newest .xplane.pb under trace_dir via xprof's hlo_stats."""
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    tbl = json.loads(data if isinstance(data, str) else data.decode())
    tbl = tbl[0] if isinstance(tbl, list) else tbl
    cols = [c["label"] for c in tbl["cols"]]

    def cv(row, label):
        return row["c"][cols.index(label)]["v"]

    rows = tbl["rows"]
    total_us = sum(float(cv(r, "Total self time (us)")) for r in rows)
    cats = collections.Counter()
    for r in rows:
        cats[cv(r, "HLO op category")] += float(cv(r, "Total self time (us)"))
    rows.sort(key=lambda r: -float(cv(r, "Total self time (us)")))
    top_ops = [{
        "self_ms": round(float(cv(r, "Total self time (us)")) / 1000, 3),
        "share": round(float(cv(r, "Total self time (us)")) / total_us, 4),
        "occurrences": int(float(cv(r, "#Occurrences"))),
        "bound_by": cv(r, "Bound by"),
        "hlo_op": cv(r, "HLO op name"),
        "framework_op": str(cv(r, "Framework op name"))[:100],
    } for r in rows[:top]]
    return {
        "trace": paths[-1],
        "total_self_time_ms": round(total_us / 1000, 2),
        "categories": {k: round(v / total_us, 4)
                       for k, v in cats.most_common()},
        "top_ops": top_ops,
    }


def capture(num_envs: int, iters: int, env_id: str, network: str,
            out_dir: str) -> str:
    """Run the bench train step under jax.profiler and return the trace dir."""
    import jax
    import jax.numpy as jnp

    from active_tracking_rl_tpu.config import (NetConfig, TrainConfig,
                                               parse_env_id)
    from active_tracking_rl_tpu.envs.env import TrackEnv
    from active_tracking_rl_tpu.models.dueling import build_model
    from active_tracking_rl_tpu.rl.learner import (init_learner,
                                                   init_pool_ptr,
                                                   make_pool_fn,
                                                   make_train_step)

    # remat=True matches the production trainer/bench default
    tcfg = TrainConfig(env_id=env_id, num_envs=num_envs,
                       reset_pool=max(num_envs // 8, 64), train_mode=0,
                       remat=True)
    ncfg = NetConfig.from_name(network, aux="none")
    ecfg = parse_env_id(env_id)
    env = TrackEnv(ecfg)
    model = build_model(ncfg, ecfg.num_actions, ecfg.obs_shape)
    state, opt = init_learner(model, env, ncfg, tcfg, jax.random.PRNGKey(0))
    pool = (*jax.jit(make_pool_fn(env, tcfg))(jax.random.PRNGKey(9)),
            init_pool_ptr())
    ts = jax.jit(make_train_step(model, env, ncfg, tcfg, opt,
                                 external_pool=True))
    p, o, c = state.params, state.opt_state, state.carry
    mode = jnp.int32(0)
    for _ in range(2):
        p, o, c, m, _ptr = ts(p, o, c, mode, pool)
    jax.block_until_ready(m.loss)
    jax.profiler.start_trace(out_dir)
    for _ in range(iters):
        p, o, c, m, _ptr = ts(p, o, c, mode, pool)
    jax.block_until_ready(m.loss)
    jax.profiler.stop_trace()
    return out_dir


def main(argv=None):
    from active_tracking_rl_tpu.utils.platform import respect_jax_platforms
    respect_jax_platforms()
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/atr_xprof",
                    help="trace dir to summarize (and to write with --capture)")
    ap.add_argument("--capture", action="store_true",
                    help="capture a fresh trace of the bench train step first")
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--env", default="Track2D-BlockPartialNav-v0")
    ap.add_argument("--network", default="maze-lstm")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args(argv)
    if args.capture:
        import shutil
        shutil.rmtree(args.trace_dir, ignore_errors=True)
        capture(args.num_envs, args.iters, args.env, args.network,
                args.trace_dir)
    print(json.dumps(summarize_trace(args.trace_dir, args.top), indent=1))


if __name__ == "__main__":
    main()
