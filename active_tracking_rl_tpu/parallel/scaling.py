"""Weak-scaling measurement of the FULL train step over a dp mesh.

BASELINE.md asks for scaling efficiency at 1 chip / 1 host / N hosts. Real
multi-chip hardware is not available in this image, so this harness times
the same jitted SPMD program (rollout + pool + loss + grad all-reduce +
update — `rl/learner.py:make_train_step`) over an N-virtual-device CPU mesh
at FIXED per-device batch (weak scaling): aggregate env-steps/s should grow
~linearly with dp while per-device time stays flat. On real hardware the
identical program scales over ICI (SURVEY.md §2.8) — only `make_mesh` input
changes.

Caveat printed with the results: this host has few physical cores, so dp
values above the core count are oversubscribed and measure scheduling, not
scaling; the table marks them.

Two modes:
  * single-process (default): dp virtual devices in one process. On a host
    with few cores this measures program partitioning, not resource scaling —
    XLA's intra-op thread pool already uses every core at dp=1.
  * --multiproc: N processes x 1 device, each `taskset`-pinned to its own
    physical core, joined by jax.distributed — compute capacity then really
    grows with N, so aggregate env-steps/s is a true weak-scaling signal
    (bounded by the physical core count).

Usage:
    JAX_PLATFORMS=cpu python -m active_tracking_rl_tpu.parallel.scaling \
        --dp 1 2 4 8 --envs-per-device 256
    JAX_PLATFORMS=cpu python -m active_tracking_rl_tpu.parallel.scaling \
        --multiproc --dp 1 2 --envs-per-device 128
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _bench_step(args, dp, local_devices=None, process_rank=0):
    """Build + time the sharded train step on the current (possibly
    multi-process) backend. Returns (step_s, num_envs)."""
    import jax
    import jax.numpy as jnp

    from active_tracking_rl_tpu.config import (NetConfig, TrainConfig,
                                               parse_env_id)
    from active_tracking_rl_tpu.envs.env import TrackEnv
    from active_tracking_rl_tpu.models.dueling import build_model
    from active_tracking_rl_tpu.parallel.mesh import (MeshSpec,
                                                      learner_shardings,
                                                      make_mesh, shard_learner)
    from active_tracking_rl_tpu.rl.learner import init_learner, make_train_step

    ecfg = parse_env_id(args.env)
    env = TrackEnv(ecfg)
    ncfg = NetConfig.from_name(args.network, aux="none")
    model = build_model(ncfg, ecfg.num_actions, ecfg.obs_shape)
    num_envs = args.envs_per_device * dp
    tcfg = TrainConfig(env_id=args.env, num_envs=num_envs,
                       reset_pool=max(num_envs // 8, 64), train_mode=0)
    mesh = make_mesh(MeshSpec(dp=dp), devices=jax.devices()[:dp])
    state, opt = init_learner(model, env, ncfg, tcfg, jax.random.PRNGKey(0))
    state = shard_learner(mesh, state)
    shs = learner_shardings(mesh, state)
    ts = jax.jit(make_train_step(model, env, ncfg, tcfg, opt),
                 in_shardings=shs, donate_argnums=(0, 1, 2))
    par, o, c = state.params, state.opt_state, state.carry
    mode = jnp.int32(0)
    for _ in range(2):
        par, o, c, m = ts(par, o, c, mode)
    jax.block_until_ready(m.loss)
    t0 = time.time()
    for _ in range(args.iters):
        par, o, c, m = ts(par, o, c, mode)
    jax.block_until_ready(m.loss)
    return (time.time() - t0) / args.iters, num_envs, tcfg.num_steps


def _worker(args):
    """One rank of a --multiproc run: 1 pinned core, 1 local device."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
    os.environ.setdefault("XLA_FLAGS", "")
    from active_tracking_rl_tpu.parallel.mesh import host_init
    host_init(args.coordinator, args.num_processes, args.process_id)
    dt, num_envs, num_steps = _bench_step(args, dp=args.num_processes)
    if jax.process_index() == 0:
        print(json.dumps({
            "dp": args.num_processes, "num_envs": num_envs,
            "step_s": round(dt, 4),
            "env_steps_per_s": round(num_envs * num_steps / dt, 1),
        }), flush=True)


def _run_multiproc(args) -> dict:
    """Spawn N taskset-pinned 1-device ranks per dp value; collect rank 0."""
    ncores = os.cpu_count() or 1
    rows = []
    for n in args.dp:
        if n > ncores:
            rows.append({"dp": n, "skipped": f"> {ncores} physical cores"})
            continue
        port = 12000 + n
        procs = []
        for r in range(n):
            cmd = ["taskset", "-c", str(r % ncores), sys.executable, "-m",
                   "active_tracking_rl_tpu.parallel.scaling", "--worker",
                   "--coordinator", f"127.0.0.1:{port}",
                   "--num-processes", str(n), "--process-id", str(r),
                   "--envs-per-device", str(args.envs_per_device),
                   "--iters", str(args.iters), "--env", args.env,
                   "--network", args.network]
            env = dict(os.environ, JAX_PLATFORMS="cpu")
            procs.append(subprocess.Popen(
                cmd, stdout=subprocess.PIPE if r == 0 else subprocess.DEVNULL,
                stderr=subprocess.PIPE if r == 0 else subprocess.DEVNULL,
                env=env, text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))))))
        out, err = procs[0].communicate(timeout=2400)
        for pr in procs[1:]:
            pr.wait(timeout=60)
        lines = [l for l in out.splitlines() if l.startswith("{")]
        if not lines:
            raise RuntimeError(
                f"dp={n}: rank 0 produced no JSON result line.\n"
                f"rank-0 stderr (tail):\n{err[-2000:]}")
        rows.append(json.loads(lines[-1]))
    done = [r for r in rows if "env_steps_per_s" in r]
    base = done[0]["env_steps_per_s"] / done[0]["dp"] if done else 1.0
    for r in done:
        r["weak_scaling_eff"] = round(
            (r["env_steps_per_s"] / r["dp"]) / base, 3)
    return {"mode": "multiproc (1 pinned core x 1 device per rank)",
            "physical_cores": ncores,
            "envs_per_device": args.envs_per_device, "rows": rows}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dp", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--envs-per-device", type=int, default=256)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--env", default="Track2D-BlockPartialNav-v0")
    p.add_argument("--network", default="maze-lstm")
    p.add_argument("--out", default=None, help="also write JSON here")
    p.add_argument("--multiproc", action="store_true")
    # internal worker-rank flags
    p.add_argument("--worker", action="store_true")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    args = p.parse_args(argv)

    if args.worker:
        _worker(args)
        return
    if args.multiproc:
        out = _run_multiproc(args)
        print(json.dumps(out, indent=1))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(out, f, indent=1)
        return

    from active_tracking_rl_tpu.utils.platform import respect_jax_platforms
    respect_jax_platforms(num_cpu_devices=max(args.dp))
    import jax
    import jax.numpy as jnp

    from active_tracking_rl_tpu.config import (NetConfig, TrainConfig,
                                               parse_env_id)
    from active_tracking_rl_tpu.envs.env import TrackEnv
    from active_tracking_rl_tpu.models.dueling import build_model
    from active_tracking_rl_tpu.parallel.mesh import (MeshSpec,
                                                      learner_shardings,
                                                      make_mesh, shard_learner)
    from active_tracking_rl_tpu.rl.learner import init_learner, make_train_step

    ncores = os.cpu_count() or 1
    ecfg = parse_env_id(args.env)
    env = TrackEnv(ecfg)
    ncfg = NetConfig.from_name(args.network, aux="none")
    model = build_model(ncfg, ecfg.num_actions, ecfg.obs_shape)

    rows = []
    for dp in args.dp:
        num_envs = args.envs_per_device * dp
        tcfg = TrainConfig(env_id=args.env, num_envs=num_envs,
                           reset_pool=max(num_envs // 8, 64), train_mode=0)
        mesh = make_mesh(MeshSpec(dp=dp), devices=jax.devices()[:dp])
        state, opt = init_learner(model, env, ncfg, tcfg,
                                  jax.random.PRNGKey(0))
        state = shard_learner(mesh, state)
        shs = learner_shardings(mesh, state)
        ts = jax.jit(make_train_step(model, env, ncfg, tcfg, opt),
                     in_shardings=shs, donate_argnums=(0, 1, 2))
        par, o, c = state.params, state.opt_state, state.carry
        mode = jnp.int32(0)
        for _ in range(2):
            par, o, c, m = ts(par, o, c, mode)
        jax.block_until_ready(m.loss)
        t0 = time.time()
        for _ in range(args.iters):
            par, o, c, m = ts(par, o, c, mode)
        jax.block_until_ready(m.loss)
        dt = (time.time() - t0) / args.iters
        rows.append({
            "dp": dp, "num_envs": num_envs, "step_s": round(dt, 4),
            "env_steps_per_s": round(num_envs * tcfg.num_steps / dt, 1),
            "oversubscribed": dp > ncores,
        })
        del par, o, c, ts, state

    base = rows[0]["env_steps_per_s"] / rows[0]["dp"]
    for r in rows:
        r["weak_scaling_eff"] = round(
            (r["env_steps_per_s"] / r["dp"]) / base, 3)
    out = {"platform": jax.default_backend(), "physical_cores": ncores,
           "envs_per_device": args.envs_per_device, "rows": rows}
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
