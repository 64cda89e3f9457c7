"""Benchmark: env-steps/s/chip for the full training pipeline
(vectorized Track2D rollout + dueling A2C update, BASELINE.json config 2:
Track2D-BlockPartialNav-v0, maze-lstm tracker).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline provenance: the reference repo publishes no numbers (BASELINE.md).
`vs_baseline` is measured against a faithful single-process emulation of the
reference worker hot loop (batch-1 torch maze-lstm forward + A2C backward
every 20 steps + NumPy env step, per SURVEY.md §3.2), scaled x16 workers (the
README's 16-core CPU recipe, README.md:54-57). Run `python bench.py
--measure-baseline` to (re)measure it on the current host; the stored value
in BASELINE_MEASURED.json was measured on this image's CPU.
"""

from __future__ import annotations

import argparse
import json
import os
import time

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")


def measure_reference_emulation(seconds: float = 10.0) -> dict:
    """Emulate the reference worker loop (train.py:69-95) in torch+numpy."""
    import numpy as np
    import torch
    import torch.nn as nn

    torch.set_num_threads(1)  # main.py:3 OMP_NUM_THREADS=1

    class MazeLSTM(nn.Module):  # maze-lstm tracker, batch 1 (SURVEY §2.3)
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(1, 16, 3, stride=2, padding=1)
            self.c2 = nn.Conv2d(16, 32, 3, stride=2, padding=1)
            self.fc = nn.Linear(512, 256)
            self.lstm = nn.LSTMCell(256, 128)
            self.actor = nn.Linear(128, 4)
            self.critic = nn.Linear(128, 1)

        def forward(self, x, hc):
            x = torch.relu(self.c1(x))
            x = torch.relu(self.c2(x))
            x = torch.relu(self.fc(x.reshape(1, -1)))
            h, c = self.lstm(x, hc)
            return self.actor(h), self.critic(h), (h, c)

    # two players (tracker + tat-ish target with doubled obs)
    m0, m1 = MazeLSTM(), MazeLSTM()
    opt = torch.optim.Adam(list(m0.parameters()) + list(m1.parameters()),
                           lr=1e-3)
    maze = (np.random.rand(94, 94) < 0.05).astype(np.uint8)
    maze[0, :] = maze[-1, :] = maze[:, 0] = maze[:, -1] = 1
    pos = np.array([[40, 40], [41, 41]])
    deltas = np.array([[-1, 0], [1, 0], [0, -1], [0, 1]])

    def env_step(a):
        nonlocal pos
        for i in range(2):
            n = pos[i] + deltas[a[i]]
            if maze[n[0], n[1]] == 0:
                pos[i] = n
        obs = []
        for i in range(2):
            crop = np.pad(maze, 6, constant_values=1)[
                pos[i][0]:pos[i][0] + 13, pos[i][1]:pos[i][1] + 13].copy()
            obs.append(crop.astype(np.float32))
        d = float(np.linalg.norm(pos[0] - pos[1]))
        return obs, max(1 - d / 3.0, -1.0)

    steps = 0
    t0 = time.time()
    hc0 = (torch.zeros(1, 128), torch.zeros(1, 128))
    hc1 = (torch.zeros(1, 128), torch.zeros(1, 128))
    while time.time() - t0 < seconds:
        buf = []
        for _ in range(20):
            o, r = env_step(np.random.randint(0, 4, 2))
            x0 = torch.tensor(o[0])[None, None]
            logits0, v0, hc0 = m0(x0, hc0)
            logits1, v1, hc1 = m1(x0, hc1)
            lp0 = torch.log_softmax(logits0, -1)
            lp1 = torch.log_softmax(logits1, -1)
            buf.append((lp0[0, 0] + lp1[0, 0], v0, v1, r))
            steps += 1
        loss = sum(-lp * r + 0.5 * (v0 - r) ** 2 + 0.5 * (v1 + r) ** 2
                   for lp, v0, v1, r in buf).sum()
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(
            list(m0.parameters()) + list(m1.parameters()), 50)
        opt.step()
        hc0 = (hc0[0].detach(), hc0[1].detach())
        hc1 = (hc1[0].detach(), hc1[1].detach())
    per_worker = steps / (time.time() - t0)
    return {
        "per_worker_steps_s": per_worker,
        "workers": 16,
        "baseline_env_steps_s": per_worker * 16,
        "note": "reference worker emulation: batch-1 torch maze-lstm fwd x2 "
                "players + A2C bwd per 20 steps + numpy env; x16 workers "
                "(README.md:54-57)",
    }


def run_bench(num_envs: int = 4096, num_steps: int = 20, iters: int = 10,
              env_id: str = "Track2D-BlockPartialNav-v0",
              network: str = "maze-lstm", train_mode: int = 0,
              bf16: bool = False, pool_refresh: int = 1,
              remat: bool = True):
    import jax
    import jax.numpy as jnp

    # Steady-state amortization: with K>1 the timed window must contain a
    # whole number of refresh periods or the measured gen-per-iter ratio is
    # not the claimed K.
    if pool_refresh > 1 and iters % pool_refresh:
        iters = ((iters // pool_refresh) + 1) * pool_refresh

    from active_tracking_rl_tpu.config import (NetConfig, TrainConfig,
                                               parse_env_id)
    from active_tracking_rl_tpu.envs.env import TrackEnv
    from active_tracking_rl_tpu.models.dueling import build_model
    from active_tracking_rl_tpu.rl.learner import init_learner, make_train_step

    tcfg = TrainConfig(env_id=env_id, num_envs=num_envs,
                       reset_pool=max(num_envs // 8, 64),
                       num_steps=num_steps, train_mode=train_mode,
                       remat=remat)
    aux = "reward" if "tat" in network else "none"
    ncfg = NetConfig.from_name(network, aux=aux)
    if bf16:
        import dataclasses
        ncfg = dataclasses.replace(ncfg, bf16=True)
    ecfg = parse_env_id(env_id)
    env = TrackEnv(ecfg)
    model = build_model(ncfg, ecfg.num_actions, ecfg.obs_shape)
    state, opt = init_learner(model, env, ncfg, tcfg, jax.random.PRNGKey(0))
    amortized = pool_refresh > 1
    ts = jax.jit(make_train_step(model, env, ncfg, tcfg, opt,
                                 external_pool=amortized),
                 donate_argnums=(0, 1, 2))
    if amortized:
        from active_tracking_rl_tpu.rl.learner import init_pool_ptr, make_pool_fn
        pool_fn = jax.jit(make_pool_fn(env, tcfg))
    p, o, c = state.params, state.opt_state, state.carry
    mode = jnp.int32(train_mode if train_mode >= 0 else -1)

    def step(it, p, o, c):
        if amortized:
            nonlocal pool, pool_ptr
            if it % pool_refresh == 0:
                pool = pool_fn(jax.random.fold_in(jax.random.PRNGKey(7), it))
                pool_ptr = init_pool_ptr()
            p, o, c, m, pool_ptr = ts(p, o, c, mode, (*pool, pool_ptr))
            return p, o, c, m
        return ts(p, o, c, mode)

    pool = pool_ptr = None
    # warmup / compile
    for i in range(2):
        p, o, c, m = step(i % pool_refresh, p, o, c)
    jax.block_until_ready(m.loss)
    t0 = time.time()
    for i in range(iters):
        p, o, c, m = step(i, p, o, c)
    jax.block_until_ready(m.loss)
    dt = time.time() - t0
    return iters * num_envs * num_steps / dt


def main():
    from active_tracking_rl_tpu.utils.platform import respect_jax_platforms
    respect_jax_platforms()
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure-baseline", action="store_true")
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--env", default="Track2D-BlockPartialNav-v0")
    ap.add_argument("--network", default="maze-lstm")
    ap.add_argument("--train-mode", type=int, default=0)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--no-remat", action="store_true",
                    help="disable rollout-scan rematerialization (remat is "
                         "the default: bit-identical grads, fewer stacked "
                         "residuals -> faster step; see RESULTS.md)")
    ap.add_argument("--pool-refresh", type=int, default=1,
                    help="K=1 (default): exact reference regenerate-per-reset "
                         "semantics, apples-to-apples with the measured "
                         "baseline emulation. K>1 amortizes reset-pool "
                         "generation (validated training config, RESULTS.md "
                         "§1.5) and is reported in PERF_SWEEP.json")
    ap.add_argument("--sweep", action="store_true",
                    help="num_envs sweep + tat-PZR + bf16 configs; prints a "
                         "JSON dict instead of the one-line contract")
    args = ap.parse_args()

    if args.measure_baseline:
        ref = measure_reference_emulation()
        with open(BASELINE_FILE, "w") as f:
            json.dump(ref, f, indent=1)
        print(json.dumps(ref))
        return

    if args.sweep:
        out = {}
        for ne in (1024, 4096, 16384):
            out[f"nav_maze-lstm_n{ne}"] = round(run_bench(num_envs=ne), 1)
        for k in (4, 16):
            out[f"nav_maze-lstm_n4096_poolK{k}"] = round(
                run_bench(num_envs=4096, pool_refresh=k), 1)
        out["nav_maze-lstm_n4096_bf16"] = round(
            run_bench(num_envs=4096, bf16=True), 1)
        out["nav_maze-lstm_n4096_poolK16_bf16"] = round(
            run_bench(num_envs=4096, pool_refresh=16, bf16=True), 1)
        out["pzr_tat-maze-lstm_n4096"] = round(run_bench(
            num_envs=4096, env_id="Track2D-BlockPartialPZR-v0",
            network="tat-maze-lstm", train_mode=-1), 1)
        out["pzr_tat-maze-lstm_n4096_bf16"] = round(run_bench(
            num_envs=4096, env_id="Track2D-BlockPartialPZR-v0",
            network="tat-maze-lstm", train_mode=-1, bf16=True), 1)
        print(json.dumps(out, indent=1))
        return

    baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)["baseline_env_steps_s"]

    value = run_bench(num_envs=args.num_envs, iters=args.iters,
                      env_id=args.env, network=args.network,
                      train_mode=args.train_mode, bf16=args.bf16,
                      pool_refresh=args.pool_refresh,
                      remat=not args.no_remat)
    out = {
        "metric": "env_steps_per_s_per_chip",
        "value": round(value, 1),
        "unit": "env-steps/s/chip (Track2D-BlockPartialNav train "
                f"pipeline, pool-refresh {args.pool_refresh})",
        "vs_baseline": round(value / baseline, 2) if baseline else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
