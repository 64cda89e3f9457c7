"""The Track2D engine: reset / step / auto-reset pool.

API parity map (reference -> here):
  * ``gym.make(id)``                 -> ``make_env(env_id)`` / ``TrackEnv(cfg)``
  * ``env.reset()``                  -> ``env.reset(key)`` (explicit PRNG)
  * ``env.step([a0, a1])``           -> ``env.step(state, actions)``
  * 72 registered ids               -> ``config.env_ids()`` + ``parse_env_id``
  * gym ``TimeLimit(500)``          -> folded into ``step`` (``done`` at
                                        ``max_episode_steps``, track_1v1 cap
                                        is applied by the gym registry,
                                        gym_track2d/__init__.py:17)

Vectorization: ``reset``/``step`` are single-row functions; ``TrackEnv``
exposes vmapped batch variants plus the reset-pool machinery that amortizes
expensive episode initialization (map generation, spawn sampling, opponent
tape compilation) into one batched computation per learner iteration instead
of per-row work under ``lax.cond`` (SURVEY.md §7 "Auto-reset ... inside jit").
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from active_tracking_rl_tpu.config import EnvConfig, parse_env_id
from active_tracking_rl_tpu.envs import maps, observe as observe_mod
from active_tracking_rl_tpu.envs.opponents import DELTAS, build_tape
from active_tracking_rl_tpu.envs.types import EnvState, info_dict


def reset(cfg: EnvConfig, key: jax.Array) -> Tuple[EnvState, jax.Array]:
    """Fresh episode: new map + spawns + scripted tape (track_1v1.py:134-168).

    The map is regenerated on every reset (track_1v1.py:136).
    """
    k_map, k_spawn, k_tape = jax.random.split(key, 3)
    maze = maps.generate_map(cfg, k_map)
    patrol = None
    if cfg.target_mode == "RPF":
        patrol = maps.patrol_goals(cfg)
        maze = maps.carve_patrol(maze, patrol)
    pos, goals = maps.sample_spawns(cfg, k_spawn, maze, patrol)
    tape = build_tape(cfg, k_tape, maze, pos[1], goals[1])
    maze_padded = jnp.pad(maze, cfg.pob_size, constant_values=1)
    state = EnvState(
        maze=maze_padded,
        pos=pos,
        tape=tape,
        t=jnp.int32(0),
        c_far=jnp.int32(0),
        done=jnp.bool_(False),
        c_reward=jnp.zeros((cfg.num_agents,), jnp.float32),
        c_collision=jnp.zeros((cfg.num_agents,), jnp.int32),
        # Euclidean, matching step's d (track_1v1.py:96) — the reference
        # computes no distance at reset, so this field only needs internal
        # consistency with step.
        dist=jnp.sqrt(jnp.sum((pos[1] - pos[0]).astype(jnp.float32) ** 2)),
    )
    return state, observe_mod.observe(cfg, state.maze, state.pos)


def step(cfg: EnvConfig, state: EnvState,
         actions: jax.Array) -> Tuple[EnvState, jax.Array, jax.Array,
                                      jax.Array, dict]:
    """One transition (track_1v1.py:71-127) + TimeLimit.

    actions: (num_agents,) int32. For scripted modes the target action is
    overridden by the tape (track_1v1.py:80-84). Returns
    (state', obs (2,H,W) uint8, rewards (2,) f32, done bool, info).
    """
    p = cfg.pob_size
    a0 = actions[0]
    a1 = jnp.where(jnp.bool_(cfg.scripted),
                   state.tape[state.t].astype(jnp.int32), actions[1])
    acts = jnp.stack([a0, a1])

    # move agents; wall -> stay + collision flag (track_1v1.py:271-285).
    # The wall test reads the maze with one-hot bf16 matmuls (exact for
    # one-hot selectors x cell values 0..6), the SAME access pattern as
    # the observation crop (observe.py) — a per-agent indexed gather here
    # forced XLA to keep a second, differently-laid-out copy of the
    # (B,94,94) maze inside the rollout scan (two ~10 ms relayout copies
    # per profiled core, round-5 xprof copy.343/344).
    onea = jnp.arange(DELTAS.shape[0])[None, :] == acts[:, None]  # (A, 8)
    delta = jnp.where(onea[..., None], DELTAS[None], 0).sum(1)    # (A, 2)
    nxt = state.pos + delta
    s = state.maze.shape[-1]
    j = jax.lax.broadcasted_iota(jnp.int32, (cfg.num_agents, s), 1)
    r_oh = (j == (nxt[:, 0] + p)[:, None]).astype(jnp.bfloat16)
    c_oh = (j == (nxt[:, 1] + p)[:, None]).astype(jnp.bfloat16)
    cell = jnp.einsum("as,st,at->a", r_oh,
                      state.maze.astype(jnp.bfloat16), c_oh)
    hit = cell == 1
    pos = jnp.where(hit[:, None], state.pos, nxt)

    # rewards (track_1v1.py:94-104); w_p set at reset (track_1v1.py:146-152)
    d = jnp.sqrt(jnp.sum((pos[1] - pos[0]).astype(jnp.float32) ** 2))
    max_d = jnp.float32(p)
    r0 = jnp.maximum(1.0 - 2.0 * d / max_d, -1.0)
    r1 = jnp.maximum(-r0 - cfg.w_p * jnp.maximum(d - max_d, 0.0) / max_d, -1.0)
    rewards = jnp.stack([r0, r1])

    # termination: lost for 11 consecutive steps (track_1v1.py:106-111)
    c_far = jnp.where(d <= max_d, 0, state.c_far + 1)
    t = state.t + 1
    done = (c_far > 10) | (t >= cfg.max_episode_steps)

    new_state = EnvState(
        maze=state.maze,
        pos=pos,
        tape=state.tape,
        t=t,
        c_far=c_far,
        done=done,
        c_reward=state.c_reward + rewards,
        c_collision=state.c_collision + hit.astype(jnp.int32),
        dist=d,
    )
    obs = observe_mod.observe(cfg, new_state.maze, new_state.pos)
    return new_state, obs, rewards, done, info_dict(new_state)


class TrackEnv:
    """Functional env bound to one EnvConfig. Stateless; all methods pure."""

    def __init__(self, cfg: EnvConfig):
        self.cfg = cfg
        self._reset_one = partial(reset, cfg)
        self._step_one = partial(step, cfg)

    # --- single row ---
    def reset(self, key: jax.Array) -> Tuple[EnvState, jax.Array]:
        return self._reset_one(key)

    def step(self, state: EnvState, actions: jax.Array):
        return self._step_one(state, actions)

    # --- batched ---
    def reset_batch(self, key: jax.Array, n: int) -> Tuple[EnvState, jax.Array]:
        keys = jax.random.split(key, n)
        return jax.vmap(self._reset_one)(keys)

    def step_batch(self, state: EnvState, actions: jax.Array):
        """state: EnvState[B]; actions: (B, num_agents) int32."""
        return jax.vmap(self._step_one)(state, actions)

    def reset_batch_chunked(self, key: jax.Array, n: int,
                            chunk_max: int = 4096):
        """reset_batch with bounded peak memory: the reset's flood-field /
        action-map scratch is O(rows x goals x S^2), so one flat batch OOMs
        HBM above ~8k rows. Sequential `lax.map` over ceil-division row
        groups; values identical (each row's reset depends only on its own
        key; padding rows are discarded work)."""
        num_chunks = -(-n // chunk_max)
        if num_chunks == 1:
            return self.reset_batch(key, n)
        chunk = -(-n // num_chunks)
        padded = num_chunks * chunk
        # split exactly n keys (the same stream reset_batch would use) and
        # pad the key ARRAY — padding rows are discarded work, so chunked
        # and unchunked resets are bit-identical for the first n rows.
        keys = jax.random.split(key, n)
        if padded > n:
            keys = jnp.concatenate(
                [keys, jnp.zeros((padded - n,) + keys.shape[1:], keys.dtype)])
        keys = keys.reshape(num_chunks, chunk, -1)
        state, obs = jax.lax.map(
            lambda ks: jax.vmap(self.reset)(ks), keys)
        return jax.tree_util.tree_map(
            lambda x: x.reshape(padded, *x.shape[2:])[:n], (state, obs))

    # --- auto-reset from a pre-generated pool ---
    def autoreset(self, state: EnvState, obs: jax.Array, done: jax.Array,
                  pool_state: EnvState, pool_obs: jax.Array,
                  pool_ptr: jax.Array):
        """Swap terminated rows for fresh pool rows.

        Each done row consumes the next pool entry, wrapping modulo the
        pool size. Reuse of a pool row therefore happens exactly when
        cumulative consumption since the pool was generated exceeds the
        pool size — within a single rollout at high termination rates, or
        across a `--pool-refresh` window (callers thread the returned
        pointer between rollouts, rl/rollout.py, so window consumption
        walks the whole pool rather than re-reading its front).
        Returns (state', obs', pool_ptr').

        `pool_ptr` selects the consumption scheme:
          * scalar int32 — one global pointer, rows drawn from the whole
            pool in termination order (single-device semantics);
          * (d,) int32 — BLOCKED: the env batch and the pool are split into
            d equal contiguous blocks and block i consumes only pool block
            i with its own pointer. With the batch and pool sharded over a
            d-way 'dp' mesh axis this keeps the cumsum and the gather
            shard-local, so neither the pool nor the done-scan is
            all-gathered across devices (SURVEY.md §2.8). Pool rows are
            i.i.d. fresh resets, so the learning distribution is unchanged.
        """
        r = jax.tree_util.tree_leaves(pool_state)[0].shape[0]
        if pool_ptr.ndim == 0:
            take = (pool_ptr + jnp.cumsum(done.astype(jnp.int32)) - 1) % r
            fresh_state = jax.tree_util.tree_map(lambda x: x[take], pool_state)
            fresh_obs = pool_obs[take]
            ptr = (pool_ptr + done.sum(dtype=jnp.int32)) % r
        else:
            d = pool_ptr.shape[0]
            B = done.shape[0]
            assert B % d == 0 and r % d == 0, (B, r, d)
            pb = r // d
            done_b = done.reshape(d, B // d)
            csum = jnp.cumsum(done_b.astype(jnp.int32), axis=1)
            take = (pool_ptr[:, None] + csum - 1) % pb          # (d, B/d)

            def gather(x):
                xb = x.reshape(d, pb, *x.shape[1:])
                out = jax.vmap(lambda xr, t: xr[t])(xb, take)
                return out.reshape(B, *x.shape[1:])

            fresh_state = jax.tree_util.tree_map(gather, pool_state)
            fresh_obs = gather(pool_obs)
            ptr = (pool_ptr + done_b.sum(1, dtype=jnp.int32)) % pb

        def pick(new, old):
            mask = done.reshape((-1,) + (1,) * (old.ndim - 1))
            return jnp.where(mask, new, old)

        state = jax.tree_util.tree_map(pick, fresh_state, state)
        obs = pick(fresh_obs, obs)
        return state, obs, ptr

    @property
    def obs_shape(self) -> Tuple[int, ...]:
        return (self.cfg.num_agents,) + self.cfg.obs_shape

    @property
    def num_actions(self) -> int:
        return self.cfg.num_actions


def make_env(env_id: str, cfg: Optional[EnvConfig] = None) -> TrackEnv:
    """gym.make-style factory over the 72 Track2D ids (environment.py:11-32).

    Non-Track2D families (the external UnrealCV 3D envs imported at
    environment.py:8-9) are served by the optional host bridge in
    ``envs/bridge.py`` behind a lazy import boundary.
    """
    if cfg is None:
        cfg = parse_env_id(env_id)
    return TrackEnv(cfg)
