"""Scripted-target controllers compiled to per-episode action tapes.

TPU-native design (SURVEY.md §7): the reference drives scripted targets with
per-step Python (`RamAgent.step` navigator.py:73-93, `Navigator.step`
navigator.py:11-41 with heap A*). Because the grid dynamics are deterministic
and agents never block each other, the target's entire episode is computable
at reset time:

  * Ram: simulate the burst automaton for `tape_len` ticks.
  * Nav/RPF: pre-sample goal candidates, compute a BFS distance field per
    candidate (distance.py), then simulate the navigator's replan/planB logic
    for `tape_len` ticks with greedy descent on the fields. This reproduces
    goal-reached / plan-exhausted replans, the 6-try solvability retry, and
    the 10-random-action planB fallback (navigator.py:11-41,43-63).

Per env step the scripted action is then a single tape gather
(`state.tape[state.t]`) — the hot path has no planning work at all.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from active_tracking_rl_tpu.config import EnvConfig
from active_tracking_rl_tpu.envs.distance import INF, distance_fields_backend
from active_tracking_rl_tpu.envs.maps import patrol_goals

#: transition table, reference order (track_1v1.py:276): up/down/left/right
#: then the 4 Moore diagonals (track_1v1.py:278-279).
DELTAS = jnp.array(
    [[-1, 0], [1, 0], [0, -1], [0, 1],
     [-1, 1], [1, 1], [-1, -1], [1, -1]], jnp.int32)

_MAX_BURST = 9  # np.random.randint(1, 10) -> plan length 1..9


def ram_tape(cfg: EnvConfig, key: jax.Array) -> jax.Array:
    """(tape_len,) int8 action tape simulating RamAgent (navigator.py:73-93).

    Semantics: emit the current plan; on emitting its last action, regenerate:
    with p=1/2 a repeat-burst of a fresh action (which REPLACES the action
    emitted this very tick — the reference overwrites `action` after drawing
    it, navigator.py:81-83), else an i.i.d. random burst. Burst lengths are
    uniform on 1..9.
    """
    na = cfg.num_actions
    k_init, k_scan = jax.random.split(key)
    ki1, ki2 = jax.random.split(k_init)
    plan0 = jax.random.randint(ki1, (_MAX_BURST,), 0, na, jnp.int8)
    len0 = jax.random.randint(ki2, (), 1, _MAX_BURST + 1, jnp.int32)

    # Presample every per-tick draw OUTSIDE the scan (identical key
    # derivation per tick -> identical values, one batched threefry instead
    # of 500 tiny in-loop ones; the 500-tick serial scan is the reset-pool
    # bottleneck, see nav_tape).
    keys = jax.random.split(k_scan, cfg.tape_len)

    def draws(k):
        kc, ka, kn, kp = jax.random.split(k, 4)
        return (jax.random.randint(kc, (), 0, 2),
                jax.random.randint(ka, (), 0, na, jnp.int8),
                jax.random.randint(kn, (), 1, _MAX_BURST + 1, jnp.int32),
                jax.random.randint(kp, (_MAX_BURST,), 0, na, jnp.int8))

    xs = jax.vmap(draws)(keys)

    slot = jnp.arange(_MAX_BURST, dtype=jnp.int32)

    def tick(carry, x):
        plan, plan_len, a_i = carry
        coin, burst_action, n, rand_plan = x
        # one-hot select, not plan[a_i]: a vmapped indexed read lowers to a
        # sequential per-row gather loop on TPU (see nav_tape)
        action = jnp.where(slot == a_i, plan, 0).max()
        a_next = a_i + 1
        regen = a_next >= plan_len
        new_plan = jnp.where(coin == 0,
                             jnp.full((_MAX_BURST,), 1, jnp.int8) * burst_action,
                             rand_plan)
        action = jnp.where(regen & (coin == 0), burst_action, action)
        plan = jnp.where(regen, new_plan, plan)
        plan_len = jnp.where(regen, n, plan_len)
        a_i = jnp.where(regen, 0, a_next)
        return (plan, plan_len, a_i), action

    _, tape = jax.lax.scan(tick, (plan0, len0, jnp.int32(0)), xs)
    return tape


def nav_candidates(cfg: EnvConfig, key: jax.Array, maze: jax.Array,
                   first_goal: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pre-sampled navigator goal candidates + their distance fields.

    Returns (candidates (G,2) i32, field_idx (G,) i32, fields (Gf,S,S) i16).

    Nav: candidate 0 is the reset goal handed to Navigator.reset
    (track_1v1.py:139-141 passes goal_states[1]); the rest are i.i.d. uniform
    free cells, standing in for the lazy `sample_goal` calls at each replan
    (navigator.py:17,28). RPF: the 4 static patrol corners cycled starting at
    index 1 (generators.py:47-50 — `vector` is 1 after the init_maze call).
    """
    g = cfg.nav_goal_candidates
    if cfg.target_mode == "RPF":
        patrol = patrol_goals(cfg)
        idx = (1 + jnp.arange(g, dtype=jnp.int32)) % 4
        candidates = patrol[idx]
        field_idx = idx
        fields = distance_fields_backend(maze, patrol, cfg.flood_iters,
                                         cfg.flood_backend)
        return candidates, field_idx, fields

    free = (maze == 0).reshape(-1)
    logits = jnp.where(free, 0.0, -1e9)
    s = maze.shape[-1]
    keys = jax.random.split(key, g - 1)
    flat = jax.vmap(lambda k: jax.random.categorical(k, logits))(keys)
    rest = jnp.stack([flat // s, flat % s], axis=-1).astype(jnp.int32)
    candidates = jnp.concatenate([first_goal[None, :], rest], axis=0)
    field_idx = jnp.arange(g, dtype=jnp.int32)
    fields = distance_fields_backend(maze, candidates, cfg.flood_iters,
                                     cfg.flood_backend)
    return candidates, field_idx, fields


_RETRIES = 6  # initial goal + 5 resamples before planB (navigator.py:22-26)
_PLANB_LEN = 10  # navigator.py:34


def nav_tape(cfg: EnvConfig, key: jax.Array, maze: jax.Array,
             spawn: jax.Array, first_goal: jax.Array) -> jax.Array:
    """(tape_len,) int8 tape simulating Navigator (navigator.py:11-63).

    Per tick: if the plan is exhausted, replan — try up to 6 candidates for
    a reachable, non-trivial goal (path length >= 1), falling back to 10
    random actions (planB). Then act: greedy descent on the active distance
    field with action-order tie-break, or the random planB action. Movement
    follows env dynamics (wall -> stay).

    Replans fire on plan exhaustion ONLY, matching the reference exactly:
    its `Navigator._goal_test` (navigator.py:65-70) always returns None
    because goals are numpy arrays (neither the list nor the tuple branch
    matches), so the goal-reached condition never triggers — in planB the
    target keeps random-walking even if it lands on the goal.

    Documented deviation: the reference samples a fresh uniform goal at
    every replan (navigator.py:17); this tape draws from a pre-sampled pool
    of `nav_goal_candidates` goals and wraps (`% g`) if an episode replans
    more than g times. With the default pool of 16 and typical path lengths
    of ~30-60 steps on an 82x82 map, an episode of <=500 steps replans
    ~8-16 times, so wraps are rare; distributional impact is bounded by the
    pool size (tested in tests/test_opponents.py).
    """
    na = cfg.num_actions
    g = cfg.nav_goal_candidates
    k_cand, k_scan = jax.random.split(key)
    candidates, field_idx, fields = nav_candidates(cfg, k_cand, maze, first_goal)
    wall = maze != 0
    s = maze.shape[-1]

    # Precompute the greedy-descent action per (field, cell) ONCE,
    # vectorized: per tick the action is then a single gather instead of 4
    # neighbor-field gathers. Shifted-edge arrivals are INF, exactly like
    # out-of-range neighbors (border cells are walls = INF anyway); argmin
    # over action order reproduces the first-min tie-break bit-for-bit.
    gf = fields.shape[0]
    deltas_py = [(-1, 0), (1, 0), (0, -1), (0, 1),
                 (-1, 1), (1, 1), (-1, -1), (1, -1)]   # static DELTAS copy
    # Streaming first-min argmin over the 4 shifted neighbor fields: a
    # stacked (na, Gf, S, S) argmin materializes na extra field copies,
    # which at large reset batches (vmapped rows) overflows HBM; the
    # running compare keeps peak memory at one shifted copy. Strict `<`
    # preserves the reference's first-min tie-break (action order 0<1<2<3).
    # A per-cell wall bitmask (bit a = wall at cell+delta_a) is built in the
    # same pass so the walk's collision test needs no separate maze gather.
    padded = jnp.pad(fields, ((0, 0), (1, 1), (1, 1)), constant_values=INF)
    wpad = jnp.pad(wall, 1, constant_values=True)
    best = jnp.full(fields.shape, INF, fields.dtype)
    amap = jnp.zeros(fields.shape, jnp.int16)
    wmask = jnp.zeros((s, s), jnp.int16)
    for a in range(na):
        dr, dc = deltas_py[a]
        shifted = jax.lax.dynamic_slice(padded, (0, 1 + dr, 1 + dc),
                                        fields.shape)
        take = shifted < best
        amap = jnp.where(take, jnp.int16(a), amap)
        best = jnp.where(take, shifted, best)
        wsh = jax.lax.dynamic_slice(wpad, (1 + dr, 1 + dc), (s, s))
        wmask = wmask | (wsh.astype(jnp.int16) << a)

    # 500 sequential ticks dominate reset-pool generation; the tick body is
    # arranged to minimize per-tick memory ops:
    #   * distances are read straight from the flood output (one strided
    #     (Gf,)-slice per tick — transposing them into a cell-major table
    #     costs more to BUILD (a full extra copy of the (Gf,S,S) block per
    #     row, ~17 ms/512 rows VMEM-write in the profile) than the strided
    #     read costs in-loop);
    #   * greedy action per field + wall bitmask ARE packed cell-major, as
    #     int8 (17 bytes/cell): one contiguous slice per tick;
    #   * per-try field lookups are arithmetic, in-register (6,)-selects
    #     are one-hot compare+sums, and the move delta is a lane-compare
    #     sum against the DELTAS table — no nested gathers;
    #   * planB actions are presampled outside the scan (same keys, same
    #     draws). All bit-exact: tests/test_opponents.py + golden fixtures.
    # (A dense one-hot-matmul row read was tried and is 9x SLOWER here —
    # unlike the rollout crop it would re-read the whole table every one
    # of the 500 ticks.)
    table_a = jnp.concatenate([
        amap.astype(jnp.int8).transpose(1, 2, 0).reshape(s * s, gf),
        wmask.astype(jnp.int8).reshape(s * s, 1),
    ], axis=1)                                       # (S*S, Gf+1) i8
    keys = jax.random.split(k_scan, cfg.tape_len)
    rand_all = jax.vmap(
        lambda k: jax.random.randint(k, (), 0, na, jnp.int8))(keys)
    lane = jnp.arange(gf, dtype=jnp.int32)
    try_off = jnp.arange(_RETRIES, dtype=jnp.int32)
    arange = jnp.arange(na, dtype=jnp.int32)
    d_row = DELTAS[:na, 0]
    d_col = DELTAS[:na, 1]
    rpf = cfg.target_mode == "RPF"

    def tick(carry, rand_a):
        pos, goal_ptr, cur_field, remaining, planb = carry
        # Exhaustion-only replan: the reference's goal-reached test is dead
        # code (navigator.py:65-70 returns None for numpy goals).
        need = remaining <= 0

        dists_all = jax.lax.dynamic_slice(
            fields, (0, pos[0], pos[1]), (gf, 1, 1))[:, 0, 0]  # (Gf,) i16
        row_a = jax.lax.dynamic_slice(
            table_a, (pos[0] * s + pos[1], 0), (1, gf + 1))[0]
        amap_row = row_a[:gf]                             # (Gf,) i8
        wbits = row_a[gf].astype(jnp.int32)

        # --- replan (navigator.py:15-38) ---
        try_idx = (goal_ptr + try_off) % g                # (6,)
        fidx = (1 + try_idx) % 4 if rpf else try_idx      # == field_idx[try_idx]
        onehot = lane[None, :] == fidx[:, None]           # (6, Gf)
        dists = jnp.where(onehot, dists_all[None, :], INF).min(-1)  # (6,)
        ok = (dists >= 1) & (dists < INF)
        any_ok = ok.any()
        first = jnp.argmax(ok)
        m6 = try_off == jnp.where(any_ok, first, _RETRIES - 1)
        consumed = jnp.where(any_ok, first + 1, _RETRIES)
        r_field = jnp.where(m6, fidx, 0).sum()
        r_remaining = jnp.where(any_ok,
                                jnp.where(m6, dists, 0).sum().astype(jnp.int32),
                                jnp.int32(_PLANB_LEN))
        goal_ptr = jnp.where(need, goal_ptr + consumed, goal_ptr)
        cur_field = jnp.where(need, r_field, cur_field)
        remaining = jnp.where(need, r_remaining, remaining)
        planb = jnp.where(need, ~any_ok, planb)

        # --- act: select the current field's lane from the packed row
        # (single non-negative lane survives the mask, so max == select) ---
        greedy = jnp.where(lane == cur_field, amap_row, 0).max()
        action = jnp.where(planb, rand_a, greedy)

        # --- move (track_1v1.py:281-285: wall -> stay) ---
        a32 = action.astype(jnp.int32)
        onea = arange == a32                              # (na,)
        delta = jnp.stack([jnp.where(onea, d_row, 0).sum(),
                           jnp.where(onea, d_col, 0).sum()])
        nxt = pos + delta
        hit = ((wbits >> a32) & 1) == 1
        pos = jnp.where(hit, pos, nxt)
        remaining = remaining - 1
        return (pos, goal_ptr, cur_field, remaining, planb), action

    init = (spawn, jnp.int32(0), jnp.int32(0),
            jnp.int32(0), jnp.bool_(False))
    _, tape = jax.lax.scan(tick, init, rand_all)
    return tape


def build_tape(cfg: EnvConfig, key: jax.Array, maze: jax.Array,
               spawn: jax.Array, first_goal: jax.Array) -> jax.Array:
    """Dispatch on target mode; dueling modes get a zero tape."""
    if cfg.target_mode == "Ram":
        return ram_tape(cfg, key)
    if cfg.target_mode in ("Nav", "RPF"):
        return nav_tape(cfg, key, maze, spawn, first_goal)
    return jnp.zeros((cfg.tape_len,), jnp.int8)
