"""BFS distance fields via iterative min-plus relaxation.

This replaces the reference's per-step heap-based A* planner
(Astar_solver.py:121-149) with a TPU-friendly dense flood fill: the scripted
Navigator's policy is greedy descent on the distance-to-goal field with the
reference's action-order tie-break 0<1<2<3 (see SURVEY.md §7 "A*-based
Navigator"). Cells that a bounded number of relaxation sweeps cannot reach
keep distance INF and map onto the reference's "unsolvable -> resample/planB"
branch (navigator.py:22-35).

A Pallas VMEM-resident version of `distance_field` lives in
`active_tracking_rl_tpu.ops.flood_pallas` (same contract, fewer HBM round
trips); this XLA version is the reference implementation and test oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: "unreachable" distance. Fits int16 with headroom for +1 relaxation adds.
INF = jnp.int16(16000)


def _seed_field(wall: jax.Array, goal: jax.Array) -> jax.Array:
    """(S,S) bool x (2,) i32 -> (S,S) i32: 0 at the goal cell, INF elsewhere.

    Broadcast-compare, NOT `.at[goal].set`: the scatter form silently drops
    seeds under nested vmap at batch >= ~128 (jax 0.9.0, CPU and TPU) —
    see ops/flood_pallas.py:_init_fields and tests/test_flood_pallas.py.
    """
    s = wall.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    is_goal = (rows == goal[0]) & (cols == goal[1]) & ~wall
    return jnp.where(is_goal, 0, jnp.int32(INF))


def distance_field(maze: jax.Array, goal: jax.Array, iters: int) -> jax.Array:
    """Shortest 4-connected path length from every cell to `goal`.

    maze: (S, S) uint8 wall map; goal: (2,) int32; -> (S, S) int16, INF where
    unreachable (or farther than `iters`). Walls are INF.
    """
    wall = maze != 0
    d = _seed_field(wall, goal).astype(jnp.int16)

    def relax(d):
        p = jnp.pad(d, 1, constant_values=INF)
        best = jnp.minimum(
            jnp.minimum(p[:-2, 1:-1], p[2:, 1:-1]),
            jnp.minimum(p[1:-1, :-2], p[1:-1, 2:]),
        )
        nd = jnp.minimum(d, (best + jnp.int16(1)).astype(jnp.int16))
        return jnp.where(wall, INF, nd)

    # Plain fixed-iteration loop: a convergence-checked while_loop variant
    # was tried and is semantically identical, but XLA compiles it ~60x
    # slower (180s on TPU); the early exit lives in the Pallas kernel
    # (ops/flood_pallas.py) where Mosaic handles it cheaply.
    return jax.lax.fori_loop(0, iters, lambda _, x: relax(x), d)


def distance_fields(maze: jax.Array, goals: jax.Array, iters: int) -> jax.Array:
    """Vectorized over goals: (G, 2) -> (G, S, S) int16."""
    return jax.vmap(lambda g: distance_field(maze, g, iters))(goals)


# --- fast sweeping -----------------------------------------------------------
#
# The relaxation above needs one sweep per unit of path length (256 sweeps for
# an 82x82 map). Fast sweeping instead propagates whole straight-line runs per
# pass: a vertical pass pushes distances down AND up full columns, a
# horizontal pass along full rows, each as a min-plus `associative_scan`
# (log-depth). A shortest path that alternates between vertical and horizontal
# segments z times converges after ~z/2+1 rounds — typically 3-6 on block
# maps, 10-30 on mazes — detected by a `while_loop` convergence check. At
# convergence this is EXACT 4-connected BFS distance (Gauss-Seidel on the
# Bellman equations), unlike the iteration-capped relaxation.

_I32INF = jnp.int32(INF)


def _minplus_scan(c: jax.Array, k: jax.Array, axis: int,
                  reverse: bool) -> jax.Array:
    """Prefix composition of f(x) = min(c, x + k) along `axis`.

    Returns the composed `c` (== the scanned value when seeded with INF).
    Walls carry k = INF so nothing propagates through them; adds saturate
    at INF.
    """
    def combine(a, b):
        ca, ka = a
        cb, kb = b
        return (jnp.minimum(cb, jnp.minimum(ca + kb, _I32INF)),
                jnp.minimum(ka + kb, _I32INF))

    cc, _ = jax.lax.associative_scan(combine, (c, k), axis=axis,
                                     reverse=reverse)
    return cc


def distance_field_sweep(maze: jax.Array, goal: jax.Array,
                         max_rounds: int = 64) -> jax.Array:
    """Exact BFS distance field via fast sweeping.

    Same contract as `distance_field` (walls/unreachable at INF) but exact —
    no iteration-cap truncation — and typically 10-50x fewer vector ops.
    """
    wall = maze != 0
    k = jnp.where(wall, _I32INF, jnp.int32(1))
    d = _seed_field(wall, goal)

    def one_round(d):
        dv = jnp.minimum(_minplus_scan(d, k, 0, False),
                         _minplus_scan(d, k, 0, True))
        d = jnp.where(wall, _I32INF, jnp.minimum(d, dv))
        dh = jnp.minimum(_minplus_scan(d, k, 1, False),
                         _minplus_scan(d, k, 1, True))
        return jnp.where(wall, _I32INF, jnp.minimum(d, dh))

    def cond(c):
        d, prev, i = c
        return (i < max_rounds) & jnp.any(d != prev)

    def body(c):
        d, _, i = c
        return one_round(d), d, i + 1

    d0 = one_round(d)
    d, _, _ = jax.lax.while_loop(cond, body, (d0, d, jnp.int32(1)))
    return d.astype(jnp.int16)


def distance_fields_sweep(maze: jax.Array, goals: jax.Array,
                          max_rounds: int = 64) -> jax.Array:
    """Vectorized over goals: (G, 2) -> (G, S, S) int16."""
    return jax.vmap(lambda g: distance_field_sweep(maze, g, max_rounds))(goals)


def distance_fields_backend(maze: jax.Array, goals: jax.Array, iters: int,
                            backend: str = "auto") -> jax.Array:
    """Dispatch between the fast-sweep flood, the iteration-capped XLA
    relaxation, and the VMEM-resident Pallas relaxation kernel.

    backend: "auto" picks the Pallas fast-sweeping kernel on TPU
    (VMEM-resident, log-depth directional scans, ~4x the relaxation
    kernel's throughput — see RESULTS.md §3), XLA elsewhere.
    "pallas" is the one-cell-per-sweep relaxation kernel;
    "pallas_sweep" the fast-sweeping kernel; "sweep" the XLA fast-sweeping
    variant (log-depth associative scans — slower on TPU because XLA's
    odd/even scan lowering doesn't tile well at 82x82, kept as the exact
    oracle).
    """
    if backend == "auto":
        from active_tracking_rl_tpu.ops.flood_pallas import flood_available
        backend = "pallas_sweep" if flood_available() else "xla"
    if backend == "sweep":
        return distance_fields_sweep(maze, goals)
    if backend in ("pallas", "pallas_sweep"):
        from active_tracking_rl_tpu.ops.flood_pallas import flood_fields_pallas
        return flood_fields_pallas(
            maze, goals, iters,
            variant="sweep" if backend == "pallas_sweep" else "relax")
    return distance_fields(maze, goals, iters)
