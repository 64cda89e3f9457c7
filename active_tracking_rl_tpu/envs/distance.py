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


def distance_field(maze: jax.Array, goal: jax.Array, iters: int) -> jax.Array:
    """Shortest 4-connected path length from every cell to `goal`.

    maze: (S, S) uint8 wall map; goal: (2,) int32; -> (S, S) int16, INF where
    unreachable (or farther than `iters`). Walls are INF.
    """
    wall = maze != 0
    d = jnp.where(wall, INF, INF).astype(jnp.int16)
    d = d.at[goal[0], goal[1]].set(jnp.where(wall[goal[0], goal[1]], INF, 0))

    def relax(d):
        p = jnp.pad(d, 1, constant_values=INF)
        best = jnp.minimum(
            jnp.minimum(p[:-2, 1:-1], p[2:, 1:-1]),
            jnp.minimum(p[1:-1, :-2], p[1:-1, 2:]),
        )
        nd = jnp.minimum(d, (best + jnp.int16(1)).astype(jnp.int16))
        return jnp.where(wall, INF, nd)

    def body(_, d):
        return relax(d)

    return jax.lax.fori_loop(0, iters, body, d)


def distance_fields(maze: jax.Array, goals: jax.Array, iters: int) -> jax.Array:
    """Vectorized over goals: (G, 2) -> (G, S, S) int16."""
    return jax.vmap(lambda g: distance_field(maze, g, iters))(goals)


def distance_fields_backend(maze: jax.Array, goals: jax.Array, iters: int,
                            backend: str = "auto") -> jax.Array:
    """Dispatch between the XLA flood and the VMEM-resident Pallas kernel.

    backend: "auto" picks Pallas on TPU (the fori_loop carry round-trips HBM
    every sweep under XLA; the kernel keeps it on-chip), XLA elsewhere.
    """
    if backend == "auto":
        from active_tracking_rl_tpu.ops.flood_pallas import flood_available
        backend = "pallas" if flood_available() else "xla"
    if backend == "pallas":
        from active_tracking_rl_tpu.ops.flood_pallas import flood_fields_pallas
        return flood_fields_pallas(maze, goals, iters)
    return distance_fields(maze, goals, iters)
