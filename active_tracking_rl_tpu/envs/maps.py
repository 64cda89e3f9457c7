"""Map generators and spawn sampling as jit-able JAX kernels.

Reference semantics reproduced (generators.py):
  * RandomBlockMazeGenerator (generators.py:157-176): uniform obstacle scatter
    over an 80x80 interior + 1-cell wall pad -> 82x82.
  * RandomMazeGenerator (generators.py:115-145): the Wikipedia aisle-growing
    random walk on an 81x81 odd grid. The sequential data-dependent loop
    becomes a fixed-trip-count `lax.scan` with per-iteration masking.
  * sample_goal / sample_close_states / get_around (generators.py:38-94):
    uniform free-cell sampling. The reference reseeds the *global* NumPy RNG
    from OS entropy on every call (generators.py:41,56 — a determinism bug);
    here every sample consumes an explicit PRNG key.

All functions operate on a single map; batch with vmap.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from active_tracking_rl_tpu.config import EnvConfig

# Large finite "minus infinity" for masked Gumbel sampling.
_NEG = -1e9


def block_obstacle_ratio(cfg: EnvConfig, key: jax.Array) -> jax.Array:
    """track_1v1.py:225-232: level>0 -> 0.05*level; level 0 -> 0.15*U[0,1);
    Empty -> 0."""
    if cfg.map_type == "Empty":
        return jnp.float32(0.0)
    if cfg.level > 0:
        return jnp.float32(cfg.level * 0.05)
    return 0.15 * jax.random.uniform(key)


def maze_complexity_density(cfg: EnvConfig, key: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """track_1v1.py:219-224 + generators.py:120-123: r -> integer loop counts.

    shape = (81, 81); complexity_int = int(r * 5 * (81+81));
    density_int = int(r * (81//2) * (81//2)).
    """
    if cfg.level > 0:
        r = jnp.float32(cfg.level * 0.02)
    else:
        r = 0.03 * jax.random.uniform(key)
    s = cfg.maze_size
    complexity = jnp.floor(r * (5 * (s + s))).astype(jnp.int32)
    density = jnp.floor(r * ((s // 2) * (s // 2))).astype(jnp.int32)
    return complexity, density


def maze_loop_bounds(cfg: EnvConfig) -> Tuple[int, int]:
    """Static upper bounds for the masked maze-generation scans."""
    s = cfg.maze_size
    r_max = cfg.level * 0.02 if cfg.level > 0 else 0.03
    max_complexity = int(math.floor(r_max * 5 * (s + s))) + 1
    max_density = int(math.floor(r_max * (s // 2) * (s // 2))) + 1
    return max_complexity, max_density


def generate_block_map(cfg: EnvConfig, key: jax.Array) -> jax.Array:
    """(maze_size, maze_size) uint8 wall map; generators.py:157-176."""
    interior = cfg.maze_size - 2  # 80
    n = interior * interior
    k_ratio, k_perm = jax.random.split(key)
    ratio = block_obstacle_ratio(cfg, k_ratio)
    num_obstacles = jnp.floor(ratio * n).astype(jnp.int32)
    # np.random.choice(n, size=k, replace=False) == first k of a permutation.
    perm = jax.random.permutation(k_perm, n)
    chosen = (jnp.arange(n, dtype=jnp.int32) < num_obstacles).astype(jnp.uint8)
    flat = jnp.zeros((n,), jnp.uint8).at[perm].set(chosen)
    maze = flat.reshape(interior, interior)
    return jnp.pad(maze, 1, constant_values=1)


def generate_maze_map(cfg: EnvConfig, key: jax.Array) -> jax.Array:
    """(81, 81) uint8 wall map via the wiki aisle-growing walk
    (generators.py:115-145), as nested masked scans."""
    s = cfg.maze_size  # odd
    half = s // 2      # 40
    k_r, k_walk = jax.random.split(key)
    complexity, density = maze_complexity_density(cfg, k_r)
    max_complexity, max_density = maze_loop_bounds(cfg)

    z = jnp.zeros((s, s), jnp.uint8)
    z = z.at[0, :].set(1).at[-1, :].set(1).at[:, 0].set(1).at[:, -1].set(1)

    # Candidate neighbour offsets in the reference's append order
    # (generators.py:135-138): left(x-2), right(x+2), up(y-2), down(y+2).
    # (y = row? in the reference x indexes columns, y rows: Z[y, x].)
    n_off = jnp.array([[0, -2], [0, 2], [-2, 0], [2, 0]], jnp.int32)  # (dy, dx)

    def complexity_step(carry, k):
        z, y, x, active_i, j = carry
        active = active_i & (j < complexity)
        # validity masks in reference order (x>1, x<s-2, y>1, y<s-2)
        valid = jnp.array([x > 1, x < s - 2, y > 1, y < s - 2])
        nvalid = valid.sum()
        # randint(0, len(neighbours)) over the ordered valid list
        r = jax.random.randint(k, (), 0, jnp.maximum(nvalid, 1))
        order = jnp.cumsum(valid.astype(jnp.int32)) - 1  # rank among valid
        pick = valid & (order == r)
        sel = jnp.argmax(pick)
        y_ = y + n_off[sel, 0]
        x_ = x + n_off[sel, 1]
        free = z[y_, x_] == 0
        do = active & free
        ym = y_ + (y - y_) // 2
        xm = x_ + (x - x_) // 2
        z = z.at[y_, x_].set(jnp.where(do, 1, z[y_, x_]).astype(jnp.uint8))
        z = z.at[ym, xm].set(jnp.where(do, 1, z[ym, xm]).astype(jnp.uint8))
        y = jnp.where(do, y_, y)
        x = jnp.where(do, x_, x)
        return (z, y, x, active_i, j + 1), None

    def density_step(carry, keys):
        z, i = carry
        k_xy, k_inner = keys
        kx, ky = jax.random.split(k_xy)
        active_i = i < density
        # randint(0, shape//2 + 1) * 2 — may land on the border (reference quirk)
        x = jax.random.randint(kx, (), 0, half + 1) * 2
        y = jax.random.randint(ky, (), 0, half + 1) * 2
        z = z.at[y, x].set(jnp.where(active_i, 1, z[y, x]).astype(jnp.uint8))
        inner_keys = jax.random.split(k_inner, max_complexity)
        (z, _, _, _, _), _ = jax.lax.scan(
            complexity_step, (z, y, x, active_i, jnp.int32(0)), inner_keys)
        return (z, i + 1), None

    outer_keys = jax.random.split(k_walk, 2 * max_density).reshape(max_density, 2, -1)
    (z, _), _ = jax.lax.scan(density_step, (z, jnp.int32(0)),
                             (outer_keys[:, 0], outer_keys[:, 1]))
    return z


def generate_map(cfg: EnvConfig, key: jax.Array) -> jax.Array:
    if cfg.map_type == "Maze":
        return generate_maze_map(cfg, key)
    return generate_block_map(cfg, key)


# ---------------------------------------------------------------------------
# Free-cell sampling
# ---------------------------------------------------------------------------

def _gumbel_topk_cells(key: jax.Array, mask: jax.Array, k: int) -> jax.Array:
    """k distinct cell indices (row, col) uniform over mask==True, via Gumbel
    top-k (== sampling without replacement). mask: (S, S) bool. -> (k, 2) i32."""
    s = mask.shape[-1]
    g = jax.random.gumbel(key, (s * s,))
    g = jnp.where(mask.reshape(-1), g, _NEG)
    _, idx = jax.lax.top_k(g, k)
    return jnp.stack([idx // s, idx % s], axis=-1).astype(jnp.int32)


def sample_free_cells(key: jax.Array, maze: jax.Array, k: int) -> jax.Array:
    """generators.py:38-46 sample_goal semantics: k distinct free cells."""
    return _gumbel_topk_cells(key, maze == 0, k)


def sample_around(key: jax.Array, maze: jax.Array, state: jax.Array,
                  max_distance: int = 1) -> jax.Array:
    """generators.py:82-94 get_around: uniform free cell in the window
    rows [max(0,x-d), min(S-1,x+d)) x cols [max(0,y-d), min(S-1,y+d)).

    Note the reference's half-open slice: the +d row/col is EXCLUDED (an
    off-by-one kept for parity). The center cell is always inside (interior
    spawn, border is wall), so the window is never empty.
    """
    s = maze.shape[-1]
    x0 = jnp.maximum(0, state[0] - max_distance)
    x1 = jnp.minimum(s - 1, state[0] + max_distance)
    y0 = jnp.maximum(0, state[1] - max_distance)
    y1 = jnp.minimum(s - 1, state[1] + max_distance)
    rows = jnp.arange(s)[:, None]
    cols = jnp.arange(s)[None, :]
    window = (rows >= x0) & (rows < x1) & (cols >= y0) & (cols < y1)
    mask = window & (maze == 0)
    # guard (cannot trigger for interior states): fall back to the state cell
    mask = jnp.where(mask.any(), mask,
                     (rows == state[0]) & (cols == state[1]))
    return _gumbel_topk_cells(key, mask, 1)[0]


def sample_spawns(cfg: EnvConfig, key: jax.Array, maze: jax.Array,
                  patrol: jax.Array | None = None):
    """Spawn + goal sampling for one fresh map (track_1v1.py:237-240).

    Returns (init_pos (2,2), goals (2,2)).
      * goals: 2 distinct free cells (or the cycled patrol goal for RPF);
      * tracker: uniform free cell (RPF: patrol[0], generators.py:65-68);
      * target: free cell in the tracker's get_around window;
      * goals resampled (bounded retries) while either goal equals the
        tracker spawn (the `while self.goal_test(...)` loop, track_1v1.py:239).
    """
    k_goal, k_trk, k_tgt, k_retry = jax.random.split(key, 4)
    if cfg.target_mode == "RPF":
        assert patrol is not None
        tracker = patrol[0]
        goals = jnp.stack([patrol[1], patrol[1]])  # vector 0 -> 1 at first call
    else:
        tracker = sample_free_cells(k_trk, maze, 1)[0]
        goals = sample_free_cells(k_goal, maze, 2)

        def retry(i, goals):
            clash = (goals == tracker[None, :]).all(-1).any()
            fresh = sample_free_cells(jax.random.fold_in(k_retry, i), maze, 2)
            return jnp.where(clash, fresh, goals)

        goals = jax.lax.fori_loop(0, 8, retry, goals)
    target = sample_around(k_tgt, maze, tracker, 1)
    init_pos = jnp.stack([tracker, target])
    return init_pos, goals


def patrol_goals(cfg: EnvConfig) -> jax.Array:
    """RPF static patrol corners at map sixth-points (generators.py:12-19)."""
    s = cfg.maze_size
    return jnp.array(
        [[int(s / 6), int(s / 6)],
         [int(s * 5 / 6), int(s / 6)],
         [int(s * 5 / 6), int(s * 5 / 6)],
         [int(s / 6), int(s * 5 / 6)]], jnp.int32)


def carve_patrol(maze: jax.Array, patrol: jax.Array) -> jax.Array:
    """static_goals carves the patrol cells free (generators.py:17-18)."""
    return maze.at[patrol[:, 0], patrol[:, 1]].set(0)
