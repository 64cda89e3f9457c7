import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from active_tracking_rl_tpu.config import EnvConfig
from active_tracking_rl_tpu.envs import maps


def test_block_map_shape_and_walls():
    cfg = EnvConfig(map_type="Block", level=1)  # ratio = 0.05 exactly
    m = np.array(jax.jit(lambda k: maps.generate_block_map(cfg, k))(
        jax.random.PRNGKey(0)))
    assert m.shape == (82, 82)
    # border is wall (generators.py:174)
    assert m[0].all() and m[-1].all() and m[:, 0].all() and m[:, -1].all()
    # interior obstacle count = int(0.05 * 6400) exactly (generators.py:166)
    assert m[1:-1, 1:-1].sum() == int(0.05 * 80 * 80)


def test_block_map_level0_ratio_range():
    cfg = EnvConfig(map_type="Block", level=0)
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    ms = np.array(jax.jit(jax.vmap(
        lambda k: maps.generate_block_map(cfg, k)))(keys))
    counts = ms[:, 1:-1, 1:-1].sum((1, 2)).astype(int).tolist()
    assert max(counts) <= int(0.15 * 6400)
    assert len(set(counts)) > 1  # random ratio per reset


def test_empty_map_has_no_interior_walls():
    cfg = EnvConfig(map_type="Empty")
    m = np.array(maps.generate_block_map(cfg, jax.random.PRNGKey(0)))
    assert m[1:-1, 1:-1].sum() == 0


def test_maze_map_shape_border_and_structure():
    cfg = EnvConfig(map_type="Maze", level=1)
    m = np.array(jax.jit(lambda k: maps.generate_maze_map(cfg, k))(
        jax.random.PRNGKey(1)))
    assert m.shape == (81, 81)
    assert m[0].all() and m[-1].all() and m[:, 0].all() and m[:, -1].all()
    interior = m[1:-1, 1:-1]
    # aisle-growing adds walls beyond the border but keeps most cells free
    assert 0 < interior.sum() < interior.size // 2
    # maze walls land on the even lattice + midpoints: all odd-odd cells free
    assert interior[::2, ::2].sum() == 0  # odd coords of the full map


def test_sample_free_cells_distinct_and_free():
    cfg = EnvConfig(map_type="Block", level=1)
    m = maps.generate_block_map(cfg, jax.random.PRNGKey(2))
    cells = np.array(maps.sample_free_cells(jax.random.PRNGKey(3), m, 8))
    mn = np.array(m)
    assert len({tuple(c) for c in cells}) == 8
    for r, c in cells:
        assert mn[r, c] == 0


def test_sample_around_window_semantics():
    """get_around uses a half-open window excluding +d row/col
    (generators.py:83-87 off-by-one, kept for parity)."""
    cfg = EnvConfig(map_type="Empty")
    m = maps.generate_block_map(cfg, jax.random.PRNGKey(0))
    state = jnp.array([40, 40])
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    cells = np.array(jax.jit(jax.vmap(
        lambda k: maps.sample_around(k, m, state, 1)))(keys))
    seen = {tuple(c) for c in cells}
    # exactly the 2x2 window {39,40} x {39,40}
    assert seen == {(39, 39), (39, 40), (40, 39), (40, 40)}


def test_sample_spawns_goal_never_on_tracker():
    cfg = EnvConfig(map_type="Block", level=0)
    m = maps.generate_block_map(cfg, jax.random.PRNGKey(4))
    keys = jax.random.split(jax.random.PRNGKey(5), 20)
    pos, goals = jax.jit(jax.vmap(
        lambda k: maps.sample_spawns(cfg, k, m)))(keys)
    pos, goals = np.array(pos), np.array(goals)
    assert not (goals == pos[:, None, 0]).all(-1).any()
    # target within the tracker's window
    assert (np.abs(pos[:, 1] - pos[:, 0]) <= 1).all()


def test_rpf_patrol_goals():
    cfg = EnvConfig(map_type="Block", target_mode="RPF")
    patrol = np.array(maps.patrol_goals(cfg))
    s = cfg.maze_size
    assert patrol.tolist() == [[int(s / 6), int(s / 6)],
                               [int(s * 5 / 6), int(s / 6)],
                               [int(s * 5 / 6), int(s * 5 / 6)],
                               [int(s / 6), int(s * 5 / 6)]]
    m = maps.generate_block_map(cfg, jax.random.PRNGKey(0))
    m = maps.carve_patrol(m, jnp.array(patrol))
    mn = np.array(m)
    for r, c in patrol:
        assert mn[r, c] == 0
    pos, goals = maps.sample_spawns(cfg, jax.random.PRNGKey(1), m,
                                    jnp.array(patrol))
    # tracker at patrol[0], goal cycled to patrol[1] (generators.py:47-50,65-68)
    assert np.array(pos)[0].tolist() == patrol[0].tolist()
    assert np.array(goals)[0].tolist() == patrol[1].tolist()
