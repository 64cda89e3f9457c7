import jax
import jax.numpy as jnp
import numpy as np

from active_tracking_rl_tpu.config import EnvConfig
from active_tracking_rl_tpu.envs import maps
from active_tracking_rl_tpu.envs.distance import INF, distance_field, distance_fields
from tests.oracles import bfs_distance


def test_distance_field_matches_bfs():
    cfg = EnvConfig(map_type="Block", level=1)
    m = maps.generate_block_map(cfg, jax.random.PRNGKey(0))
    mn = np.array(m)
    goal = np.array(maps.sample_free_cells(jax.random.PRNGKey(1), m, 1))[0]
    d = np.array(jax.jit(lambda m, g: distance_field(m, g, 256))(m, jnp.array(goal)))
    oracle = bfs_distance(mn, goal)
    reachable = oracle < 16000
    assert (d[reachable] == oracle[reachable]).all()
    assert (d[~reachable] >= int(INF)).all()


def test_distance_field_maze():
    cfg = EnvConfig(map_type="Maze", level=1)
    m = maps.generate_maze_map(cfg, jax.random.PRNGKey(2))
    goal = np.array(maps.sample_free_cells(jax.random.PRNGKey(3), m, 1))[0]
    d = np.array(jax.jit(lambda m, g: distance_field(m, g, cfg.flood_iters))(m, jnp.array(goal)))
    oracle = bfs_distance(np.array(m), goal)
    # within the iteration budget the fields agree; beyond it ours saturates
    near = (oracle <= cfg.flood_iters)
    assert (d[near] == oracle[near]).all()


def test_walls_and_unreachable_are_inf():
    cfg = EnvConfig(map_type="Block", level=1)
    m = maps.generate_block_map(cfg, jax.random.PRNGKey(4))
    goal = np.array(maps.sample_free_cells(jax.random.PRNGKey(5), m, 1))[0]
    d = np.array(jax.jit(lambda m, g: distance_field(m, g, 128))(m, jnp.array(goal)))
    assert (d[np.array(m) == 1] >= int(INF)).all()


def test_distance_fields_vectorized():
    cfg = EnvConfig(map_type="Block", level=1)
    m = maps.generate_block_map(cfg, jax.random.PRNGKey(6))
    goals = maps.sample_free_cells(jax.random.PRNGKey(7), m, 3)
    ds = np.array(jax.jit(lambda m, g: distance_fields(m, g, 128))(m, goals))
    for i, g in enumerate(np.array(goals)):
        assert ds[i, g[0], g[1]] == 0
