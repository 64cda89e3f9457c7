"""Pallas flood-fill kernel vs the XLA reference implementation
(envs/distance.py is the contract + oracle; run in interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from active_tracking_rl_tpu.config import EnvConfig
from active_tracking_rl_tpu.envs import maps
from active_tracking_rl_tpu.envs.distance import distance_fields
import pytest

from active_tracking_rl_tpu.ops.flood_pallas import flood_fields_pallas

# "sweep16" is interpret-only: Mosaic lacks 16-bit rotate (see
# flood_fields_pallas) — included here so the int16 math stays oracle-exact.
VARIANTS = ["relax", "sweep", "sweep16"]


@pytest.mark.parametrize("variant", VARIANTS)
def test_flood_pallas_matches_xla_block(variant):
    cfg = EnvConfig(map_type="Block", level=1)
    m = maps.generate_block_map(cfg, jax.random.PRNGKey(0))
    goals = maps.sample_free_cells(jax.random.PRNGKey(1), m, 4)
    ref = np.array(distance_fields(m, goals, 96))
    got = np.array(flood_fields_pallas(m, goals, 96, interpret=True,
                                       variant=variant))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("variant", VARIANTS)
def test_flood_pallas_matches_xla_maze(variant):
    """Maze maps: long winding corridors — many direction alternations, the
    hard case for fast sweeping; also exercises the distance cap (serpentine
    paths can exceed it, and capped cells must come out INF exactly like the
    iteration-capped relaxation)."""
    cfg = EnvConfig(map_type="Maze", level=5)
    m = maps.generate_map(cfg, jax.random.PRNGKey(7))
    goals = maps.sample_free_cells(jax.random.PRNGKey(8), m, 4)
    for iters in (48, 256):
        ref = np.array(distance_fields(m, goals, iters))
        got = np.array(flood_fields_pallas(m, goals, iters, interpret=True,
                                           variant=variant))
        np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("variant", VARIANTS)
def test_flood_pallas_goal_block_padding(variant):
    """G > _G_BLOCK exercises the grid; G not a multiple exercises padding."""
    cfg = EnvConfig(map_type="Empty")
    m = maps.generate_block_map(cfg, jax.random.PRNGKey(2))
    goals = maps.sample_free_cells(jax.random.PRNGKey(3), m, 9)
    ref = np.array(distance_fields(m, goals, 48))
    got = np.array(flood_fields_pallas(m, goals, 48, interpret=True,
                                       variant=variant))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("variant", VARIANTS)
def test_flood_pallas_walls_inf(variant):
    cfg = EnvConfig(map_type="Block", level=1)
    m = maps.generate_block_map(cfg, jax.random.PRNGKey(4))
    goals = maps.sample_free_cells(jax.random.PRNGKey(5), m, 2)
    got = np.array(flood_fields_pallas(m, goals, 32, interpret=True,
                                       variant=variant))
    mn = np.array(m)
    assert (got[:, mn == 1] >= 16000).all()
    g = np.array(goals)
    assert got[0, g[0, 0], g[0, 1]] == 0
    assert got[1, g[1, 0], g[1, 1]] == 0
