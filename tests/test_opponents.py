import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from active_tracking_rl_tpu.config import EnvConfig
from active_tracking_rl_tpu.envs import maps
from active_tracking_rl_tpu.envs.opponents import DELTAS, build_tape, nav_tape, ram_tape
from tests.oracles import bfs_distance, next_state


def test_ram_tape_shape_and_range():
    cfg = EnvConfig(target_mode="Ram")
    tape = np.array(ram_tape(cfg, jax.random.PRNGKey(0)))
    assert tape.shape == (cfg.tape_len,)
    assert ((tape >= 0) & (tape < 4)).all()


def test_ram_tape_has_bursts():
    """Half the regenerations are repeat-bursts (navigator.py:81-83), so the
    tape must contain runs of identical actions longer than i.i.d. predicts."""
    cfg = EnvConfig(target_mode="Ram")
    tape = np.array(ram_tape(cfg, jax.random.PRNGKey(1)))
    runs, cur = [], 1
    for a, b in zip(tape[:-1], tape[1:]):
        if a == b:
            cur += 1
        else:
            runs.append(cur)
            cur = 1
    runs.append(cur)
    assert max(runs) >= 5  # bursts up to length 9(+1) exist
    assert np.mean(runs) > 1.34  # i.i.d. uniform-4 mean run length ~1.33


def _simulate(maze, spawn, tape):
    pos = tuple(int(x) for x in spawn)
    track = [pos]
    for a in tape:
        pos, _ = next_state(maze, pos, int(a))
        track.append(pos)
    return track


def test_nav_tape_follows_shortest_path_to_first_goal():
    cfg = dataclasses.replace(EnvConfig(map_type="Block", target_mode="Nav",
                                        level=1))
    m = maps.generate_block_map(cfg, jax.random.PRNGKey(0))
    mn = np.array(m)
    pos, goals = maps.sample_spawns(cfg, jax.random.PRNGKey(1), m)
    spawn, goal1 = np.array(pos)[1], np.array(goals)[1]
    tape = np.array(nav_tape(cfg, jax.random.PRNGKey(2), m,
                             jnp.array(spawn), jnp.array(goal1)))
    d = bfs_distance(mn, goal1)
    dist = d[spawn[0], spawn[1]]
    if dist >= 1 and dist < 16000:
        track = _simulate(mn, spawn, tape[:dist])
        # greedy descent reaches the goal in exactly dist steps
        assert track[-1] == tuple(goal1)
        # and the distance decreases by 1 every step (shortest path)
        for t, p in enumerate(track):
            assert d[p[0], p[1]] == dist - t


def test_nav_tape_keeps_visiting_goals():
    """After the first goal the navigator replans to fresh goals — the target
    must keep moving (not get stuck) over the whole tape."""
    cfg = EnvConfig(map_type="Empty", target_mode="Nav")
    m = maps.generate_block_map(cfg, jax.random.PRNGKey(3))
    pos, goals = maps.sample_spawns(cfg, jax.random.PRNGKey(4), m)
    spawn, goal1 = np.array(pos)[1], np.array(goals)[1]
    tape = np.array(nav_tape(cfg, jax.random.PRNGKey(5), m,
                             jnp.array(spawn), jnp.array(goal1)))
    track = _simulate(np.array(m), spawn, tape)
    visited = len(set(track))
    assert visited > 50  # wanders across the open map


def test_nav_tape_planb_on_unreachable_goals():
    """A target walled into a 1-cell pocket cannot reach any goal: the
    navigator must fall back to planB random actions (navigator.py:33-34)
    rather than crash or emit constant actions."""
    cfg = dataclasses.replace(EnvConfig(map_type="Empty", target_mode="Nav"),
                              nav_goal_candidates=4, flood_iters=32,
                              tape_len=64)
    m = np.array(maps.generate_block_map(cfg, jax.random.PRNGKey(6)))
    m[39:42, 39:42] = 1
    m[40, 40] = 0  # pocket
    mj = jnp.array(m)
    spawn = jnp.array([40, 40])
    tape = np.array(nav_tape(cfg, jax.random.PRNGKey(7), mj, spawn,
                             jnp.array([5, 5])))
    # planB: random actions, at least 2 distinct values over 64 ticks whp
    assert len(set(tape.tolist())) >= 2
    # simulation stays put (all moves hit pocket walls)
    track = _simulate(m, np.array(spawn), tape)
    assert set(track) == {(40, 40)}


def test_nav_tape_distribution_matches_reference_oracle():
    """Deviation audit (pre-sampled goal pool vs the reference's fresh
    per-replan sampling): the tape navigator's wandering statistics —
    unique cells visited and total displacement over a long horizon — must
    fall in the same range as a NumPy oracle implementing the reference's
    exact exhaustion-only-replan semantics (navigator.py:11-63)."""
    from tests.oracles import navigator_sim
    cfg = dataclasses.replace(EnvConfig(map_type="Block", target_mode="Nav",
                                        level=1), tape_len=400)
    ticks = 400
    tape_visits, oracle_visits = [], []
    for seed in range(3):
        m = maps.generate_block_map(cfg, jax.random.PRNGKey(100 + seed))
        mn = np.array(m)
        pos, goals = maps.sample_spawns(cfg, jax.random.PRNGKey(200 + seed), m)
        spawn, goal1 = np.array(pos)[1], np.array(goals)[1]
        tape = np.array(nav_tape(cfg, jax.random.PRNGKey(300 + seed), m,
                                 jnp.array(spawn), jnp.array(goal1)))
        track = _simulate(mn, spawn, tape[:ticks])
        tape_visits.append(len(set(track)))
        rng = np.random.RandomState(400 + seed)
        otrack, _ = navigator_sim(mn, spawn, goal1, rng, ticks)
        oracle_visits.append(len(set(otrack)))
    tv, ov = np.mean(tape_visits), np.mean(oracle_visits)
    # same order of magnitude of map coverage (loose: stochastic quantities)
    assert 0.5 * ov <= tv <= 2.0 * ov, (tape_visits, oracle_visits)


def test_rpf_tape_cycles_patrol_goals():
    cfg = EnvConfig(map_type="Empty", target_mode="RPF")
    patrol = maps.patrol_goals(cfg)
    m = maps.carve_patrol(maps.generate_block_map(cfg, jax.random.PRNGKey(8)),
                          patrol)
    pos, goals = maps.sample_spawns(cfg, jax.random.PRNGKey(9), m, patrol)
    spawn = np.array(pos)[1]
    tape = np.array(build_tape(cfg, jax.random.PRNGKey(10), m,
                               jnp.array(spawn), jnp.array(goals)[1]))
    track = _simulate(np.array(m), spawn, tape)
    pt = [tuple(p) for p in np.array(patrol)]
    # the target walks the patrol corners in cyclic order 1,2,3,0,...
    hits = [p for p in track if p in pt]
    assert pt[1] in hits and pt[2] in hits
    i1, i2 = hits.index(pt[1]), hits.index(pt[2])
    assert i1 < i2


def test_dueling_modes_have_zero_tape():
    cfg = EnvConfig(target_mode="PZR")
    m = maps.generate_block_map(cfg, jax.random.PRNGKey(11))
    tape = np.array(build_tape(cfg, jax.random.PRNGKey(12), m,
                               jnp.array([1, 1]), jnp.array([2, 2])))
    assert (tape == 0).all()
