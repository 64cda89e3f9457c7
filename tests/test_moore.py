"""Moore (8-action) dynamics — plumbed since round 3 but never exercised
(round-4 verdict missing #2).

The reference defines the Moore neighborhood at track_1v1.py:242-248
(spaces.Discrete(8)) with the transition table at :278-279:
{0:[-1,0], 1:[+1,0], 2:[0,-1], 3:[0,+1],
 4:[-1,+1], 5:[+1,+1], 6:[-1,-1], 7:[+1,-1]}
and the same hit-wall-stay collision rule (:283-285). No registered env id
uses it (all 72 are VonNeumann), so it is covered here as an explicit
EnvConfig, including diagonal wall collisions and na=8 scripted tapes.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from active_tracking_rl_tpu.config import parse_env_id
from active_tracking_rl_tpu.envs.env import TrackEnv
from active_tracking_rl_tpu.envs.opponents import DELTAS, build_tape

#: the reference transition table, verbatim (track_1v1.py:278-279)
REF_TRANSITIONS = {0: [-1, 0], 1: [+1, 0], 2: [0, -1], 3: [0, +1],
                   4: [-1, +1], 5: [+1, +1], 6: [-1, -1], 7: [+1, -1]}


def _moore_cfg(env_id="Track2D-EmptyPartialAdv-v0", **kw):
    return dataclasses.replace(parse_env_id(env_id),
                               action_type="Moore", **kw)


def test_deltas_match_reference_table():
    d = np.asarray(DELTAS)
    for a, t in REF_TRANSITIONS.items():
        np.testing.assert_array_equal(d[a], t)


def test_moore_step_matches_numpy_oracle():
    """Batched Moore stepping vs a per-cell NumPy oracle of
    _next_state (track_1v1.py:281-285), all 8 actions, incl. diagonal
    moves INTO walls (stay + collision) and along open cells."""
    cfg = _moore_cfg("Track2D-BlockPartialAdv-v0")
    assert cfg.num_actions == 8
    env = TrackEnv(cfg)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(3))
    maze_p = np.asarray(state.maze)              # padded by pob_size
    p = cfg.pob_size

    st = state
    rng = np.random.default_rng(0)
    pos = np.asarray(st.pos)
    for t in range(60):
        acts = rng.integers(0, 8, size=2)
        st, obs, rew, done, info = jax.jit(env.step)(
            st, jnp.asarray(acts, jnp.int32))
        # oracle
        exp = pos.copy()
        for i in range(2):
            nxt = pos[i] + np.asarray(REF_TRANSITIONS[int(acts[i])])
            if maze_p[nxt[0] + p, nxt[1] + p] != 1:
                exp[i] = nxt
        np.testing.assert_array_equal(np.asarray(st.pos), exp,
                                      err_msg=f"step {t} acts {acts}")
        pos = exp
        if bool(done):
            break


def test_moore_diagonal_wall_collision():
    """A diagonal action whose DESTINATION is a wall leaves the agent in
    place and flags the collision — even when both cardinal 'components'
    of the diagonal are free (the reference checks only the destination
    cell, track_1v1.py:283-285)."""
    cfg = _moore_cfg()
    env = TrackEnv(cfg)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(1))
    p = cfg.pob_size
    pos0 = np.asarray(state.pos[0])
    # build a state whose up-right diagonal is a wall but up and right free
    maze = np.asarray(state.maze).copy()
    r, c = pos0[0] + p, pos0[1] + p
    maze[r - 1, c + 1] = 1        # diagonal destination: wall
    maze[r - 1, c] = 0            # up free
    maze[r, c + 1] = 0            # right free
    st = state.replace(maze=jnp.asarray(maze))
    before_coll = np.asarray(st.c_collision).copy()
    st2, _, _, _, _ = jax.jit(env.step)(st, jnp.asarray([4, 0], jnp.int32))
    np.testing.assert_array_equal(np.asarray(st2.pos[0]), pos0)  # stayed
    assert int(st2.c_collision[0]) == int(before_coll[0]) + 1


def test_moore_ram_tape_na8():
    """Ram burst tapes at na=8: all 8 actions appear, values < 8, and the
    tape drives a full episode without leaving the legal action set."""
    cfg = _moore_cfg("Track2D-EmptyPartialRam-v0", tape_len=512)
    assert cfg.scripted and cfg.num_actions == 8
    key = jax.random.PRNGKey(0)
    maze = jnp.zeros((10, 10), jnp.uint8)
    tape = build_tape(cfg, key, maze, jnp.array([5, 5]), jnp.array([2, 2]))
    t = np.asarray(tape)
    assert t.min() >= 0 and t.max() <= 7
    assert len(np.unique(t)) == 8        # every Moore action gets used
    # and stepping the env consumes it legally
    env = TrackEnv(cfg)
    st, _ = jax.jit(env.reset)(jax.random.PRNGKey(2))
    for _ in range(30):
        st, obs, rew, done, info = jax.jit(env.step)(
            st, jnp.asarray([0, 0], jnp.int32))
        if bool(done):
            break
    assert np.asarray(obs).shape == (2, 13, 13)


def test_moore_nav_tape_greedy_descent():
    """Navigator tapes at na=8: greedy descent uses diagonals when they cut
    distance (Moore shortest paths are Chebyshev-like on empty maps), the
    tape stays in [0, 8), and following it from the spawn respects walls."""
    cfg = _moore_cfg("Track2D-EmptyPartialNav-v0", tape_len=256)
    assert cfg.scripted and cfg.num_actions == 8
    env = TrackEnv(cfg)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(7))
    tape = np.asarray(state.tape)
    assert tape.min() >= 0 and tape.max() <= 7
    assert (tape >= 4).any(), "no diagonal ever chosen on an empty map"
    # replay the tape with the reference transition table: legal moves only
    maze_p = np.asarray(state.maze)
    p = cfg.pob_size
    pos = np.asarray(state.pos[1]).copy()
    for a in tape[:100]:
        nxt = pos + np.asarray(REF_TRANSITIONS[int(a)])
        if maze_p[nxt[0] + p, nxt[1] + p] != 1:
            pos = nxt
    # target must actually travel (greedy descent, not a stuck loop)
    assert np.abs(pos - np.asarray(state.pos[1])).sum() > 0
