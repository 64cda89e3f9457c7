import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from active_tracking_rl_tpu.config import EnvConfig, env_ids, parse_env_id
from active_tracking_rl_tpu.envs.env import TrackEnv, make_env, reset, step
from tests import oracles

FAST = dict(nav_goal_candidates=4, flood_iters=96, tape_len=96)


def fast_cfg(**kw):
    base = EnvConfig(**kw)
    return dataclasses.replace(base, **FAST)


def test_env_id_registry_complete():
    ids = env_ids()
    assert len(ids) == 72
    assert "Track2D-BlockPartialPZR-v0" in ids
    for i in ids[:6]:
        parse_env_id(i)


def test_step_against_oracle_dynamics():
    """Random action sequences: positions, collisions, rewards, c_far and
    termination must match the NumPy oracle step-for-step."""
    cfg = fast_cfg(map_type="Block", target_mode="PZR", level=0)
    env = TrackEnv(cfg)
    st, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    stepj = jax.jit(env.step)

    maze = np.array(st.maze)[6:-6, 6:-6]  # unpadded
    pos = [tuple(p) for p in np.array(st.pos)]
    c_far, t = 0, 0
    rng = np.random.RandomState(7)
    s = st
    for _ in range(120):
        a = [int(rng.randint(4)), int(rng.randint(4))]
        s, o, r, d, info = stepj(s, jnp.array(a))
        # oracle
        new_pos, colls = [], []
        for i in range(2):
            p, coll = oracles.next_state(maze, pos[i], a[i])
            new_pos.append(p)
            colls.append(coll)
        pos = new_pos
        r0, r1, dist = oracles.rewards(pos[0], pos[1], cfg.w_p)
        c_far = 0 if dist <= 6.0 else c_far + 1
        t += 1
        done = (c_far > 10) or (t >= cfg.max_episode_steps)
        assert [tuple(p) for p in np.array(s.pos)] == pos
        # atol: XLA folds 2*d/6 into d*(1/3); float32 rounding gives ~3e-8
        np.testing.assert_allclose(np.array(r), [r0, r1], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(info["distance"]), dist, rtol=1e-5,
                                   atol=1e-6)
        assert bool(d) == done
        if done:
            break


def test_partial_obs_matches_oracle():
    cfg = fast_cfg(map_type="Block", target_mode="Adv", level=0)
    env = TrackEnv(cfg)
    st, obs = jax.jit(env.reset)(jax.random.PRNGKey(1))
    maze = np.array(st.maze)[6:-6, 6:-6]
    pos = [tuple(p) for p in np.array(st.pos)]
    for i in range(2):
        np.testing.assert_array_equal(
            np.array(obs)[i], oracles.partial_obs(maze, pos, i))
    # after some steps too
    stepj = jax.jit(env.step)
    s = st
    rng = np.random.RandomState(3)
    for _ in range(30):
        s, o, r, d, _ = stepj(s, jnp.array([rng.randint(4), rng.randint(4)]))
    pos = [tuple(p) for p in np.array(s.pos)]
    for i in range(2):
        np.testing.assert_array_equal(
            np.array(o)[i], oracles.partial_obs(maze, pos, i))


def test_full_obs_matches_oracle():
    cfg = fast_cfg(map_type="Block", obs_type="Full", target_mode="Adv",
                   level=1)
    env = TrackEnv(cfg)
    st, obs = jax.jit(env.reset)(jax.random.PRNGKey(2))
    maze = np.array(st.maze)[6:-6, 6:-6]
    pos = [tuple(p) for p in np.array(st.pos)]
    for i in range(2):
        np.testing.assert_array_equal(
            np.array(obs)[i], oracles.full_obs(maze, pos, i))


def test_overlap_paints_own_color():
    """When both agents share a cell, each sees its own color at the center
    (track_1v1.py:300-313 paint order)."""
    cfg = fast_cfg(map_type="Empty", target_mode="Adv")
    env = TrackEnv(cfg)
    st, _ = jax.jit(env.reset)(jax.random.PRNGKey(3))
    st = st.replace(pos=jnp.array([[40, 40], [40, 40]], jnp.int32))
    from active_tracking_rl_tpu.envs.observe import observe
    obs = np.array(observe(cfg, st.maze, st.pos))
    assert obs[0, 6, 6] == 2 and (obs[0] != 4).all()
    assert obs[1, 6, 6] == 4 and (obs[1] != 2).all()


def test_full_obs_overlap_no_own_repaint():
    """Full obs never repaints the observer (track_1v1.py:296-307): on
    overlap BOTH agents see the later paint (color 4), and both agents'
    full observations are identical."""
    cfg = fast_cfg(map_type="Empty", obs_type="Full", target_mode="Adv")
    env = TrackEnv(cfg)
    st, _ = jax.jit(env.reset)(jax.random.PRNGKey(3))
    st = st.replace(pos=jnp.array([[40, 40], [40, 40]], jnp.int32))
    from active_tracking_rl_tpu.envs.observe import observe
    obs = np.array(observe(cfg, st.maze, st.pos))
    assert obs[0, 40, 40] == 4 and obs[1, 40, 40] == 4
    assert (obs[0] != 2).all()
    np.testing.assert_array_equal(obs[0], obs[1])


def test_scripted_override_ignores_model_target_action():
    cfg = fast_cfg(map_type="Empty", target_mode="Ram")
    env = TrackEnv(cfg)
    st, _ = jax.jit(env.reset)(jax.random.PRNGKey(4))
    stepj = jax.jit(env.step)
    s1, *_ = stepj(st, jnp.array([0, 1]))
    s2, *_ = stepj(st, jnp.array([0, 3]))
    np.testing.assert_array_equal(np.array(s1.pos), np.array(s2.pos))


def test_timelimit():
    cfg = dataclasses.replace(fast_cfg(map_type="Empty", target_mode="Adv"),
                              max_episode_steps=15)
    env = TrackEnv(cfg)
    st, _ = jax.jit(env.reset)(jax.random.PRNGKey(5))
    # keep both agents together so c_far never fires: same actions
    stepj = jax.jit(env.step)
    s = st
    for t in range(15):
        s, o, r, d, _ = stepj(s, jnp.array([0, 0]))
    assert bool(d) and int(s.t) == 15


def test_lost_target_termination():
    cfg = fast_cfg(map_type="Empty", target_mode="Adv")
    env = TrackEnv(cfg)
    st, _ = jax.jit(env.reset)(jax.random.PRNGKey(6))
    # park agents far apart; done after 11 consecutive far steps
    st = st.replace(pos=jnp.array([[2, 2], [70, 70]], jnp.int32))
    stepj = jax.jit(env.step)
    s = st
    for t in range(11):
        s, o, r, d, _ = stepj(s, jnp.array([0, 1]))
        assert bool(d) == (t == 10)
    assert float(r[0]) == -1.0


def test_reward_asymmetry_modes():
    """w_p: PZR=1, Far=-0.5, others 0 (track_1v1.py:146-152)."""
    for mode, w in [("PZR", 1.0), ("Far", -0.5), ("Adv", 0.0)]:
        cfg = fast_cfg(map_type="Empty", target_mode=mode)
        env = TrackEnv(cfg)
        st, _ = jax.jit(env.reset)(jax.random.PRNGKey(7))
        st = st.replace(pos=jnp.array([[10, 10], [10, 30]], jnp.int32))
        _, _, r, _, info = jax.jit(env.step)(st, jnp.array([0, 0]))
        r0, r1, dist = oracles.rewards((9, 10), (9, 30), w)
        np.testing.assert_allclose(np.array(r), [r0, r1], rtol=1e-5)


def test_vectorized_rows_independent():
    cfg = fast_cfg(map_type="Block", target_mode="Ram", level=0)
    env = TrackEnv(cfg)
    st, obs = jax.jit(lambda k: env.reset_batch(k, 4))(jax.random.PRNGKey(8))
    # batch row i equals a scalar reset with the same key
    keys = jax.random.split(jax.random.PRNGKey(8), 4)
    st1, obs1 = jax.jit(env.reset)(keys[1])
    np.testing.assert_array_equal(np.array(obs)[1], np.array(obs1))
    np.testing.assert_array_equal(np.array(st.maze)[1], np.array(st1.maze))
    # stepping the batch equals stepping rows independently
    acts = jnp.array([[0, 0], [1, 0], [2, 0], [3, 0]])
    s2, o2, r2, d2, _ = jax.jit(env.step_batch)(st, acts)
    s1b, o1b, r1b, d1b, _ = jax.jit(env.step)(st1, acts[1])
    np.testing.assert_array_equal(np.array(o2)[1], np.array(o1b))
    np.testing.assert_allclose(np.array(r2)[1], np.array(r1b), rtol=1e-6)


def test_autoreset_swaps_done_rows():
    cfg = fast_cfg(map_type="Empty", target_mode="Adv")
    env = TrackEnv(cfg)
    st, obs = env.reset_batch(jax.random.PRNGKey(9), 3)
    pool_st, pool_obs = env.reset_batch(jax.random.PRNGKey(10), 4)
    done = jnp.array([False, True, True])
    s2, o2, ptr = env.autoreset(st, obs, done, pool_st, pool_obs,
                                jnp.int32(0))
    assert int(ptr) == 2
    np.testing.assert_array_equal(np.array(o2)[0], np.array(obs)[0])
    np.testing.assert_array_equal(np.array(o2)[1], np.array(pool_obs)[0])
    np.testing.assert_array_equal(np.array(o2)[2], np.array(pool_obs)[1])
    assert int(s2.t[1]) == 0


def test_center_full_obs_is_exact_permutation():
    """--center-full-obs (Full-obs training aid, envs/observe.py): each
    agent's frame is the cyclic roll of the painted map that puts the
    observer at the center cell; OFF by default (reference parity holds
    for all registered ids)."""
    from active_tracking_rl_tpu.envs.observe import observe
    cfg = fast_cfg(map_type="Block", target_mode="Adv", obs_type="Full")
    ccfg = dataclasses.replace(cfg, center_full_obs=True)
    st, obs_plain = jax.jit(lambda k: reset(cfg, k))(jax.random.PRNGKey(4))
    obs_c = observe(ccfg, st.maze, st.pos)
    s = cfg.maze_size
    c = s // 2
    plain = np.asarray(obs_plain)
    cent = np.asarray(obs_c)
    for i in range(2):
        pos = np.asarray(st.pos[i])
        rolled = np.roll(plain[i], (c - pos[0], c - pos[1]), axis=(0, 1))
        np.testing.assert_array_equal(cent[i], rolled)
        # the observer sits at the center (its own color unless overlapped)
        assert cent[i][c, c] in (2, 4)
    # batched path (the hot path) agrees with the single-row one
    env_c = TrackEnv(ccfg)
    stb, obsb = env_c.reset_batch(jax.random.PRNGKey(4), 3)
    ob0 = observe(ccfg, stb.maze[0], stb.pos[0])
    np.testing.assert_array_equal(np.asarray(obsb)[0], np.asarray(ob0))
