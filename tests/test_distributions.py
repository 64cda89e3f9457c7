"""Distributional cross-validation vs the ACTUAL reference env (round-3
verdict next-step 8).

The per-transition cross-check (tests/test_crosscheck.py) validates exact
invariants; a *distributional* drift that preserves them — e.g. a skewed
obstacle-ratio sampler, a biased spawn offset, a navigator that prefers
different directions — would slip through. Here both engines generate
hundreds of episodes and the generated DISTRIBUTIONS are compared with
loose two-sample KS / chi-square thresholds (alpha ~ 1e-3):

  * Block map obstacle ratio (generators.py:157-176: r = 0.15*rand() at
    level 0, then uniform scatter) — KS over per-reset interior wall
    fraction;
  * Maze map wall density (generators.py:115-145 wiki aisle walk) — KS;
  * spawn offset target-vs-tracker (generators.py:82-94
    sample_close_states(max_distance=1)) — chi-square over the 3x3 cells;
  * realized Navigator move deltas (navigator.py:11-41 A* descent vs our
    reset-time tape, envs/opponents.py) — chi-square over
    {up, down, left, right, stay}.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from active_tracking_rl_tpu.config import parse_env_id
from active_tracking_rl_tpu.envs.env import TrackEnv
from active_tracking_rl_tpu.run.parity import _import_reference

# chi-square critical values at alpha = 0.001
_CHI2_CRIT = {1: 10.83, 2: 13.82, 3: 16.27, 4: 18.47, 5: 20.52,
              6: 22.46, 7: 24.32, 8: 26.12, 9: 27.88, 10: 29.59}


def _ks_2samp_ok(a, b, alpha_c: float = 1.95) -> "tuple[bool, float, float]":
    """Two-sample KS test; alpha_c=1.95 ~ alpha=0.001."""
    a, b = np.sort(np.asarray(a)), np.sort(np.asarray(b))
    n, m = len(a), len(b)
    allv = np.concatenate([a, b])
    cdf_a = np.searchsorted(a, allv, side="right") / n
    cdf_b = np.searchsorted(b, allv, side="right") / m
    d = np.abs(cdf_a - cdf_b).max()
    crit = alpha_c * np.sqrt((n + m) / (n * m))
    return d <= crit, float(d), float(crit)


def _chi2_2samp_ok(counts_a, counts_b) -> "tuple[bool, float, float]":
    """Two-sample chi-square homogeneity over shared categories."""
    ca = np.asarray(counts_a, np.float64)
    cb = np.asarray(counts_b, np.float64)
    keep = (ca + cb) > 0
    ca, cb = ca[keep], cb[keep]
    na, nb = ca.sum(), cb.sum()
    pooled = (ca + cb) / (na + nb)
    ea, eb = pooled * na, pooled * nb
    stat = float((((ca - ea) ** 2) / ea).sum() + (((cb - eb) ** 2) / eb).sum())
    dof = len(ca) - 1
    crit = _CHI2_CRIT.get(dof, 10.83 + 2.5 * dof)
    return stat <= crit, stat, crit


# --- reference-side collectors (patched global RNG, parity.py pattern) ---

def _ref_collect(env_id: str, n_resets: int, n_steps: int, seed: int):
    """(ratios per reset, spawn offsets per reset, target deltas per step)."""
    gym = _import_reference()
    np.random.seed(seed)
    seed_fn = np.random.seed
    np.random.seed = lambda *a, **kw: None   # defeat OS reseeding
    try:
        env = gym.make(env_id)
        ratios, offsets = [], []
        for _ in range(n_resets):
            env.reset()
            raw = env.unwrapped
            ratios.append(float(np.asarray(raw.maze)[1:-1, 1:-1].mean()))
            offsets.append((int(raw.state[1][0] - raw.state[0][0]),
                            int(raw.state[1][1] - raw.state[0][1])))
        deltas = []
        env.reset()
        raw = env.unwrapped
        for _ in range(n_steps):
            before = tuple(int(x) for x in raw.state[1])
            _, _, done, _ = env.step([int(np.random.randint(4)), 0])
            after = tuple(int(x) for x in raw.state[1])
            deltas.append((after[0] - before[0], after[1] - before[1]))
            if done:
                env.reset()
                raw = env.unwrapped
        return np.array(ratios), offsets, deltas
    finally:
        np.random.seed = seed_fn


# --- JAX-engine collectors ---

def _jax_reset_stats(env_id: str, n: int, seed: int):
    ecfg = parse_env_id(env_id)
    env = TrackEnv(ecfg)
    state, _ = jax.jit(lambda k: env.reset_batch(k, n))(
        jax.random.PRNGKey(seed))
    p = ecfg.pob_size
    mazes = np.asarray(state.maze)[:, p:-p, p:-p]      # unpadded S x S
    ratios = mazes[:, 1:-1, 1:-1].mean(axis=(1, 2))
    pos = np.asarray(state.pos)
    offsets = [tuple(o) for o in (pos[:, 1] - pos[:, 0])]
    return ratios, offsets


def _jax_target_deltas(env_id: str, rows: int, steps: int, seed: int):
    ecfg = parse_env_id(env_id)
    env = TrackEnv(ecfg)

    @jax.jit
    def run(key):
        k0, ks = jax.random.split(key)
        state, _ = env.reset_batch(k0, rows)

        def step(carry, k):
            state = carry
            a0 = jax.random.randint(k, (rows,), 0, 4, jnp.int32)
            acts = jnp.stack([a0, jnp.zeros_like(a0)], -1)
            before = state.pos[:, 1]
            state, _, _, done, _ = env.step_batch(state, acts)
            delta = state.pos[:, 1] - before
            return state, (delta, done)

        keys = jax.random.split(ks, steps)
        _, (deltas, dones) = jax.lax.scan(step, state, keys)
        return deltas, dones

    deltas, dones = run(jax.random.PRNGKey(seed))
    deltas, dones = np.asarray(deltas), np.asarray(dones)
    # only count steps before the first termination of each row
    alive = np.cumsum(np.roll(dones, 1, axis=0), axis=0) == 0
    alive[0] = True
    out = [tuple(d) for t in range(deltas.shape[0])
           for d in deltas[t][alive[t]]]
    return out


_DELTA_CATS = [(-1, 0), (1, 0), (0, -1), (0, 1), (0, 0)]
_OFFSET_CATS = [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]


def _counts(items, cats):
    c = {k: 0 for k in cats}
    other = 0
    for it in items:
        if it in c:
            c[it] += 1
        else:
            other += 1
    return np.array([c[k] for k in cats]), other


def test_stat_helpers_can_fail():
    """Guards against vacuous passes: the two-sample tests must reject
    clearly different distributions at these sample sizes."""
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 0.15, 300)
    ok, _, _ = _ks_2samp_ok(a, rng.uniform(0, 0.15, 512) + 0.02)
    assert not ok
    ok, _, _ = _ks_2samp_ok(a, rng.uniform(0, 0.15, 512))
    assert ok
    ok, _, _ = _chi2_2samp_ok([100, 100, 100, 100], [100, 100, 100, 100])
    assert ok
    ok, _, _ = _chi2_2samp_ok([100, 100, 100, 100], [160, 60, 100, 100])
    assert not ok


@pytest.mark.slow
def test_block_map_and_spawn_distributions_match_reference():
    env_id = "Track2D-BlockPartialNav-v0"
    ref_ratios, ref_offsets, _ = _ref_collect(env_id, n_resets=300,
                                              n_steps=0, seed=11)
    jax_ratios, jax_offsets = _jax_reset_stats(env_id, 512, seed=4)

    ok, d, crit = _ks_2samp_ok(ref_ratios, jax_ratios)
    assert ok, f"Block obstacle-ratio KS failed: D={d:.4f} > crit={crit:.4f}"

    rc, r_other = _counts(ref_offsets, _OFFSET_CATS)
    jc, j_other = _counts(jax_offsets, _OFFSET_CATS)
    assert r_other == 0 and j_other == 0, (r_other, j_other)
    ok, stat, crit = _chi2_2samp_ok(rc, jc)
    assert ok, f"spawn-offset chi2 failed: {stat:.1f} > {crit:.1f} ({rc} vs {jc})"


@pytest.mark.slow
def test_maze_wall_density_matches_reference():
    env_id = "Track2D-MazePartialRam-v0"
    ref_ratios, _, _ = _ref_collect(env_id, n_resets=150, n_steps=0, seed=13)
    jax_ratios, _ = _jax_reset_stats(env_id, 256, seed=5)
    ok, d, crit = _ks_2samp_ok(ref_ratios, jax_ratios)
    assert ok, f"Maze wall-density KS failed: D={d:.4f} > crit={crit:.4f}"


@pytest.mark.slow
@pytest.mark.parametrize("env_id", ["Track2D-BlockPartialNav-v0",
                                    "Track2D-BlockPartialRPF-v0"])
def test_navigator_move_distribution_matches_reference(env_id):
    _, _, ref_deltas = _ref_collect(env_id, n_resets=0, n_steps=600, seed=17)
    jax_deltas = _jax_target_deltas(env_id, rows=8, steps=120, seed=6)

    rc, r_other = _counts(ref_deltas, _DELTA_CATS)
    jc, j_other = _counts(jax_deltas, _DELTA_CATS)
    assert r_other == 0 and j_other == 0
    ok, stat, crit = _chi2_2samp_ok(rc, jc)
    assert ok, (f"navigator delta chi2 failed: {stat:.1f} > {crit:.1f} "
                f"(ref {rc} vs jax {jc})")
