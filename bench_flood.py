"""Flood-kernel shootout on the real chip: XLA relaxation vs Pallas
relaxation vs Pallas fast-sweeping, at reset-pool scale (rows x goals
fields) on Block and Maze maps. Decides envs/distance.py's "auto" backend.

Prints one JSON dict of seconds per call (lower is better).
"""

import json
import time

from active_tracking_rl_tpu.utils.platform import respect_jax_platforms

respect_jax_platforms()

import jax
import jax.numpy as jnp

from active_tracking_rl_tpu.config import EnvConfig, parse_env_id
from active_tracking_rl_tpu.envs import maps
from active_tracking_rl_tpu.envs.distance import distance_fields_backend

ROWS = 512          # bench.py reset pool at num_envs 4096
GOALS = 16          # nav_goal_candidates


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    results = {}
    for env_id in ["Track2D-BlockPartialNav-v0", "Track2D-MazePartialNav-v0"]:
        ecfg = parse_env_id(env_id)
        mz = jax.jit(lambda k: jax.vmap(
            lambda kk: maps.generate_map(ecfg, kk))(
                jax.random.split(k, ROWS)))(jax.random.PRNGKey(3))
        free = (mz[0] == 0)
        # valid goals: any free cell works; reuse one batch of sampled cells
        goals = jax.vmap(lambda m, k: maps.sample_free_cells(k, m, GOALS))(
            mz, jax.random.split(jax.random.PRNGKey(4), ROWS))
        key = env_id.split("-")[1]
        for backend in ["xla", "pallas", "pallas_sweep"]:
            f = jax.jit(lambda m, g, b=backend: jax.vmap(
                lambda mm, gg: distance_fields_backend(
                    mm, gg, ecfg.flood_iters, b))(m, g))
            try:
                results[f"{key}_{backend}_s"] = round(
                    timeit(f, mz, goals), 4)
            except Exception as e:  # noqa: BLE001
                results[f"{key}_{backend}_s"] = f"error: {e}"
        # cross-validate on-chip: sweep must equal relax must equal xla
        try:
            a = jax.jit(lambda m, g: jax.vmap(lambda mm, gg:
                distance_fields_backend(mm, gg, ecfg.flood_iters, "pallas"))(
                    m, g))(mz[:8], goals[:8])
            b = jax.jit(lambda m, g: jax.vmap(lambda mm, gg:
                distance_fields_backend(mm, gg, ecfg.flood_iters,
                                        "pallas_sweep"))(m, g))(mz[:8],
                                                                goals[:8])
            import numpy as np
            results[f"{key}_sweep_equals_relax"] = bool(
                np.array_equal(np.asarray(a), np.asarray(b)))
        except Exception as e:  # noqa: BLE001
            results[f"{key}_sweep_equals_relax"] = f"error: {e}"
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
