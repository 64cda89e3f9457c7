"""Ad-hoc profiling: where does one learner iteration go?

Times, on the real chip:
  * full jitted train step (rollout+pool+loss+update)
  * the reset pool generation alone (map gen + spawns + nav tapes + floods)
  * flood fields alone (pool_rows x nav_goal_candidates fields)
  * map generation alone
  * ram-tape pool (no floods) as the lower bound for episode init
"""
import json
import time

from active_tracking_rl_tpu.utils.platform import respect_jax_platforms

respect_jax_platforms()

import jax
import jax.numpy as jnp

from active_tracking_rl_tpu.config import NetConfig, TrainConfig, parse_env_id
from active_tracking_rl_tpu.envs import maps
from active_tracking_rl_tpu.envs.distance import distance_fields_backend
from active_tracking_rl_tpu.envs.env import TrackEnv
from active_tracking_rl_tpu.models.dueling import build_model
from active_tracking_rl_tpu.rl.learner import init_learner, make_train_step

NUM_ENVS = 4096
POOL = NUM_ENVS // 8


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
    for env_id in ["Track2D-BlockPartialNav-v0", "Track2D-BlockPartialRam-v0"]:
        ecfg = parse_env_id(env_id)
        env = TrackEnv(ecfg)
        tcfg = TrainConfig(env_id=env_id, num_envs=NUM_ENVS, reset_pool=POOL,
                           train_mode=0)
        ncfg = NetConfig.from_name("maze-lstm", aux="none")
        model = build_model(ncfg, ecfg.num_actions, ecfg.obs_shape)
        state, opt = init_learner(model, env, ncfg, tcfg, jax.random.PRNGKey(0))
        ts = jax.jit(make_train_step(model, env, ncfg, tcfg, opt))
        mode = jnp.int32(0)

        t_step = timeit(lambda: ts(state.params, state.opt_state, state.carry,
                                   mode))
        reset_pool = jax.jit(lambda k: env.reset_batch(k, POOL))
        t_pool = timeit(lambda: reset_pool(jax.random.PRNGKey(1)))

        t_maps = timeit(jax.jit(lambda k: jax.vmap(
            lambda kk: maps.generate_map(ecfg, kk))(
                jax.random.split(k, POOL))), jax.random.PRNGKey(2))

        key = env_id.split("-")[1]
        results[key] = {"train_step_s": t_step, "pool_s": t_pool,
                        "maps_s": t_maps,
                        "steps_per_s": NUM_ENVS * tcfg.num_steps / t_step}

    # flood fields alone, matching the Nav pool's work: POOL rows x 16 goals
    ecfg = parse_env_id("Track2D-BlockPartialNav-v0")
    mz = jax.vmap(lambda k: maps.generate_map(ecfg, k))(
        jax.random.split(jax.random.PRNGKey(3), POOL))
    goals = jnp.full((POOL, 16, 2), 40, jnp.int32)
    for backend in ["xla", "pallas"]:
        f = jax.jit(lambda m, g: jax.vmap(
            lambda mm, gg: distance_fields_backend(
                mm, gg, ecfg.flood_iters, backend))(m, g))
        try:
            results[f"flood_{backend}_s"] = timeit(f, mz, goals)
        except Exception as e:  # noqa: BLE001
            results[f"flood_{backend}_s"] = f"error: {e}"

    print(json.dumps(results, indent=1, default=str))


if __name__ == "__main__":
    main()
