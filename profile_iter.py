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

    # ---- K=16 core-step decomposition (round-3 verdict item 5) ----------
    # With the pool external, the core iteration is rollout+loss+grad+update.
    # Break it into: model scan (encoder+LSTM+heads fwd), env scan
    # (dynamics + obs painting), autoreset gathers, and the backward pass
    # (core - forward-only rollout).
    env_id = "Track2D-BlockPartialNav-v0"
    ecfg = parse_env_id(env_id)
    env = TrackEnv(ecfg)
    tcfg = TrainConfig(env_id=env_id, num_envs=NUM_ENVS, reset_pool=POOL,
                       train_mode=0, remat=True)
    ncfg = NetConfig.from_name("maze-lstm", aux="none")
    model = build_model(ncfg, ecfg.num_actions, ecfg.obs_shape)
    state, opt = init_learner(model, env, ncfg, tcfg, jax.random.PRNGKey(0))
    from active_tracking_rl_tpu.rl.learner import make_pool_fn
    from active_tracking_rl_tpu.rl.rollout import run_rollout
    from active_tracking_rl_tpu.rl.learner import init_pool_ptr
    pool = jax.jit(make_pool_fn(env, tcfg))(jax.random.PRNGKey(9))
    pool = (*pool, init_pool_ptr())
    ts_ext = jax.jit(make_train_step(model, env, ncfg, tcfg, opt,
                                     external_pool=True))
    mode = jnp.int32(0)
    core = {}
    core["core_step_s"] = timeit(
        lambda: ts_ext(state.params, state.opt_state, state.carry, mode, pool))

    rollout_fwd = jax.jit(lambda p, c: run_rollout(model, env, tcfg, p, c,
                                                   pool=pool[:2]))
    core["rollout_fwd_s"] = timeit(lambda: rollout_fwd(state.params,
                                                       state.carry))
    core["backward_s"] = core["core_step_s"] - core["rollout_fwd_s"]

    T = tcfg.num_steps
    carry = state.carry

    @jax.jit
    def model_scan(params, obs_stack, hx, cx, key):
        from active_tracking_rl_tpu.rl.rollout import obs_to_model
        obs_f = obs_to_model(obs_stack)

        def f(c, k):
            hx, cx = c
            out = model.step_both(params, obs_f, hx, cx, k)
            return (out[4], out[5]), out[1]

        return jax.lax.scan(f, (hx, cx), jax.random.split(key, T))

    core["model_scan_s"] = timeit(lambda: model_scan(
        state.params, carry.obs_stack, carry.hx, carry.cx,
        jax.random.PRNGKey(1)))

    @jax.jit
    def env_scan(st, key):
        def f(s, k):
            a = jax.random.randint(k, (NUM_ENVS, 2), 0, 4, jnp.int32)
            s, obs, rew, done, _ = env.step_batch(s, a)
            return s, rew

        return jax.lax.scan(f, st, jax.random.split(key, T))

    core["env_scan_s"] = timeit(lambda: env_scan(carry.env_state,
                                                 jax.random.PRNGKey(2)))

    @jax.jit
    def autoreset_scan(st, obs, key):
        ps, po = pool[0], pool[1]

        def f(c, k):
            s, ptr = c
            done = jax.random.bernoulli(k, 0.04, (NUM_ENVS,))
            s, o, ptr = env.autoreset(s, obs, done, ps, po, ptr)
            return (s, ptr), o[0, 0, 0]

        return jax.lax.scan(f, (st, jnp.int32(0)), jax.random.split(key, T))

    obs0 = carry.obs_stack[:, :, 0]
    core["autoreset_scan_s"] = timeit(lambda: autoreset_scan(
        carry.env_state, obs0, jax.random.PRNGKey(3)))
    results["core_decomposition_k16"] = core

    # flood fields alone, matching the Nav pool's work: POOL rows x 16 goals
    ecfg = parse_env_id("Track2D-BlockPartialNav-v0")
    mz = jax.vmap(lambda k: maps.generate_map(ecfg, k))(
        jax.random.split(jax.random.PRNGKey(3), POOL))
    goals = jnp.full((POOL, 16, 2), 40, jnp.int32)

    # nav-tape simulation alone (tape_len-step scan with field gathers)
    from active_tracking_rl_tpu.envs.opponents import nav_tape
    spawn = jnp.full((POOL, 2), 41, jnp.int32)

    @jax.jit
    def tapes(key):
        ks = jax.random.split(key, POOL)
        return jax.vmap(lambda k, m, s: nav_tape(ecfg, k, m, s, s))(
            ks, mz, spawn)

    results["nav_tape_s"] = timeit(tapes, jax.random.PRNGKey(5))

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
