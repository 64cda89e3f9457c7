#!/bin/bash
# Post-training chip work: eval matrix, bench sweep, profiles.
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_atr
cd /root/repo
set -x
bash runs/eval_suite.sh > runs/eval_suite.out 2>&1
python bench.py --sweep > PERF_SWEEP.json 2> runs/bench_sweep.err
python profile_iter.py > PROFILE_ITER.json 2> runs/profile_iter.err
python bench.py > BENCH_CANDIDATE.json 2>> runs/bench_sweep.err
python -m active_tracking_rl_tpu.run.random_agent --num-envs 8192 --seconds 5 > runs/random_agent_fps.out 2>&1
echo POSTRUN_DONE
