#!/bin/bash
# Chip work, take 2: single-process eval matrix, bench sweep, profiles.
cd /root/repo
set -x
RAM=$(ls -d runs/r3-tracker-ram/Track2D-BlockPartialRam-v0/*/ | head -1)
NAV=$(ls -d runs/r3-tracker-nav/Track2D-BlockPartialNav-v0/*/ | head -1)
ADV=$(ls -d runs/r3-advat/Track2D-BlockPartialPZR-v0/*/ | head -1)
python -m active_tracking_rl_tpu.run.eval_matrix \
  --tracker advat="$ADV/tracker-best.msgpack" \
  --tracker ram="$RAM/tracker-best.msgpack" \
  --tracker nav="$NAV/tracker-best.msgpack" \
  --target advat="$ADV/target-best.msgpack" \
  --out runs/EVAL_MATRIX.json > runs/eval_matrix.out 2>&1
python bench.py --sweep > PERF_SWEEP.json 2> runs/bench_sweep.err
python profile_iter.py > PROFILE_ITER.json 2> runs/profile_iter.err
python -m active_tracking_rl_tpu.run.random_agent --num-envs 8192 --seconds 5 > runs/random_agent_fps.out 2>&1
echo POSTRUN2_DONE
