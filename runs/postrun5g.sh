#!/bin/bash
# Round-5 evidence hardening: second centered Full-obs seed + a fresh
# AD-VAT seed at HEAD (validates the final round-5 code trains the
# headline config end-to-end and extends the takeoff-reliability sample).
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_atr
cd /root/repo
set -x
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockFullNav-v0 --env-base Track2D-BlockFullNav-v0 \
  --network maze-lstm --aux none --train-mode 0 --seed 2 \
  --center-full-obs \
  --num-envs 1024 --reset-pool 256 --total-iters 6000 \
  --log-dir runs/r5-fullobs-centered-s2 > runs/r5-fullobs-centered-s2.out 2>&1
echo FULLOBS_S2_DONE
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialPZR-v0 --env-base Track2D-BlockPartialNav-v0 \
  --network tat-maze-lstm --train-mode -1 --init-step 1000 --seed 3 \
  --num-envs 1024 --reset-pool 256 --total-iters 6000 \
  --log-dir runs/r5-advat-s3 > runs/r5-advat-s3.out 2>&1
echo ADVAT_S3_DONE
