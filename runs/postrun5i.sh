#!/bin/bash
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_atr
cd /root/repo
set -x
while ! grep -q FULLOBS_S2_EXT_DONE runs/postrun5h.out 2>/dev/null; do sleep 20; done
S3=$(ls -d runs/r5-advat-s3/Track2D-BlockPartialPZR-v0/*/ | head -1)
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialPZR-v0 --env-base Track2D-BlockPartialNav-v0 \
  --network tat-maze-lstm --train-mode -1 --init-step 1000 --seed 3 \
  --num-envs 1024 --reset-pool 256 --total-iters 12000 \
  --resume "$S3" \
  --log-dir runs/r5-advat-s3-ext > runs/r5-advat-s3-ext.out 2>&1
echo ADVAT_S3_EXT_DONE
