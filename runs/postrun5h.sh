#!/bin/bash
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_atr
cd /root/repo
set -x
# wait for the g-script (advat s3) to finish
while ! grep -q ADVAT_S3_DONE runs/postrun5g.out 2>/dev/null; do sleep 20; done
S2=$(ls -d runs/r5-fullobs-centered-s2/Track2D-BlockFullNav-v0/*/ | head -1)
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockFullNav-v0 --env-base Track2D-BlockFullNav-v0 \
  --network maze-lstm --aux none --train-mode 0 --seed 2 \
  --center-full-obs \
  --num-envs 1024 --reset-pool 256 --total-iters 12000 \
  --resume "$S2" \
  --log-dir runs/r5-fullobs-centered-s2-ext > runs/r5-fullobs-centered-s2-ext.out 2>&1
echo FULLOBS_S2_EXT_DONE
