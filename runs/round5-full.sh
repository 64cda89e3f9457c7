#!/bin/bash
# Round-5 full-budget rerun: the reference's ENTIRE 150,000-iteration
# training budget (3.07B env steps) under the round-5 kernels — seed 2 so
# it doubles as an independent full-budget AD-VAT seed (r4-advat-full was
# seed 1), K=16 under the carried-pointer pool semantics.
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_atr
cd /root/repo
set -x
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialPZR-v0 --env-base Track2D-BlockPartialNav-v0 \
  --network tat-maze-lstm --train-mode -1 --init-step 1000 --num-envs 1024 \
  --pool-refresh 16 --total-iters 150000 --checkpoint-every 2000 \
  --log-dir runs/r5-advat-full --seed 2 > runs/r5-advat-full.out 2>&1
echo ADVAT_FULL_R5_DONE
FULL=$(ls -d runs/r5-advat-full/Track2D-BlockPartialPZR-v0/*/ | head -1)
python -m active_tracking_rl_tpu.run.eval_matrix \
  --tracker advat_full_r5="$FULL/tracker-best.msgpack" \
  --target advat_full_r5="$FULL/target-best.msgpack" \
  --env Track2D-BlockPartialNav-v0 --env Track2D-BlockPartialRam-v0 \
  --env Track2D-MazePartialNav-v0 --env Track2D-MazePartialRam-v0 \
  --env Track2D-BlockPartialRPF-v0 \
  --eval-seeds 3 \
  --out runs/EVAL_FULLBUDGET_R5.json > runs/eval_fullbudget_r5.out 2>&1
echo FULLEVAL_R5_DONE
