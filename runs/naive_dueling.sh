#!/bin/bash
# BASELINE.json config 4: naive dueling (reference README.md:71 —
# Track2D-BlockPartialAdv-v0, maze-lstm, entropy-target 0.01, aux none,
# train-mode -1 default), eval vs Nav.
cd /root/repo
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialAdv-v0 --env-base Track2D-BlockPartialNav-v0 \
  --network maze-lstm --aux none --entropy-target 0.01 --train-mode -1 \
  --num-envs 1024 --total-iters 4000 --checkpoint-every 200 \
  --log-dir runs/r3-naive --seed 1 > runs/r3-naive.out 2>&1
echo NAIVE_DONE

# learning-parity check for the amortized pool at the bench default K=16
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialNav-v0 --env-base Track2D-BlockPartialNav-v0 \
  --network tat-maze-lstm --train-mode 0 --num-envs 1024 --pool-refresh 16 \
  --total-iters 3000 --checkpoint-every 200 \
  --log-dir runs/r3-nav-poolK16 --seed 1 > runs/r3-nav-poolK16.out 2>&1
echo POOLK16_DONE
