#!/bin/bash
# Round-3 training suite (VERDICT round-2 gate: prove it learns).
# Runs sequentially on the single TPU chip. Reference recipes:
# /root/reference/README.md:52-72 (train), :74-83 (paper eval suite).
cd /root/repo
set -x

# 1. Tracker-only baseline vs Ram target (README.md:63-65 equivalent).
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialRam-v0 --env-base Track2D-BlockPartialRam-v0 \
  --network tat-maze-lstm --train-mode 0 --num-envs 1024 \
  --total-iters 3000 --checkpoint-every 200 \
  --log-dir runs/r3-tracker-ram --seed 1 \
  > runs/r3-tracker-ram.out 2>&1

# 2. Tracker-only baseline vs Nav target (README.md:67-69 equivalent).
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialNav-v0 --env-base Track2D-BlockPartialNav-v0 \
  --network tat-maze-lstm --train-mode 0 --num-envs 1024 \
  --total-iters 3000 --checkpoint-every 200 \
  --log-dir runs/r3-tracker-nav --seed 1 \
  > runs/r3-tracker-nav.out 2>&1

# 3. AD-VAT dueling (README.md:52 equivalent): PZR target, both learn,
#    tracker-only warmup for the first 1000 iters; eval vs Nav.
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialPZR-v0 --env-base Track2D-BlockPartialNav-v0 \
  --network tat-maze-lstm --train-mode -1 --init-step 1000 --num-envs 1024 \
  --total-iters 6000 --checkpoint-every 200 \
  --log-dir runs/r3-advat --seed 1 \
  > runs/r3-advat.out 2>&1

echo ROUND3_TRAINING_DONE
