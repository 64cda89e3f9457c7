#!/bin/bash
# Round-4 training suite (VERDICT r3 items 3, 4, 5).
# Runs sequentially on the single TPU chip.
cd /root/repo
set -x

# 1. Train-mode 2 (alternating curriculum) — VERDICT Missing #3.
#    Reference spec'd-but-broken (test.py:90 reads undefined args.adv_step);
#    implemented properly in rl/curriculum.py. PZR dueling, eval vs Nav.
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialPZR-v0 --env-base Track2D-BlockPartialNav-v0 \
  --network tat-maze-lstm --train-mode 2 --init-step 1000 --adv-step 500 \
  --num-envs 1024 --total-iters 6000 --checkpoint-every 200 \
  --log-dir runs/r4-mode2 --seed 1 > runs/r4-mode2.out 2>&1
echo MODE2_DONE

# 2. RPF tracker-only run — VERDICT Missing #4 (generators.py:12-19,47-50).
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialRPF-v0 --env-base Track2D-BlockPartialRPF-v0 \
  --network tat-maze-lstm --train-mode 0 --num-envs 1024 \
  --total-iters 3000 --checkpoint-every 200 \
  --log-dir runs/r4-rpf --seed 1 > runs/r4-rpf.out 2>&1
echo RPF_DONE

# 3. Far-mode dueling smoke — VERDICT Missing #4 (track_1v1.py:147-152
#    w_p=-0.5 reward branch under a learner).
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialFar-v0 --env-base Track2D-BlockPartialNav-v0 \
  --network tat-maze-lstm --train-mode -1 --init-step 1000 \
  --num-envs 1024 --total-iters 3000 --checkpoint-every 200 \
  --log-dir runs/r4-far --seed 1 > runs/r4-far.out 2>&1
echo FAR_DONE

# 4. Second Nav-only baseline seed — VERDICT Missing #5 / item 3 (error bars).
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialNav-v0 --env-base Track2D-BlockPartialNav-v0 \
  --network tat-maze-lstm --train-mode 0 --num-envs 1024 \
  --total-iters 3000 --checkpoint-every 200 \
  --log-dir runs/r4-tracker-nav-s3 --seed 3 > runs/r4-tracker-nav-s3.out 2>&1
echo NAVS3_DONE

# 5. K=16 amortized-pool parity, second seed — VERDICT item 5 / Weak #2.
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialNav-v0 --env-base Track2D-BlockPartialNav-v0 \
  --network tat-maze-lstm --train-mode 0 --num-envs 1024 --pool-refresh 16 \
  --total-iters 3000 --checkpoint-every 200 \
  --log-dir runs/r4-nav-poolK16-s2 --seed 2 > runs/r4-nav-poolK16-s2.out 2>&1
echo POOLK16S2_DONE

# 6. Full AD-VAT 6000-iter config at K=16 — VERDICT item 5 parity extension.
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialPZR-v0 --env-base Track2D-BlockPartialNav-v0 \
  --network tat-maze-lstm --train-mode -1 --init-step 1000 --num-envs 1024 \
  --pool-refresh 16 --total-iters 6000 --checkpoint-every 200 \
  --log-dir runs/r4-advat-poolK16 --seed 1 > runs/r4-advat-poolK16.out 2>&1
echo ADVAT_POOLK16_DONE

echo ROUND4_TRAINING_DONE
