#!/bin/bash
# Round-4c: broaden trained-config coverage — Maze-family AD-VAT, the
# Full-observation branch, and stack_frames > 1, all under the learner.
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_atr
cd /root/repo
set -x

# 1. AD-VAT trained ON the Maze family (all prior training was Block).
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-MazePartialPZR-v0 --env-base Track2D-MazePartialNav-v0 \
  --network tat-maze-lstm --train-mode -1 --init-step 1000 --num-envs 1024 \
  --pool-refresh 16 --total-iters 6000 --checkpoint-every 200 \
  --log-dir runs/r4-advat-maze --seed 1 > runs/r4-advat-maze.out 2>&1
echo MAZE_DONE

# 2. Full-observation branch under the learner (track_1v1.py:295-307
#    painted whole-maze obs; crosschecked but never trained).
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockFullNav-v0 --env-base Track2D-BlockFullNav-v0 \
  --network tat-maze-lstm --train-mode 0 --num-envs 256 \
  --total-iters 3000 --checkpoint-every 200 \
  --log-dir runs/r4-fullobs --seed 1 > runs/r4-fullobs.out 2>&1
echo FULLOBS_DONE

# 3. stack_frames 4 (environment.py:128-156 FrameStack analog) end-to-end.
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialNav-v0 --env-base Track2D-BlockPartialNav-v0 \
  --network tat-maze-lstm --stack-frames 4 --train-mode 0 --num-envs 1024 \
  --pool-refresh 16 --total-iters 3000 --checkpoint-every 200 \
  --log-dir runs/r4-stack4 --seed 1 > runs/r4-stack4.out 2>&1
echo STACK4_DONE
echo ROUND4C_DONE
