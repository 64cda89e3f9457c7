#!/bin/bash
# Round-5 follow-up chip work (after postrun5.sh):
#  1. extend the two slow-takeoff round-5 runs by exact --resume +3000
#     iters (distinguish late takeoff from failure; also re-exercises
#     preemption recovery on real runs)
#  2. overlap probe (round-4 verdict next-step 1b measurement)
#  3. flood-kernel shootout refresh after the round-5 kernel changes
#  4. eval-matrix rows for the extended trackers
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_atr
cd /root/repo
set -x

S4=$(ls -d runs/r5-tracker-nav-s4/Track2D-BlockPartialNav-v0/*/ | head -1)
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialNav-v0 --env-base Track2D-BlockPartialNav-v0 \
  --network tat-maze-lstm --train-mode 0 --seed 4 \
  --num-envs 1024 --reset-pool 256 --total-iters 6000 \
  --resume "$S4" \
  --log-dir runs/r5-tracker-nav-s4-ext > runs/r5-tracker-nav-s4-ext.out 2>&1
echo S4_EXT_DONE

K16=$(ls -d runs/r5-nav-poolK16-ptr/Track2D-BlockPartialNav-v0/*/ | head -1)
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialNav-v0 --env-base Track2D-BlockPartialNav-v0 \
  --network tat-maze-lstm --train-mode 0 --seed 1 \
  --num-envs 1024 --reset-pool 256 --pool-refresh 16 --total-iters 6000 \
  --resume "$K16" \
  --log-dir runs/r5-nav-poolK16-ptr-ext > runs/r5-nav-poolK16-ptr-ext.out 2>&1
echo K16_EXT_DONE

python runs/probe_overlap.py > runs/probe_overlap.out 2>&1
echo PROBE_DONE

python bench_flood.py > BENCH_FLOOD.json 2> runs/bench_flood_r5.err
echo FLOOD_DONE

S4E=$(ls -d runs/r5-tracker-nav-s4-ext/Track2D-BlockPartialNav-v0/*/ | head -1)
K16E=$(ls -d runs/r5-nav-poolK16-ptr-ext/Track2D-BlockPartialNav-v0/*/ | head -1)
FO=$(ls -d runs/r5-fullobs-centered/Track2D-BlockFullNav-v0/*/ | head -1)
python -m active_tracking_rl_tpu.run.eval_matrix \
  --tracker nav_s4_ext="$S4E/tracker-best.msgpack" \
  --tracker nav_k16ptr_ext="$K16E/tracker-best.msgpack" \
  --env Track2D-BlockPartialNav-v0 --env Track2D-BlockPartialRam-v0 \
  --env Track2D-MazePartialNav-v0 --env Track2D-MazePartialRam-v0 \
  --env Track2D-BlockPartialRPF-v0 \
  --eval-seeds 3 \
  --out runs/EVAL_MATRIX_R5B.json > runs/eval_matrix_r5b.out 2>&1
echo MATRIX_B_DONE
echo POSTRUN5B_DONE
