#!/bin/bash
# Round-5 chip work:
#  1. fourth Nav-only training seed (round-4 verdict weak #4 seed-level claim)
#  2. Nav tracker at --pool-refresh 16 under the NEW carried-pointer pool
#     semantics (learning parity evidence for the round-5 pointer fix)
#  3. bounded Full-obs attempt with the egocentric-centering training aid
#     (round-4 verdict missing #3)
#  4. eval-matrix rows for the new trackers (3 eval seeds x 100 episodes)
#  5. PROFILE_ITER + post-remat xprof + bench refresh
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_atr
cd /root/repo
set -x

python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialNav-v0 --env-base Track2D-BlockPartialNav-v0 \
  --network tat-maze-lstm --train-mode 0 --seed 4 \
  --num-envs 1024 --reset-pool 256 --total-iters 3000 \
  --log-dir runs/r5-tracker-nav-s4 > runs/r5-tracker-nav-s4.out 2>&1
echo NAV_S4_DONE

python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialNav-v0 --env-base Track2D-BlockPartialNav-v0 \
  --network tat-maze-lstm --train-mode 0 --seed 1 \
  --num-envs 1024 --reset-pool 256 --pool-refresh 16 --total-iters 3000 \
  --log-dir runs/r5-nav-poolK16-ptr > runs/r5-nav-poolK16-ptr.out 2>&1
echo K16_PTR_DONE

python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockFullNav-v0 --env-base Track2D-BlockFullNav-v0 \
  --network maze-lstm --aux none --train-mode 0 --seed 1 \
  --center-full-obs \
  --num-envs 1024 --reset-pool 256 --total-iters 6000 \
  --log-dir runs/r5-fullobs-centered > runs/r5-fullobs-centered.out 2>&1
echo FULLOBS_DONE

S4=$(ls -d runs/r5-tracker-nav-s4/Track2D-BlockPartialNav-v0/*/ | head -1)
K16=$(ls -d runs/r5-nav-poolK16-ptr/Track2D-BlockPartialNav-v0/*/ | head -1)
python -m active_tracking_rl_tpu.run.eval_matrix \
  --tracker nav_s4="$S4/tracker-best.msgpack" \
  --tracker nav_k16ptr="$K16/tracker-best.msgpack" \
  --env Track2D-BlockPartialNav-v0 --env Track2D-BlockPartialRam-v0 \
  --env Track2D-MazePartialNav-v0 --env Track2D-MazePartialRam-v0 \
  --env Track2D-BlockPartialRPF-v0 \
  --eval-seeds 3 \
  --out runs/EVAL_MATRIX_R5.json > runs/eval_matrix_r5.out 2>&1
echo MATRIX_DONE

python profile_iter.py > PROFILE_ITER.json 2> runs/profile_iter_r5.err
echo PROFILE_DONE

python -m active_tracking_rl_tpu.run.xprof_summary --capture \
  > XPROF_SUMMARY_R5.json 2> runs/xprof_r5.err
echo XPROF_DONE

python bench.py > BENCH_CANDIDATE.json 2> runs/bench_r5.err
echo POSTRUN5_DONE
