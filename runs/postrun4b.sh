#!/bin/bash
# Final round-4 chip work after the 150k-iteration full-budget run:
# env-engine FPS re-measure, final bench/sweep refresh, eval of the
# full-budget tracker.
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_atr
cd /root/repo
set -x

python -m active_tracking_rl_tpu.run.random_agent --num-envs 8192 --seconds 5 \
  > runs/random_agent_fps.out 2>&1
echo FPS_DONE

FULL=$(ls -d runs/r4-advat-full/Track2D-BlockPartialPZR-v0/*/ | head -1)
python -m active_tracking_rl_tpu.run.eval_matrix \
  --tracker advat_full="$FULL/tracker-best.msgpack" \
  --target advat_full="$FULL/target-best.msgpack" \
  --env Track2D-BlockPartialNav-v0 --env Track2D-BlockPartialRam-v0 \
  --env Track2D-MazePartialNav-v0 --env Track2D-MazePartialRam-v0 \
  --env Track2D-BlockPartialRPF-v0 \
  --eval-seeds 3 \
  --out runs/EVAL_FULLBUDGET.json > runs/eval_fullbudget.out 2>&1
echo FULLEVAL_DONE

python bench.py > BENCH_CANDIDATE.json 2> runs/bench_final.err
echo POSTRUN4B_DONE
