#!/bin/bash
# Post-training chip work, round 4: eval matrix with CIs (3 eval seeds,
# per-episode data), extended profile decomposition, bench sweep.
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_atr
cd /root/repo
set -x
R3RAM=$(ls -d runs/r3-tracker-ram/Track2D-BlockPartialRam-v0/*/ | head -1)
R3NAV=$(ls -d runs/r3-tracker-nav/Track2D-BlockPartialNav-v0/*/ | head -1)
R3ADV=$(ls -d runs/r3-advat/Track2D-BlockPartialPZR-v0/*/ | head -1)
R3ADV2=$(ls -d runs/r3-advat-s2/Track2D-BlockPartialPZR-v0/*/ | head -1)
R3NAIVE=$(ls -d runs/r3-naive/Track2D-BlockPartialAdv-v0/*/ | head -1)
R4NAV3=$(ls -d runs/r4-tracker-nav-s3/Track2D-BlockPartialNav-v0/*/ | head -1)
R4MODE2=$(ls -d runs/r4-mode2/Track2D-BlockPartialPZR-v0/*/ | head -1)
R4RPF=$(ls -d runs/r4-rpf/Track2D-BlockPartialRPF-v0/*/ | head -1)
R4K16=$(ls -d runs/r4-advat-poolK16/Track2D-BlockPartialPZR-v0/*/ | head -1)

python -m active_tracking_rl_tpu.run.eval_matrix \
  --tracker advat="$R3ADV/tracker-best.msgpack" \
  --tracker advat_s2="$R3ADV2/tracker-best.msgpack" \
  --tracker advat_k16="$R4K16/tracker-best.msgpack" \
  --tracker mode2="$R4MODE2/tracker-best.msgpack" \
  --tracker ram="$R3RAM/tracker-best.msgpack" \
  --tracker nav="$R3NAV/tracker-best.msgpack" \
  --tracker nav_s3="$R4NAV3/tracker-best.msgpack" \
  --tracker naive="$R3NAIVE/tracker-best.msgpack" \
  --tracker rpf="$R4RPF/tracker-best.msgpack" \
  --target advat="$R3ADV/target-best.msgpack" \
  --env Track2D-BlockPartialNav-v0 --env Track2D-BlockPartialRam-v0 \
  --env Track2D-MazePartialNav-v0 --env Track2D-MazePartialRam-v0 \
  --env Track2D-BlockPartialRPF-v0 \
  --eval-seeds 3 \
  --out runs/EVAL_MATRIX_R4.json > runs/eval_matrix_r4.out 2>&1
echo MATRIX_DONE

python profile_iter.py > PROFILE_ITER.json 2> runs/profile_iter_r4.err
echo PROFILE_DONE

python bench.py --sweep > PERF_SWEEP.json 2> runs/bench_sweep_r4.err
python bench.py > BENCH_CANDIDATE.json 2>> runs/bench_sweep_r4.err
echo POSTRUN4_DONE
