#!/bin/bash
# Paper evaluation suite (reference README.md:74-83 + gym_eval.py protocol):
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_atr
# each trained tracker x the four 2D paper envs, 100 greedy episodes,
# success = eps_len >= 500. Writes one CSV per (tracker, env).
cd /root/repo
set -x
RAM=$(ls -d runs/r3-tracker-ram/Track2D-BlockPartialRam-v0/*/ | head -1)
NAV=$(ls -d runs/r3-tracker-nav/Track2D-BlockPartialNav-v0/*/ | head -1)
ADV=$(ls -d runs/r3-advat/Track2D-BlockPartialPZR-v0/*/ | head -1)
mkdir -p runs/eval_suite
for pair in "advat:$ADV" "ram:$RAM" "nav:$NAV"; do
  name="${pair%%:*}"; dir="${pair#*:}"
  for env in Track2D-BlockPartialNav-v0 Track2D-BlockPartialRam-v0 \
             Track2D-MazePartialNav-v0 Track2D-MazePartialRam-v0; do
    python -m active_tracking_rl_tpu.run.eval \
      --env $env --network tat-maze-lstm \
      --load-tracker "$dir/tracker-best.msgpack" \
      --csv runs/eval_suite/${name}__${env}.csv \
      --log-dir runs/eval_suite >> runs/eval_suite/${name}.out 2>&1
  done
done
# tracker-aware target effectiveness (reference README.md:85-88): the
# AD-VAT tracker vs its own learned adversarial target.
python -m active_tracking_rl_tpu.run.eval \
  --env Track2D-BlockPartialAdv-v0 --network tat-maze-lstm \
  --load-tracker "$ADV/tracker-best.msgpack" \
  --load-target "$ADV/target-best.msgpack" \
  --csv runs/eval_suite/advat__vs_learned_target.csv \
  --log-dir runs/eval_suite >> runs/eval_suite/advat.out 2>&1
echo EVAL_SUITE_DONE
