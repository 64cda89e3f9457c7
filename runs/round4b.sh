#!/bin/bash
# Round-4b chip work: RPF warm-start transfer + the FULL reference training
# budget (main.py:49 max_step=150000 iterations) at round-4 speed.
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_atr
cd /root/repo
set -x

# 1. RPF with a warm start from the Nav-trained tracker (--load-model-dir,
#    main.py:81-85 analog). From-scratch RPF plateaued at S 0.00 (RESULTS
#    §1.6); transfer tests whether the patrol target is trackable at all.
NAV=$(ls -d runs/r3-tracker-nav/Track2D-BlockPartialNav-v0/*/ | head -1)
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialRPF-v0 --env-base Track2D-BlockPartialRPF-v0 \
  --network tat-maze-lstm --train-mode 0 --num-envs 1024 \
  --load-model-dir "$NAV/all-best.msgpack" \
  --total-iters 4000 --checkpoint-every 200 \
  --log-dir runs/r4-rpf-warm --seed 1 > runs/r4-rpf-warm.out 2>&1
echo RPF_WARM_DONE

# 2. Full reference budget: 150,000 iterations of AD-VAT (PZR, K=16).
#    At round-4 speed this is ~100 min on one chip vs the reference's
#    150k x 20 steps x 16 workers on a 16-core CPU.
python -m active_tracking_rl_tpu.run.train \
  --env Track2D-BlockPartialPZR-v0 --env-base Track2D-BlockPartialNav-v0 \
  --network tat-maze-lstm --train-mode -1 --init-step 1000 --num-envs 1024 \
  --pool-refresh 16 --total-iters 150000 --checkpoint-every 2000 \
  --log-dir runs/r4-advat-full --seed 1 > runs/r4-advat-full.out 2>&1
echo ADVAT_FULL_DONE
echo ROUND4B_DONE
