#!/bin/bash
# Round-4 stage C: A1 (reg_v6, MI) convergence run — the last reference
# headline never exercised at scale (VERDICT r3 #3).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export STALL_SECS=600

# ICP-refines-weak-poses demonstration: the ep-16 curve checkpoint is a
# weak network (above ICP's own noise floor), so annealed ICP should
# genuinely improve its mean — the flagship (below the floor) is instead
# protected by the trust test.  Must run BEFORE stage D trains this arm
# to strength.
timeout 1200 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
    --batch-size 8 --ckpt runs/r3_v11_curve/ckpt/best_rre --icp point_to_plane \
    --results results/curve_ep16_icp_demo.json || true

tools/train_retry.sh runs/r4_v6 6 --experiment reg_v6 --dataset synthetic \
    --batch-size 8 --epochs 100

timeout 1200 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
    --batch-size 8 --ckpt runs/r4_v6/ckpt/best_rre \
    --results results/v6_r4_eval.json
echo "[chain_r4c] done"
