#!/bin/bash
# Round-4 stage D: CPE ablation arms at matched steps (VERDICT r3 #4a).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export STALL_SECS=600

# finish the curve arm to the full flagship schedule
tools/train_retry.sh runs/r3_v11_curve 5 --experiment reg_v11 --dataset synthetic \
    --batch-size 8 --epochs 100 --ptv3-cpe curve

# cpe=none arm, same schedule
tools/train_retry.sh runs/r4_v11_none 5 --experiment reg_v11 --dataset synthetic \
    --batch-size 8 --epochs 100 --ptv3-cpe none

timeout 1200 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
    --batch-size 8 --ckpt runs/r3_v11_curve/ckpt/best_rre \
    --results results/v11_r4_curve_eval.json
timeout 1200 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
    --batch-size 8 --ckpt runs/r4_v11_none/ckpt/best_rre \
    --results results/v11_r4_none_eval.json
echo "[chain_r4d] done"
