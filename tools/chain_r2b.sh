#!/bin/bash
# Round-2 TPU work chain (runs after the flagship f32 run exits).
# Usage: tools/chain_r2b.sh <pid-of-f32-run>
# Order: eval f32 best ckpt (+ICP) -> kNN A/B -> compiled-kernel check
#        -> bf16 convergence run -> eval bf16.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while kill -0 "$1" 2>/dev/null; do sleep 30; done

python -m pcd_reg_hregnet_tpu eval --experiment reg_v11 --dataset synthetic \
    --batch-size 8 --ckpt runs/v11_r2b/ckpt/best_rre \
    --results results/v11_r2b_eval.json
python -m pcd_reg_hregnet_tpu eval --experiment reg_v11 --dataset synthetic \
    --batch-size 8 --ckpt runs/v11_r2b/ckpt/best_rre --icp point_to_plane \
    --results results/v11_r2b_eval_icp.json

python tools/ab_knn.py runs/v11_r2b/ckpt/best_rre --experiment reg_v11 \
    --out results/ab_knn.json

python tools/check_kernels.py > results/check_kernels_tpu.txt 2>&1

# steps-scaled recipe: the synthetic set has 8 steps/epoch (64 pairs / B=8),
# so reference-epoch counts at lr 1e-4 underfit by ~10x in optimizer steps;
# lr 5e-4 over 80 epochs is the step-matched recipe (round-1 measurement)
python -m pcd_reg_hregnet_tpu train --experiment reg_v11 --dataset synthetic \
    --batch-size 8 --epochs 80 --lr 5e-4 --compute-dtype bfloat16 \
    --log-dir runs/v11_r2_bf16

python -m pcd_reg_hregnet_tpu eval --experiment reg_v11 --dataset synthetic \
    --batch-size 8 --compute-dtype bfloat16 \
    --ckpt runs/v11_r2_bf16/ckpt/best_rre \
    --results results/v11_r2_bf16_eval.json
