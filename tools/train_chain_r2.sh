#!/bin/bash
# Round-2 flagship accuracy chain (VERDICT next-step #2 + #4):
#   feats detector pretrain -> descriptor pretrain -> reg_v11 long run
#   (reference recipe: alpha 1.0, feats warm start, 200 epochs)
#   -> bf16 convergence run.
# One JAX process at a time (single tunnelled TPU chip).
set -ex
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

python -m pcd_reg_hregnet_tpu pretrain-feats --stage detector \
    --dataset synthetic --batch-size 8 --epochs 30 \
    --log-dir runs/feats_r2_det

python -m pcd_reg_hregnet_tpu pretrain-feats --stage descriptor \
    --pretrain-detector runs/feats_r2_det/ckpt/feats_detector \
    --dataset synthetic --batch-size 8 --epochs 30 \
    --log-dir runs/feats_r2_desc

python -m pcd_reg_hregnet_tpu train --experiment reg_v11 \
    --dataset synthetic --batch-size 8 --epochs 200 --lr 5e-4 \
    --pretrain-feats runs/feats_r2_desc/ckpt/feats_descriptor \
    --log-dir runs/v11_r2

python -m pcd_reg_hregnet_tpu eval --experiment reg_v11 \
    --dataset synthetic --batch-size 8 \
    --ckpt runs/v11_r2/ckpt/best_rre --results results/v11_r2_results.json

python -m pcd_reg_hregnet_tpu train --experiment reg_v11 \
    --dataset synthetic --batch-size 8 --epochs 200 --lr 5e-4 \
    --compute-dtype bfloat16 \
    --pretrain-feats runs/feats_r2_desc/ckpt/feats_descriptor \
    --log-dir runs/v11_r2_bf16

echo CHAIN_DONE
