#!/bin/bash
# Round-2 TPU chain, stall-tolerant edition.
#  1. finish the f32 anneal tail (v11_r2b, epochs -> 150)
#  2. bf16 step-scaled flagship run (80 epochs, lr 5e-4)
#  3. evals (+ICP), kNN A/B, compiled-kernel regression
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# wait for the device grant to be available
for i in $(seq 1 30); do
    timeout 150 python -c "import jax, jax.numpy as jnp; jnp.zeros(1).block_until_ready()" \
        && break
    sleep 60
done

bash tools/train_retry.sh runs/v11_r2b 4 --experiment reg_v11 \
    --dataset synthetic --batch-size 8 --epochs 150

bash tools/train_retry.sh runs/v11_r2_bf16 4 --experiment reg_v11 \
    --dataset synthetic --batch-size 8 --epochs 80 --lr 5e-4 \
    --compute-dtype bfloat16

timeout 1500 python -m pcd_reg_hregnet_tpu eval --experiment reg_v11 \
    --dataset synthetic --batch-size 8 --ckpt runs/v11_r2b/ckpt/best_rre \
    --icp point_to_plane --results results/v11_r2b_eval_icp.json \
    || sleep 720

timeout 1500 python tools/ab_knn.py runs/v11_r2b/ckpt/best_rre \
    --experiment reg_v11 --out results/ab_knn.json || sleep 720

timeout 900 python tools/check_kernels.py > results/check_kernels_tpu.txt 2>&1 \
    || sleep 720

timeout 1500 python -m pcd_reg_hregnet_tpu eval --experiment reg_v11 \
    --dataset synthetic --batch-size 8 --compute-dtype bfloat16 \
    --ckpt runs/v11_r2_bf16/ckpt/best_rre \
    --results results/v11_r2_bf16_eval.json || true
echo "[chain_r2c] done"
