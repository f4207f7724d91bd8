#!/bin/bash
# Round-4 stage B: flagship evals + kNN A/B + ICP sweep + kernel record.
# Usage: tools/chain_r4b.sh [pid-to-wait-for]
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -n "${1:-}" ]; then
    while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

# headline flagship eval on the held-out test split (completed schedule);
# best_rre for r3 comparability AND the end-of-schedule 'last'
timeout 1200 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
    --batch-size 8 --ckpt runs/r3_v11_knn/ckpt/best_rre \
    --results results/v11_r4_eval.json
timeout 1200 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
    --batch-size 8 --ckpt runs/r3_v11_knn/ckpt/last \
    --results results/v11_r4_eval_last.json

# ICP refinement evals (annealed threshold + trust test)
timeout 1200 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
    --batch-size 8 --ckpt runs/r3_v11_knn/ckpt/best_rre --icp point_to_plane \
    --results results/v11_r4_eval_icp.json
timeout 1200 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
    --batch-size 8 --ckpt runs/r3_v11_knn/ckpt/best_rre --icp point_to_point \
    --results results/v11_r4_eval_icp_p2p.json

# (threshold_end, iters) sweep for the ICP defaults
timeout 1800 python tools/sweep_icp.py runs/r3_v11_knn/ckpt/best_rre \
    --out results/icp_sweep.json

# kNN policy A/B with compile-excluded throughput (VERDICT r3 #5)
timeout 1800 python tools/ab_knn.py runs/r3_v11_knn/ckpt/best_rre \
    --experiment reg_v11 --out results/ab_knn_r4.json

# kernel regression record
timeout 900 python tools/check_kernels.py > results/check_kernels_tpu.txt 2>&1
echo "[chain_r4b] done"
