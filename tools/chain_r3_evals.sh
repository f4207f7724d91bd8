#!/bin/bash
# Round-3 evaluation-artifact chain (run after tools/chain_r3.sh).
# Usage: tools/chain_r3_evals.sh [pid-to-wait-for]
# Produces every artifact VERDICT r2 #2/#3 asks for, plus the fixed
# profile breakdown.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -n "${1:-}" ]; then
    while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

# flagship eval (+ICP variants)
python -m pcd_reg_hregnet_tpu eval --experiment reg_v11 --dataset synthetic \
    --batch-size 8 --ckpt runs/r3_v11_knn/ckpt/best_rre \
    --results results/v11_r3_eval.json
python -m pcd_reg_hregnet_tpu eval --experiment reg_v11 --dataset synthetic \
    --batch-size 8 --ckpt runs/r3_v11_knn/ckpt/best_rre --icp point_to_plane \
    --results results/v11_r3_eval_icp.json

# conv baseline eval (the bar)
python -m pcd_reg_hregnet_tpu eval --experiment reg_v0 --dataset synthetic \
    --batch-size 8 --ckpt runs/r3_v0/ckpt/best_rre \
    --results results/v0_r3_eval.json

# classical ICP-only baseline rows (README.md:185-198 equivalents)
python -m pcd_reg_hregnet_tpu eval --experiment reg_v0 --dataset synthetic \
    --batch-size 8 --icp-only --icp point_to_point --icp-iters 100 \
    --results results/icp_only_p2p.json
python -m pcd_reg_hregnet_tpu eval --experiment reg_v0 --dataset synthetic \
    --batch-size 8 --icp-only --icp point_to_plane --icp-iters 100 \
    --results results/icp_only_p2plane.json

# exact-vs-approx kNN A/B on the trained flagship
python tools/ab_knn.py runs/r3_v11_knn/ckpt/best_rre --experiment reg_v11 \
    --out results/ab_knn.json

# kernel regression record + fixed profile breakdown
python tools/check_kernels.py > results/check_kernels_tpu.txt 2>&1
python tools/profile_breakdown.py > /tmp/profile_r3b.log 2>&1

python tools/summarize_run.py runs/r3_v11_knn runs/r3_v0 runs/r3_v11_curve \
    > results/r3_stageA_summary.txt 2>&1 || true
