#!/bin/bash
# Round-4 stage E (reordered: highest-value artifacts first in case the
# round ends mid-stage): A1 eval -> ICP margin sweep + final ICP evals ->
# CPE pricing -> kNN A/B -> profile -> feats pretrain warm-vs-cold ->
# ICP-only refresh -> summaries.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export STALL_SECS=600

# A1 (reg_v6) eval — stage-C eval predated the CLI fix that takes the
# LOSS config (MI discriminator param tree) from the ckpt
timeout 1200 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
    --batch-size 8 --ckpt runs/r4_v6/ckpt/best_rre \
    --results results/v6_r4_eval.json

# ICP margin sweep (trust_margin dimension) and final ICP evals
timeout 2400 python tools/sweep_icp.py runs/r3_v11_knn/ckpt/best_rre \
    --out results/icp_sweep.json
timeout 1200 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
    --batch-size 8 --ckpt runs/r3_v11_knn/ckpt/best_rre --icp point_to_plane \
    --results results/v11_r4_eval_icp.json
timeout 1200 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
    --batch-size 8 --ckpt runs/r3_v11_knn/ckpt/best_rre --icp point_to_point \
    --results results/v11_r4_eval_icp_p2p.json

# CPE pricing (throughput) + kNN A/B (fixed timing) + profile breakdown
timeout 1800 python tools/price_cpe.py > results/price_cpe.txt 2>&1
timeout 1800 python tools/ab_knn.py runs/r3_v11_knn/ckpt/best_rre \
    --experiment reg_v11 --out results/ab_knn_r4.json
timeout 1800 python tools/profile_breakdown.py > /tmp/profile_r4.log 2>&1

# two-stage feature pretrain -> warm vs cold registration (VERDICT r3 #8)
tools/feats_retry.sh runs/r4_feats_det 3 --stage detector \
    --dataset synthetic --batch-size 16 --epochs 15
tools/feats_retry.sh runs/r4_feats_desc 3 --stage descriptor \
    --dataset synthetic --batch-size 8 --epochs 15 \
    --pretrain-detector runs/r4_feats_det/ckpt/feats_detector
tools/train_retry.sh runs/r4_v11_cold 3 --experiment reg_v11 --dataset synthetic \
    --batch-size 8 --epochs 20
tools/train_retry.sh runs/r4_v11_warm 3 --experiment reg_v11 --dataset synthetic \
    --batch-size 8 --epochs 20 --pretrain-feats runs/r4_feats_desc/ckpt/feats_descriptor

# classical ICP-only rows refreshed with the annealed solver
timeout 1200 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
    --batch-size 8 --icp-only --icp point_to_point --icp-iters 100 \
    --results results/icp_only_p2p.json
timeout 1200 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
    --batch-size 8 --icp-only --icp point_to_plane --icp-iters 100 \
    --results results/icp_only_p2plane.json

python tools/summarize_run.py runs/r3_v11_knn runs/r4_v6 runs/r3_v11_curve \
    runs/r4_v11_none runs/r4_v11_cold runs/r4_v11_warm \
    > results/r4_summary.txt 2>&1 || true
echo "[chain_r4e] done"
