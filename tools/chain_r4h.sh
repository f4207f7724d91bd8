#!/bin/bash
# Round-4 follow-on (runs after chain_r4g): ICP trust-test demonstration
# on a CONVERGED network.  The committed flagship+ICP artifact
# (results/v11_r4_eval_icp.json, written 08:25) predates the 2x-margin
# trust fix (ce10af0, 08:32) and its checkpoint was lost to a container
# restart — this re-demonstrates "ICP leaves converged poses untouched"
# on the freshly trained r4_v6_50 checkpoint instead.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

timeout 1200 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
    --batch-size 8 --ckpt runs/r4_v6_50/ckpt/best_rre --icp point_to_plane \
    --results results/v6_r4_eval_icp.json || true
git add -f results/v6_r4_eval_icp.json 2>/dev/null
git commit -m "ICP trust-test artifact on a converged net (post-2x-margin solver)" || true

python tools/summarize_run.py runs/r3_v11_knn runs/r4_v6 runs/r4_v6_50 \
    runs/r3_v11_curve runs/r4_v11_none runs/r4_v11_cold runs/r4_v11_warm \
    > results/r4_summary.txt 2>&1 || true
git add -f results/r4_summary.txt 2>/dev/null
git commit -m "round-4 run summary table" || true
echo "[chain_r4h] done"
