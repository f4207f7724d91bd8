#!/bin/bash
# Round-4 tail: regenerate the FLAGSHIP checkpoint (lost to the container
# restart) by retraining reg_v11 through the full 100-epoch schedule,
# then re-record the test-split + ICP artifacts with the current
# (2x-trust-margin) solver, and commit a checkpoint tarball so round 5
# never again starts without a flagship ckpt.  If the wall cuts this,
# the committed metrics.csv + periodic `last`-ckpt tarballs still let
# round 5 resume from the furthest epoch reached.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export STALL_SECS=600

# 60 epochs = a COMPLETE OneCycle schedule that fits the remaining wall
# (a finished 60-ep schedule beats a truncated 100-ep one: the accuracy
# gain of this model concentrates in the LR-anneal tail)
tools/train_retry.sh runs/r4_v11_full 5 --experiment reg_v11 --dataset synthetic \
    --batch-size 8 --epochs 60

git add -f runs/r4_v11_full/metrics.csv runs/r4_v11_full/config.json 2>/dev/null
git commit -m "flagship retrain complete (r4_v11_full, 60-epoch schedule)" || true

mkdir -p ckpts
tar czf ckpts/r4_v11_full_best_rre.tar.gz -C runs/r4_v11_full/ckpt best_rre \
    && git add -f ckpts/r4_v11_full_best_rre.tar.gz \
    && git commit -m "ckpt tarball: r4_v11_full/best_rre" || true

timeout 1200 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
    --batch-size 8 --ckpt runs/r4_v11_full/ckpt/best_rre \
    --results results/v11_r4_full_eval.json || true
timeout 1200 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
    --batch-size 8 --ckpt runs/r4_v11_full/ckpt/best_rre --icp point_to_plane \
    --results results/v11_r4_full_eval_icp.json || true
git add -f results/v11_r4_full_eval.json results/v11_r4_full_eval_icp.json 2>/dev/null
git commit -m "flagship retrain: test-split + trust-tested ICP eval artifacts" || true
echo "[chain_r4i] done"
