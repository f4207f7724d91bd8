#!/bin/bash
# Round-4 final orchestrator (replaces the tail of stage D + stage E
# queueing): wait for the running curve-arm training (pid $1), then
# curve eval -> stage E (high-value artifacts) -> none arm last.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export STALL_SECS=600

while kill -0 "$1" 2>/dev/null; do sleep 30; done

timeout 1200 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
    --batch-size 8 --ckpt runs/r3_v11_curve/ckpt/best_rre \
    --results results/v11_r4_curve_eval.json

tools/chain_r4e.sh

# cpe=none ablation arm last (matched schedule; resumable next round if
# the wall cuts it)
tools/train_retry.sh runs/r4_v11_none 5 --experiment reg_v11 --dataset synthetic \
    --batch-size 8 --epochs 100 --ptv3-cpe none
timeout 1200 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
    --batch-size 8 --ckpt runs/r4_v11_none/ckpt/best_rre \
    --results results/v11_r4_none_eval.json
echo "[chain_r4f] done"
