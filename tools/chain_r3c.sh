#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export STALL_SECS=600

tools/train_retry.sh runs/r3_v0 3 --experiment reg_v0 --dataset synthetic \
    --batch-size 8 --epochs 60

tools/chain_r3_evals.sh

tools/train_retry.sh runs/r3_v11_curve 2 --experiment reg_v11 --dataset synthetic \
    --batch-size 8 --epochs 100 --ptv3-cpe curve --max-steps 4096
python tools/summarize_run.py runs/r3_v11_knn runs/r3_v0 runs/r3_v11_curve \
    > results/r3_stageA_summary.txt 2>&1 || true
