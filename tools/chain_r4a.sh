#!/bin/bash
# Round-4 stage A: finish the flagship schedule (VERDICT #1).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export STALL_SECS=600

tools/train_retry.sh runs/r3_v11_knn 6 --experiment reg_v11 --dataset synthetic \
    --batch-size 8 --epochs 100 --ptv3-cpe knn
