#!/bin/bash
# Round-3 stage B (time-boxed): waits for the flagship python run (pid $1),
# then conv baseline (60 ep, self-contained OneCycle), curve-CPE ablation
# (identical 100-ep schedule, stopped at 16 epochs), then all eval
# artifacts (tools/chain_r3_evals.sh without the wait).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export STALL_SECS=600

while kill -0 "$1" 2>/dev/null; do sleep 30; done

tools/train_retry.sh runs/r3_v0 3 --experiment reg_v0 --dataset synthetic \
    --batch-size 8 --epochs 60

tools/train_retry.sh runs/r3_v11_curve 2 --experiment reg_v11 --dataset synthetic \
    --batch-size 8 --epochs 100 --ptv3-cpe curve --max-steps $((16 * 256))

tools/chain_r3_evals.sh
