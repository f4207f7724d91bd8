#!/bin/bash
# Round-3 TPU work chain, stage A: accuracy diagnosis on the scaled
# synthetic protocol (2048 train / 256 val pairs, poles + density
# variation — data/__init__.py, data/synthetic.py).
#
# Three short runs, same recipe, one variable each:
#   1. reg_v0  (conv baseline — the bar the flagship must beat)
#   2. reg_v11 knn CPE  (3D continuous-conv CPE, the round-3 fix)
#   3. reg_v11 curve CPE (round-2 configuration, for the ablation delta)
#
# All runs go through train_retry.sh (tunnel-stall watchdog + resume).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

EPOCHS=${EPOCHS:-40}
BS=${BS:-8}

tools/train_retry.sh runs/r3_v0 3 --experiment reg_v0 --dataset synthetic \
    --batch-size "$BS" --epochs "$EPOCHS"

tools/train_retry.sh runs/r3_v11_knn 3 --experiment reg_v11 --dataset synthetic \
    --batch-size "$BS" --epochs "$EPOCHS" --ptv3-cpe knn

tools/train_retry.sh runs/r3_v11_curve 3 --experiment reg_v11 --dataset synthetic \
    --batch-size "$BS" --epochs "$EPOCHS" --ptv3-cpe curve

python tools/summarize_run.py runs/r3_v0 runs/r3_v11_knn runs/r3_v11_curve \
    > results/r3_stageA_summary.txt 2>&1 || true
