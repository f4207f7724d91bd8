#!/bin/bash
# Round-3 TPU work chain, stage A+B: accuracy on the scaled synthetic
# protocol (2048 train / 256 val pairs, poles + density variation), with
# the round-3 correctness fixes in (BN momentum semantics, full-f32 pose
# math, 3D kNN CPE).
#
#   1. reg_v11 knn CPE, 100 epochs — the flagship run.
#   2. reg_v0 conv baseline, 100 epochs — the bar the flagship must beat.
#   3. reg_v11 curve CPE, same 100-epoch OneCycle schedule but stopped at
#      40 epochs via --max-steps: its LR trajectory is IDENTICAL to run 1
#      up to the stop, so knn-vs-curve val curves compare cleanly.
#
# All runs go through train_retry.sh (tunnel-stall watchdog + resume).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

EPOCHS=${EPOCHS:-100}
BS=${BS:-8}
STEPS_PER_EPOCH=256   # 2048 / BS

tools/train_retry.sh runs/r3_v11_knn 4 --experiment reg_v11 --dataset synthetic \
    --batch-size "$BS" --epochs "$EPOCHS" --ptv3-cpe knn

tools/train_retry.sh runs/r3_v0 4 --experiment reg_v0 --dataset synthetic \
    --batch-size "$BS" --epochs "$EPOCHS"

tools/train_retry.sh runs/r3_v11_curve 2 --experiment reg_v11 --dataset synthetic \
    --batch-size "$BS" --epochs "$EPOCHS" --ptv3-cpe curve \
    --max-steps $((40 * STEPS_PER_EPOCH))

python tools/summarize_run.py runs/r3_v11_knn runs/r3_v0 runs/r3_v11_curve \
    > results/r3_stageA_summary.txt 2>&1 || true
