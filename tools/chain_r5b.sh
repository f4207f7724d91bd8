#!/bin/bash
# Round-5 follow-on chain (runs after chain_r5a exits; shares its absolute
# deadline so the chip is free when the driver runs bench.py).
#
#   1. cpe=curve arm through a COMPLETE 60-epoch OneCycle schedule + test
#      eval (VERDICT r4 #5).  60 epochs is what the remaining wall fits; a
#      finished 60-ep schedule beats a truncated 100-ep one (the accuracy
#      of this model concentrates in the LR-anneal tail).  The knn
#      flagship arm is a 100-ep schedule - the schedule-length mismatch is
#      documented in the README CPE verdict (ADVICE r4 #2 discipline).
#   2./3. never-trained presets reg_v10 (V5 attention) / reg_v7
#      (regression head) 20ep + eval (VERDICT r4 SS2.3), if time remains.
#   4. clean-chip bench re-record (the first r5 record's bf16/bs1 arms
#      were contaminated by a stray round-4 trainer).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export STALL_SECS=600
DEADLINE=${DEADLINE:-1787357280}

have_time() { [ $(( $(date +%s) + $1 )) -lt "$DEADLINE" ]; }

commit_stage() {
    local msg="$1"; shift
    git add -f "$@" 2>/dev/null
    git commit -m "$msg" || true
}

save_ckpt() {  # split-commit <100MB parts (GitHub file limit, ADVICE r4)
    local run="$1" sub="$2" out
    out="ckpts/$(basename "$run")_${sub//\//_}.tar.gz"
    mkdir -p ckpts
    [ -d "$run/ckpt/$sub" ] || return 0
    tar czf "$out" -C "$run/ckpt" "$sub"
    if [ "$(stat -c %s "$out")" -lt 99000000 ]; then
        git add -f "$out" && git commit -m "ckpt tarball: $(basename "$run")/$sub" || true
    else
        split -b 95M -d "$out" "$out.part."
        rm -f "$out"
        git add -f "$out".part.* && git commit -m "ckpt tarball (split): $(basename "$run")/$sub" || true
    fi
}

run_eval() {
    local ckpt="$1" json="$2"; shift 2
    timeout 1800 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
        --batch-size 8 --ckpt "$ckpt" --results "$json" "$@"
}

# ---- 0. finish the feats protocol chain where chain_r5a's deadline cut
#         it (VERDICT r4 #4: desc >=50ep then warm-vs-cold arms) ----
if [ ! -f runs/r5_v0_cold/metrics.csv ] && have_time 1100; then
    tools/train_retry.sh runs/r5_v0_cold 2 --experiment reg_v0 --dataset synthetic \
        --batch-size 8 --epochs 20
    commit_stage "warm-vs-cold: cold-start reg_v0 20ep arm" runs/r5_v0_cold/metrics.csv
fi
if [ ! -d runs/r5_feats_desc/ckpt/feats_descriptor ] \
        && [ -d runs/r5_feats_det/ckpt/feats_detector ] && have_time 2000; then
    tools/feats_retry.sh runs/r5_feats_desc 3 --stage descriptor \
        --dataset synthetic --batch-size 8 --epochs 50 \
        --pretrain-detector runs/r5_feats_det/ckpt/feats_detector
    commit_stage "feats pretrain: descriptor 50ep (frozen detector)" \
        runs/r5_feats_desc/metrics.csv
    save_ckpt runs/r5_feats_desc feats_descriptor
fi
if [ ! -f runs/r5_v0_warm/metrics.csv ] && [ -d runs/r5_feats_desc/ckpt/feats_descriptor ] \
        && have_time 1100; then
    tools/train_retry.sh runs/r5_v0_warm 2 --experiment reg_v0 --dataset synthetic \
        --batch-size 8 --epochs 20 \
        --pretrain-feats runs/r5_feats_desc/ckpt/feats_descriptor
    commit_stage "warm-vs-cold: feats-warm-started reg_v0 20ep arm" \
        runs/r5_v0_warm/metrics.csv
fi

# ---- 1. CPE verdict: cpe=curve through a complete OneCycle schedule ----
# 60 epochs when the wall allows, else a complete 40-epoch schedule
# (documented: a finished short schedule beats a truncated long one)
CURVE_EPOCHS=
if have_time 2100; then CURVE_EPOCHS=60; elif have_time 1500; then CURVE_EPOCHS=40; fi
if [ -n "$CURVE_EPOCHS" ]; then
    tools/train_retry.sh runs/r5_v11_curve 2 --experiment reg_v11 --dataset synthetic \
        --batch-size 8 --epochs "$CURVE_EPOCHS" --ptv3-cpe curve
    commit_stage "CPE verdict: complete ${CURVE_EPOCHS}-epoch cpe=curve schedule (VERDICT r4 #5)" \
        runs/r5_v11_curve/metrics.csv runs/r5_v11_curve/config.json
    save_ckpt runs/r5_v11_curve best_rre
    run_eval runs/r5_v11_curve/ckpt/best_rre results/v11_r5_curve_eval.json || true
    commit_stage "CPE verdict: curve-arm test eval" results/v11_r5_curve_eval.json
fi

# ---- 1b. reg_v9 pickup if chain_r5a's deadline dropped it (VERDICT #7)
if [ ! -f runs/r5_v9/metrics.csv ] && have_time 1100; then
    tools/train_retry.sh runs/r5_v9 2 --experiment reg_v9 --dataset synthetic \
        --batch-size 8 --epochs 20
    commit_stage "reg_v9 (overlap-circle) 20ep hardware run (VERDICT r4 #7)" \
        runs/r5_v9/metrics.csv runs/r5_v9/config.json
    run_eval runs/r5_v9/ckpt/best_rre results/v9_r5_eval.json || true
    commit_stage "reg_v9 test eval" results/v9_r5_eval.json
fi

# ---- 2./3. never-trained presets ----
if have_time 1300; then
    tools/train_retry.sh runs/r5_v10 2 --experiment reg_v10 --dataset synthetic \
        --batch-size 8 --epochs 20
    commit_stage "reg_v10 (V5 attention model) 20ep hardware run" \
        runs/r5_v10/metrics.csv runs/r5_v10/config.json
    run_eval runs/r5_v10/ckpt/best_rre results/v10_r5_eval.json || true
    commit_stage "reg_v10 test eval" results/v10_r5_eval.json
fi
if have_time 1300; then
    tools/train_retry.sh runs/r5_v7 2 --experiment reg_v7 --dataset synthetic \
        --batch-size 8 --epochs 20
    commit_stage "reg_v7 (regression head, Tf+Ch+MI) 20ep hardware run" \
        runs/r5_v7/metrics.csv runs/r5_v7/config.json
    run_eval runs/r5_v7/ckpt/best_rre results/v7_r5_eval.json || true
    commit_stage "reg_v7 test eval" results/v7_r5_eval.json
fi

# ---- 4. clean-chip bench re-record ----
if have_time 700; then
    timeout 1500 python bench.py > results/bench_r5_insession.json \
        2> results/bench_r5_insession.err || true
    commit_stage "clean-chip in-session bench record (median-of-3, spread)" \
        results/bench_r5_insession.json
fi

echo "[chain_r5b] done"
