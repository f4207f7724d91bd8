#!/bin/bash
# Round-5 follow-on chain: exercise the remaining never-trained presets
# (VERDICT r4 §2.3: "reg_v9/v10/regression-head variants never trained
# beyond smoke" — reg_v9 is in chain_r5a; this adds reg_v10 (V5
# attention model) and reg_v7 (regression head + Tf+Ch+MI)), then
# re-records the in-session bench on the now-idle chip (the first r5
# record's bf16/bs1 arms were contaminated by a stray round-4 trainer).
#
# Launched by a watcher after chain_r5a exits; shares its absolute
# deadline so the chip is free when the driver runs bench.py.
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

run_eval() {
    local ckpt="$1" json="$2"; shift 2
    timeout 1800 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
        --batch-size 8 --ckpt "$ckpt" --results "$json" "$@"
}

if have_time 1500; then
    tools/train_retry.sh runs/r5_v10 3 --experiment reg_v10 --dataset synthetic \
        --batch-size 8 --epochs 20
    commit_stage "reg_v10 (V5 attention model) 20ep hardware run" \
        runs/r5_v10/metrics.csv runs/r5_v10/config.json
    run_eval runs/r5_v10/ckpt/best_rre results/v10_r5_eval.json || true
    commit_stage "reg_v10 test eval" results/v10_r5_eval.json
fi

if have_time 1500; then
    tools/train_retry.sh runs/r5_v7 3 --experiment reg_v7 --dataset synthetic \
        --batch-size 8 --epochs 20
    commit_stage "reg_v7 (regression head, Tf+Ch+MI) 20ep hardware run" \
        runs/r5_v7/metrics.csv runs/r5_v7/config.json
    run_eval runs/r5_v7/ckpt/best_rre results/v7_r5_eval.json || true
    commit_stage "reg_v7 test eval" results/v7_r5_eval.json
fi

# clean-chip bench re-record (median-of-3 + spread; expect unstable=false)
if have_time 900; then
    timeout 1500 python bench.py > results/bench_r5_insession.json \
        2> results/bench_r5_insession.err || true
    commit_stage "clean-chip in-session bench record (median-of-3, spread)" \
        results/bench_r5_insession.json
fi

echo "[chain_r5b] done"
