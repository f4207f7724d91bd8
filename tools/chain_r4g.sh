#!/bin/bash
# Round-4 recovery chain (session restart wiped all checkpoints; the
# committed artifacts from stages A-C survive).  Regenerates the missing
# VERDICT-r3 artifacts in value order, committing results AND checkpoint
# tarballs after every stage so another restart cannot erase them again.
#
#   1. price_cpe          -> results/price_cpe.json        (VERDICT #4b)
#   2. cpe=none arm 16ep  -> runs/r4_v11_none/metrics.csv  (VERDICT #4a,
#      matched to the curve arm's surviving 16 epochs; knn arm's full CSV
#      also survives -> 3-way matched-step table from CSVs)
#   3. feats pretrain -> warm vs cold 20ep arms             (VERDICT #8)
#   4. reg_v6 COMPLETE 50-epoch schedule + eval JSON        (VERDICT #3,
#      re-proves the MI eval path that failed pre-570ef3f)
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export STALL_SECS=600

commit_stage() {  # commit_stage <msg> <path...>
    local msg="$1"; shift
    git add -f "$@" 2>/dev/null
    git commit -m "$msg" || true
}

save_ckpt() {  # save_ckpt <run_dir> <ckpt_subdir>  -> commits a tarball
    local run="$1" sub="$2" out
    out="ckpts/$(basename "$run")_${sub//\//_}.tar.gz"
    mkdir -p ckpts
    if [ -d "$run/ckpt/$sub" ]; then
        tar czf "$out" -C "$run/ckpt" "$sub"
        if [ "$(stat -c %s "$out")" -lt 157286400 ]; then
            git add -f "$out" && git commit -m "ckpt tarball: $(basename "$run")/$sub (survives container restarts)" || true
        else
            echo "[chain] $out too large to commit"; rm -f "$out"
        fi
    fi
}

# ---- 1. CPE pricing (throughput, compile-excluded) ----
timeout 1800 python tools/price_cpe.py > results/price_cpe.txt 2>&1 || true
commit_stage "CPE pricing: knn/curve/none throughput at production shapes" \
    results/price_cpe.txt results/price_cpe.json

# ---- 2. cpe=none ablation arm, matched to curve arm's 16 epochs ----
tools/train_retry.sh runs/r4_v11_none 3 --experiment reg_v11 --dataset synthetic \
    --batch-size 8 --epochs 16 --ptv3-cpe none
commit_stage "CPE ablation: cpe=none arm at matched 16-epoch budget" \
    runs/r4_v11_none/metrics.csv runs/r4_v11_none/config.json
save_ckpt runs/r4_v11_none best_rre

# ---- 3. two-stage feature pretrain -> warm vs cold registration ----
tools/feats_retry.sh runs/r4_feats_det 3 --stage detector \
    --dataset synthetic --batch-size 16 --epochs 15
tools/feats_retry.sh runs/r4_feats_desc 3 --stage descriptor \
    --dataset synthetic --batch-size 8 --epochs 15 \
    --pretrain-detector runs/r4_feats_det/ckpt/feats_detector
commit_stage "feats pretrain: detector + descriptor stages (r4)" \
    runs/r4_feats_det/metrics.csv runs/r4_feats_desc/metrics.csv
tools/train_retry.sh runs/r4_v11_cold 3 --experiment reg_v11 --dataset synthetic \
    --batch-size 8 --epochs 20
commit_stage "warm-vs-cold: cold-start v11 20ep arm" runs/r4_v11_cold/metrics.csv
tools/train_retry.sh runs/r4_v11_warm 3 --experiment reg_v11 --dataset synthetic \
    --batch-size 8 --epochs 20 --pretrain-feats runs/r4_feats_desc/ckpt/feats_descriptor
commit_stage "warm-vs-cold: feats-warm-started v11 20ep arm" runs/r4_v11_warm/metrics.csv
save_ckpt runs/r4_v11_warm best_rre

# ---- 4. A1 (reg_v6, MI) complete 50-epoch schedule + eval ----
tools/train_retry.sh runs/r4_v6_50 4 --experiment reg_v6 --dataset synthetic \
    --batch-size 8 --epochs 50
commit_stage "A1 (MI) complete 50-epoch OneCycle schedule (r4_v6_50)" \
    runs/r4_v6_50/metrics.csv runs/r4_v6_50/config.json
save_ckpt runs/r4_v6_50 best_rre
timeout 1200 python -m pcd_reg_hregnet_tpu eval --dataset synthetic \
    --batch-size 8 --ckpt runs/r4_v6_50/ckpt/best_rre \
    --results results/v6_r4_eval.json || true
commit_stage "A1 (MI) test-split eval JSON (MI eval path fixed in 570ef3f)" \
    results/v6_r4_eval.json
echo "[chain_r4g] done"
