#!/bin/bash
# Stall-tolerant runner for the feats-pretrain stages (no resume support in
# fit_feats — short schedules, so a stalled attempt restarts from scratch).
#   tools/feats_retry.sh <log_dir> <max_attempts> [pretrain-feats args...]
set -u
LOGDIR=$1; ATTEMPTS=$2; shift 2
CSV="$LOGDIR/metrics.csv"
STALL_SECS=${STALL_SECS:-600}
COMPILE_GRACE=${COMPILE_GRACE:-1500}
COOLDOWN=${COOLDOWN:-720}

for attempt in $(seq 1 "$ATTEMPTS"); do
    echo "[feats_retry] attempt $attempt: $*"
    python -m pcd_reg_hregnet_tpu pretrain-feats --log-dir "$LOGDIR" "$@" &
    PID=$!
    START=$(date +%s)
    STALLED=0
    while kill -0 "$PID" 2>/dev/null; do
        sleep 30
        NOW=$(date +%s)
        if [ -f "$CSV" ] && [ "$(stat -c %Y "$CSV")" -gt "$START" ]; then
            AGE=$((NOW - $(stat -c %Y "$CSV")))
            LIMIT=$STALL_SECS
        else
            AGE=$((NOW - START))
            LIMIT=$COMPILE_GRACE
        fi
        if [ "$AGE" -gt "$LIMIT" ]; then
            echo "[feats_retry] stall: no progress for ${AGE}s; killing $PID"
            kill -9 "$PID" 2>/dev/null
            STALLED=1
            break
        fi
    done
    wait "$PID" 2>/dev/null; RC=$?
    if [ "$STALLED" -eq 0 ] && [ "$RC" -eq 0 ]; then
        echo "[feats_retry] complete (attempt $attempt)"
        exit 0
    fi
    echo "[feats_retry] rc=$RC stalled=$STALLED; cooling down ${COOLDOWN}s"
    sleep "$COOLDOWN"
done
echo "[feats_retry] FAILED after $ATTEMPTS attempts"
exit 1
