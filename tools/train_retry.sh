#!/bin/bash
# Stall-tolerant training runner for the flaky single-chip tunnel.
#
#   tools/train_retry.sh <log_dir> <max_attempts> [train args...]
#
# Launches `python -m pcd_reg_hregnet_tpu train --log-dir <log_dir>
# --resume auto <args>`; a watchdog SIGKILLs the process when the run's
# metrics.csv stops advancing (tunnel stalls present as a hung process
# with zero CPU), waits out the device-grant cooldown, and relaunches.
# `--resume auto` + step-derived start epoch make the relaunch continue
# exactly where the newest checkpoint left off.
set -u
LOGDIR=$1; ATTEMPTS=$2; shift 2
CSV="$LOGDIR/metrics.csv"
STALL_SECS=${STALL_SECS:-360}       # no csv row for 6 min = stalled
COMPILE_GRACE=${COMPILE_GRACE:-1500}  # allow 25 min to first row
COOLDOWN=${COOLDOWN:-720}           # grant release after SIGKILL

for attempt in $(seq 1 "$ATTEMPTS"); do
    echo "[train_retry] attempt $attempt: $*"
    python -m pcd_reg_hregnet_tpu train --log-dir "$LOGDIR" --resume auto "$@" &
    PID=$!
    START=$(date +%s)
    STALLED=0
    while kill -0 "$PID" 2>/dev/null; do
        sleep 30
        NOW=$(date +%s)
        # a csv row counts as progress only if written by THIS process
        # (a pre-existing csv from the previous segment is stale)
        if [ -f "$CSV" ] && [ "$(stat -c %Y "$CSV")" -gt "$START" ]; then
            AGE=$((NOW - $(stat -c %Y "$CSV")))
            LIMIT=$STALL_SECS
        else
            AGE=$((NOW - START))
            LIMIT=$COMPILE_GRACE
        fi
        if [ "$AGE" -gt "$LIMIT" ]; then
            echo "[train_retry] stall: no progress for ${AGE}s; killing $PID"
            kill -9 "$PID" 2>/dev/null
            STALLED=1
            break
        fi
    done
    wait "$PID" 2>/dev/null; RC=$?
    if [ "$STALLED" -eq 0 ] && [ "$RC" -eq 0 ]; then
        echo "[train_retry] complete (attempt $attempt)"
        exit 0
    fi
    echo "[train_retry] rc=$RC stalled=$STALLED; cooling down ${COOLDOWN}s"
    sleep "$COOLDOWN"
done
echo "[train_retry] FAILED after $ATTEMPTS attempts"
exit 1
