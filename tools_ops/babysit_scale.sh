#!/bin/bash
# Babysit a TPU scale run: the tunneled pool intermittently drops
# compile requests and wedges after client crashes; this watchdog kills
# a zero-CPU-progress run and resumes it from the last stage checkpoint.
# Babysit the 4.6Mb resume: if the resume process makes no CPU progress
# for 8 minutes (hung remote compile), kill it and resume again from
# the last checkpoint. Up to 6 attempts.
set -u
for attempt in $(seq 1 6); do
    if [ -f /root/repo/SCALE_r04_46m.json ] && grep -q '"ok": true' /root/repo/SCALE_r04_46m.json 2>/dev/null; then
        echo "done before attempt $attempt"; exit 0
    fi
    PID=$(pgrep -f "python /tmp/resume46.py" | head -1)
    if [ -z "${PID:-}" ]; then
        echo "[babysit] attempt $attempt: launching resume"
        nohup python /tmp/resume46.py >> /tmp/resume46.log 2>&1 &
        PID=$!
        sleep 20
    fi
    last_cpu=""
    stall=0
    while kill -0 "$PID" 2>/dev/null; do
        cpu=$(awk '{print $14+$15}' /proc/$PID/stat 2>/dev/null)
        if [ "$cpu" == "$last_cpu" ]; then
            stall=$((stall+1))
        else
            stall=0
        fi
        last_cpu="$cpu"
        if [ "$stall" -ge 16 ]; then   # 16 x 30s = 8 min no CPU progress
            echo "[babysit] $(date +%H:%M:%S) attempt $attempt: stalled, killing $PID"
            kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
            sleep 20
            break
        fi
        sleep 30
    done
    # process exited on its own?
    if [ -f /root/repo/SCALE_r04_46m.json ] && grep -q '"ok": true' /root/repo/SCALE_r04_46m.json 2>/dev/null; then
        echo "[babysit] success after attempt $attempt"; exit 0
    fi
done
echo "[babysit] giving up"
exit 1
