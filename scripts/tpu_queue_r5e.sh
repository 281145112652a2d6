#!/bin/bash
# Round-5 TPU queue, part E: after part D drains, interleaved re-timing of
# the adversarial verdict operating points (tunnel drift exceeds a
# 1.79x-vs-1.80x margin; scripts/roi_retime.py hardening).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/root/repo/tpu_runs_r5.log
WAIT_PID=${1:-}
echo "[r5e-queue] start $(date -Is) wait_pid=${WAIT_PID}" >> "$LOG"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
run() {
  local t=$1 name=$2; shift 2
  echo "=== [$name] start $(date -Is)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit $? $(date -Is)" >> "$LOG"
}
run 7200 roi_retime_adv python scripts/roi_retime.py --suite adversarial \
    --policy-in docs/roi_policy.npz
echo "[r5e-queue] ALL DONE $(date -Is)" >> "$LOG"
