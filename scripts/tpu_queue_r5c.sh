#!/bin/bash
# Round-5 TPU queue, part C: after part B drains — mode-2 final-image
# PSNR cert (preempted by the grant-wedge recovery) + the overlay-ladder
# G row (seg+pred) for RESULTS_r5.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/root/repo/tpu_runs_r5.log
WAIT_PID=${1:-}
echo "[r5c-queue] start $(date -Is) wait_pid=${WAIT_PID}" >> "$LOG"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
run() {
  local t=$1 name=$2; shift 2
  echo "=== [$name] start $(date -Is)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit $? $(date -Is)" >> "$LOG"
}
run 3600 neural_cert python scripts/neural_psnr_cert.py
run 2400 overlay_cost python scripts/diag_overlay_cost.py
echo "[r5c-queue] ALL DONE $(date -Is)" >> "$LOG"
