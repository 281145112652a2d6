#!/bin/bash
# Round-5 queue, part I (supersedes r5h's tail): after the trained-field
# cert, re-run the marcher fit with the scene-box support mask (held-out
# PSNR collapsed to 8.5 dB without it), then bench, then the at-scale
# shear-warp fit and overlay G row as time allows.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/root/repo/tpu_runs_r5.log
WAIT_PID=${1:-}
echo "[r5i-queue] start $(date -Is) wait_pid=${WAIT_PID}" >> "$LOG"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
run() {
  local t=$1 name=$2; shift 2
  echo "=== [$name] start $(date -Is)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit $? $(date -Is)" >> "$LOG"
}
run 1500 fit_views_marcher_masked python scripts/fit_from_views.py
run 2400 bench bash -c 'python bench.py > /root/repo/bench_out.json'
run 2400 fit_views_shearwarp python scripts/fit_from_views.py \
    --renderer shearwarp --shape 64,64,64 --res 256 --out-res 128 \
    --views 16 --held-views 4 --steps 400
run 900 overlay_g python scripts/diag_overlay_cost.py
echo "[r5i-queue] ALL DONE $(date -Is)" >> "$LOG"
