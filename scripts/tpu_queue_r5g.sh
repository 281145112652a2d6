#!/bin/bash
# Round-5 queue, part G: reprioritized remainder after the adversarial ROI
# SUCCESS. Waits for the in-flight neural_cert (pid $1), then runs the
# marcher-mode inverse-rendering fit (VERDICT #5 core), the headline bench
# (also warms /tmp/jax_cache for the driver's end-of-round bench.py run),
# the at-scale shear-warp fit, and the overlay G row — in that order so the
# highest-priority artifacts land before the round-end cutoff.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/root/repo/tpu_runs_r5.log
WAIT_PID=${1:-}
echo "[r5g-queue] start $(date -Is) wait_pid=${WAIT_PID}" >> "$LOG"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
run() {
  local t=$1 name=$2; shift 2
  echo "=== [$name] start $(date -Is)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit $? $(date -Is)" >> "$LOG"
}
run 2700 fit_views_marcher python scripts/fit_from_views.py
run 2400 bench bash -c 'python bench.py > /root/repo/bench_out.json'
run 2700 fit_views_shearwarp python scripts/fit_from_views.py \
    --renderer shearwarp --shape 64,64,64 --res 256 --out-res 128 \
    --views 16 --held-views 4 --steps 400
run 900 overlay_g python scripts/diag_overlay_cost.py
echo "[r5g-queue] ALL DONE $(date -Is)" >> "$LOG"
