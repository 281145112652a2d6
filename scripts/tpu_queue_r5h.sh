#!/bin/bash
# Round-5 queue, part H (supersedes r5g before it started): the random-init
# cert is an adversarial stress case, so the TRAINED-field certification is
# promoted to right after the marcher fit; bench and the at-scale shear-warp
# fit follow as time allows before the round-end cutoff.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/root/repo/tpu_runs_r5.log
WAIT_PID=${1:-}
echo "[r5h-queue] start $(date -Is) wait_pid=${WAIT_PID}" >> "$LOG"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
run() {
  local t=$1 name=$2; shift 2
  echo "=== [$name] start $(date -Is)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit $? $(date -Is)" >> "$LOG"
}
run 2400 fit_views_marcher python scripts/fit_from_views.py
run 1800 neural_cert_trained python scripts/neural_psnr_cert.py --train-steps 600
run 2400 bench bash -c 'python bench.py > /root/repo/bench_out.json'
run 2400 fit_views_shearwarp python scripts/fit_from_views.py \
    --renderer shearwarp --shape 64,64,64 --res 256 --out-res 128 \
    --views 16 --held-views 4 --steps 400
run 900 overlay_g python scripts/diag_overlay_cost.py
echo "[r5h-queue] ALL DONE $(date -Is)" >> "$LOG"
