#!/bin/bash
# Round-5 queue, part J (supersedes r5i's tail): the trained-field cert
# showed the shipped stride-4 mode-2 point is LATERAL-stride-limited
# (33 dB) while kstride is nearly free — so certify the stride-2 operating
# point next (candidate for a >=40 dB certified mode-2 config), then bench,
# then the at-scale shear-warp fit + overlay G row as time allows.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/root/repo/tpu_runs_r5.log
WAIT_PID=${1:-}
echo "[r5j-queue] start $(date -Is) wait_pid=${WAIT_PID}" >> "$LOG"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
run() {
  local t=$1 name=$2; shift 2
  echo "=== [$name] start $(date -Is)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit $? $(date -Is)" >> "$LOG"
}
run 1800 neural_cert_s2 python scripts/neural_psnr_cert.py \
    --train-steps 600 --pred-stride 2 --kstrides 2
run 2400 bench bash -c 'python bench.py > /root/repo/bench_out.json'
run 2400 fit_views_shearwarp python scripts/fit_from_views.py \
    --renderer shearwarp --shape 64,64,64 --res 256 --out-res 128 \
    --views 16 --held-views 4 --steps 400
run 900 overlay_g python scripts/diag_overlay_cost.py
echo "[r5j-queue] ALL DONE $(date -Is)" >> "$LOG"
