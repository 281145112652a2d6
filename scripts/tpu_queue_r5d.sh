#!/bin/bash
# Round-5 TPU queue, part D (FINAL, consolidated): adversarial ROI at
# protocol scale first, then the mode-2 image-PSNR cert, inverse-rendering
# runs, the overlay-G row, and a fresh bench. One job at a time — the axon
# grant is exclusive, and a device-blocked host shows ~zero CPU and ~50-min
# log silences per ROI scene: that is NORMAL, do not kill on silence.
# Progress observables: docs/roi_results_hard.json is checkpointed after
# every scene; each [name] start/exit pair logs here.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/root/repo/tpu_runs_r5.log
echo "[r5d-queue] start $(date -Is)" >> "$LOG"

probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float(jnp.sum(x @ x)))
" >/dev/null 2>&1
}
until probe; do
  echo "[r5d-queue] TPU unresponsive $(date -Is); retry in 120s" >> "$LOG"
  sleep 120
done
echo "[r5d-queue] TPU ALIVE $(date -Is)" >> "$LOG"

run() {  # run <timeout-sec> <name> <cmd...>
  local t=$1 name=$2; shift 2
  echo "=== [$name] start $(date -Is)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== [$name] exit $rc $(date -Is)" >> "$LOG"
  return $rc
}

run 16200 roi_adversarial python scripts/roi_policy_eval.py \
    --suite adversarial --policy-in docs/roi_policy.npz
run 3600 neural_cert python scripts/neural_psnr_cert.py
run 5400 fit_views_marcher python scripts/fit_from_views.py
run 2700 fit_views_shearwarp python scripts/fit_from_views.py \
    --renderer shearwarp --shape 64,64,64 --res 256 --out-res 128 \
    --views 16 --held-views 4 --steps 400
run 1800 overlay_cost python scripts/diag_overlay_cost.py
run 2400 bench bash -c 'python bench.py > /root/repo/bench_out.json'
echo "[r5d-queue] ALL DONE $(date -Is)" >> "$LOG"
