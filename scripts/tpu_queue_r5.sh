#!/bin/bash
# Round-5 TPU measurement queue (run detached: survives builder-session
# restarts; ONE jax process at a time — the axon grant is exclusive).
#   1. adversarial ROI suite at protocol scale (VERDICT r4 #1)
#   2. mode-2 final-image PSNR cert at bench config (VERDICT r4 #6)
#   3. inverse rendering at credible scale, marcher mode (VERDICT r4 #5)
#   4. inverse rendering THROUGH the shear-warp renderer at scale
#   5. fresh bench.py for the RESULTS_r5 headline
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/root/repo/tpu_runs_r5.log
echo "[r5-queue] start $(date -Is)" >> "$LOG"

probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float(jnp.sum(x @ x)))
" >/dev/null 2>&1
}

until probe; do
  echo "[r5-queue] TPU unresponsive $(date -Is); retry in 120s" >> "$LOG"
  sleep 120
done
echo "[r5-queue] TPU ALIVE $(date -Is)" >> "$LOG"

run() {  # run <timeout-sec> <name> <cmd...>
  local t=$1 name=$2; shift 2
  echo "=== [$name] start $(date -Is)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== [$name] exit $rc $(date -Is)" >> "$LOG"
  return $rc
}

# Refuse to measure on a red suite (CPU-forced; safe next to TPU jobs).
if ! run 1200 pytest env JAX_PLATFORMS=cpu python -m pytest tests -q -x; then
  echo "[r5-queue] TEST SUITE RED — aborting" >> "$LOG"
  exit 1
fi

run 12600 roi_adversarial python scripts/roi_policy_eval.py \
    --suite adversarial --policy-in docs/roi_policy.npz
run 3600 neural_cert python scripts/neural_psnr_cert.py
run 7200 fit_views_marcher python scripts/fit_from_views.py
run 3600 fit_views_shearwarp python scripts/fit_from_views.py \
    --renderer shearwarp --shape 64,64,64 --res 256 --out-res 128 \
    --views 16 --held-views 4 --steps 400
run 2400 bench bash -c 'python bench.py > /root/repo/bench_out.json'
echo "[r5-queue] ALL DONE $(date -Is)" >> "$LOG"
