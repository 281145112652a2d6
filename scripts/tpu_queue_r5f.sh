#!/bin/bash
# Round-5 TPU queue, part F: fresh-VM restart of the round-5 measurement
# plan after the 12:00Z VM death killed parts A-E mid-flight. Ordered by
# VERDICT r4 priority; the adversarial ROI eval now supports --resume
# (per-scene checkpoint reuse), so tunnel deaths cost minutes, not hours.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/root/repo/tpu_runs_r5.log
echo "[r5f-queue] start $(date -Is)" >> "$LOG"

probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float(jnp.sum(x @ x)))
" >/dev/null 2>&1
}

wait_alive() {
  until probe; do
    echo "[r5f-queue] TPU unresponsive $(date -Is); retry in 120s" >> "$LOG"
    sleep 120
  done
  echo "[r5f-queue] TPU ALIVE $(date -Is)" >> "$LOG"
}

run() {  # run <timeout-sec> <name> <cmd...>
  local t=$1 name=$2; shift 2
  echo "=== [$name] start $(date -Is)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== [$name] exit $rc $(date -Is)" >> "$LOG"
  return $rc
}

wait_alive

# 1. Adversarial ROI suite at protocol scale (VERDICT r4 #1) — retried up
# to 4x; --resume skips scenes already checkpointed in roi_results_hard.json.
for attempt in 1 2 3 4; do
  if run 10800 "roi_adversarial#$attempt" python scripts/roi_policy_eval.py \
      --suite adversarial --policy-in docs/roi_policy.npz --resume; then
    break
  fi
  wait_alive
done

# 2. Mode-2 in-march MLP final-image PSNR cert at bench config (VERDICT #6).
run 3600 neural_cert python scripts/neural_psnr_cert.py || { wait_alive; \
  run 3600 neural_cert#2 python scripts/neural_psnr_cert.py; }

# 3. Inverse rendering THROUGH the production shear-warp renderer at scale
# (VERDICT #5 stretch) — shorter than the marcher run, higher value.
run 4500 fit_views_shearwarp python scripts/fit_from_views.py \
    --renderer shearwarp --shape 64,64,64 --res 256 --out-res 128 \
    --views 16 --held-views 4 --steps 400 || { wait_alive; \
  run 4500 fit_views_shearwarp#2 python scripts/fit_from_views.py \
    --renderer shearwarp --shape 64,64,64 --res 256 --out-res 128 \
    --views 16 --held-views 4 --steps 400; }

# 4. Inverse rendering at credible scale, marcher mode (VERDICT #5).
run 7200 fit_views_marcher python scripts/fit_from_views.py

# 5. Fresh bench for the RESULTS_r5 headline (driver re-runs bench.py at
# round end regardless — this one feeds the in-repo table).
run 2400 bench bash -c 'python bench.py > /root/repo/bench_out.json'

echo "[r5f-queue] ALL DONE $(date -Is)" >> "$LOG"
