#!/bin/bash
# Watchdog + measurement pipeline for the flaky axon TPU link.
#
# Probes the TPU with a tiny jitted matmul; once compute responds, runs the
# round-3 pending measurements in sequence (each with its own timeout so one
# hang doesn't block the rest):
#   1. bench.py                      -> /root/repo/bench_out.json
#   2. bench_neural_march (kstride)  -> logged
#   3. roi_policy_eval showcase      -> docs/ROI_RESULTS.md
#   4. roi_policy_eval adversarial   -> docs/ROI_RESULTS_hard.md
# All output tees to /root/repo/tpu_runs.log (untracked).
set -u
cd /root/repo
LOG=/root/repo/tpu_runs.log
echo "[watchdog] start $(date -Is)" >> "$LOG"

probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float(jnp.sum(x @ x)))
" >/dev/null 2>&1
}

until probe; do
  echo "[watchdog] TPU unresponsive $(date -Is); retry in 120s" >> "$LOG"
  sleep 120
done
echo "[watchdog] TPU ALIVE $(date -Is)" >> "$LOG"

run() {  # run <timeout-sec> <name> <cmd...>
  local t=$1 name=$2; shift 2
  echo "=== [$name] start $(date -Is)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== [$name] exit $rc $(date -Is)" >> "$LOG"
  return $rc
}

# Refuse to bench on a red test suite (runs on CPU; ~3 min): a snapshot
# whose own tests fail must not ship measurements (round-4 lesson).
if ! run 1200 pytest env JAX_PLATFORMS=cpu python -m pytest tests -q; then
  echo "[watchdog] TEST SUITE RED — aborting measurements" >> "$LOG"
  exit 1
fi

# A pose-check failure means the production pipeline is corrupted (the
# 40.7 dB kernel-coexistence class) — abort instead of recording a full
# set of corrupted measurements.
if ! run 1800 pose_check python scripts/tpu_pose_check.py; then
  echo "[watchdog] POSE CHECK FAILED — aborting measurements" >> "$LOG"
  exit 1
fi
run 2400 bench bash -c 'python bench.py > /root/repo/bench_out.json'
run 1800 neural_march_k2 python scripts/bench_neural_march.py --pred-kstride 2 --frames 10 --batches 3
run 1800 neural_march_k1 python scripts/bench_neural_march.py --pred-kstride 1 --frames 10 --batches 3
run 14400 roi_showcase python scripts/roi_policy_eval.py --suite showcase
run 10800 roi_adversarial python scripts/roi_policy_eval.py --suite adversarial --policy-in docs/roi_policy.npz
echo "[watchdog] ALL DONE $(date -Is)" >> "$LOG"
