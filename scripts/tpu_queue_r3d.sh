#!/bin/bash
# Round-3 fourth TPU queue: re-measure after the MXU one-hot z-pick
# replaced the scalarized gather (130 -> 1.6 fps regression), then the
# protocol-scale ROI eval with operating-budget checkpoint selection.
set -u
cd /root/repo
LOG=/root/repo/tpu_runs.log
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "[queue-d] waiting for pid $WAIT_PID $(date -Is)" >> "$LOG"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
echo "[queue-d] device free $(date -Is)" >> "$LOG"

run() {  # run <timeout-sec> <name> <cmd...>
  local t=$1 name=$2; shift 2
  echo "=== [$name] start $(date -Is)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit $? $(date -Is)" >> "$LOG"
}

# 1. overlay quality spot-check (zeros/real rows must stay ~94 dB).
run 2400 bisect_mxu python scripts/diag_overlay_bisect.py
# 2. bench: fps must be back at ~130 with the diagonal at ~64 dB.
run 2400 bench bash -c 'python bench.py > /root/repo/bench_out.json'
# 3. mode-2 shared-field parity at bench scale (real numbers this time).
run 3600 nm_parity python scripts/diag_neural_parity.py
# 4. mode-2 overhead (Goals.md < 1 ms; round-3 bar <= 2 ms).
run 1800 neural_march_k2 python scripts/bench_neural_march.py \
  --pred-kstride 2 --frames 10 --batches 3
run 1800 neural_march_k1 python scripts/bench_neural_march.py \
  --pred-kstride 1 --frames 10 --batches 3
# 5. protocol-scale ROI eval (refs disk-cached from the previous run).
run 14400 roi_showcase python scripts/roi_policy_eval.py
run 10800 roi_adversarial python scripts/roi_policy_eval.py --suite adversarial
echo "[queue-d] ALL DONE $(date -Is)" >> "$LOG"
