#!/bin/bash
# Round-3 second TPU measurement queue: waits for the in-flight ROI
# showcase eval (exclusive device grant) to exit, then runs the pending
# measurements in priority order. Output tees to /root/repo/tpu_runs.log.
set -u
cd /root/repo
LOG=/root/repo/tpu_runs.log
WAIT_PID=${1:-}

if [ -n "$WAIT_PID" ]; then
  echo "[queue-b] waiting for pid $WAIT_PID $(date -Is)" >> "$LOG"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
echo "[queue-b] device free $(date -Is)" >> "$LOG"

run() {  # run <timeout-sec> <name> <cmd...>
  local t=$1 name=$2; shift 2
  echo "=== [$name] start $(date -Is)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit $? $(date -Is)" >> "$LOG"
}

# 1. bench: fast-path fps recovery + pose-sweep PSNR (drive step for the
#    entry-correction fast-path commit).
run 2400 bench bash -c 'python bench.py > /root/repo/bench_out.json'
# 2. diagonal forensic at full bench scale on TPU.
run 3600 diag_forensic python scripts/diag_diagonal.py --dump /tmp/diag_tpu
# 3. mode-2 neural-march overhead (Goals.md < 1 ms target; round-3 bar <= 2 ms).
run 1800 neural_march_k2 python scripts/bench_neural_march.py --pred-kstride 2 --frames 10 --batches 3
run 1800 neural_march_k1 python scripts/bench_neural_march.py --pred-kstride 1 --frames 10 --batches 3
echo "[queue-b] ALL DONE $(date -Is)" >> "$LOG"
