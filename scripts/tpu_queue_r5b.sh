#!/bin/bash
# Round-5 TPU queue, part B: waits for the in-flight neural-cert process
# to release the exclusive grant (NO probing while it runs — a second
# claimant wedges the tunnel), then runs the remaining measurements with
# the adversarial ROI suite FIRST (VERDICT r4 #1 priority).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/root/repo/tpu_runs_r5.log
WAIT_PID=${1:-}
echo "[r5b-queue] start $(date -Is) wait_pid=${WAIT_PID}" >> "$LOG"

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  echo "[r5b-queue] pid $WAIT_PID exited $(date -Is)" >> "$LOG"
fi

probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float(jnp.sum(x @ x)))
" >/dev/null 2>&1
}

until probe; do
  echo "[r5b-queue] TPU unresponsive $(date -Is); retry in 120s" >> "$LOG"
  sleep 120
done
echo "[r5b-queue] TPU ALIVE $(date -Is)" >> "$LOG"

run() {  # run <timeout-sec> <name> <cmd...>
  local t=$1 name=$2; shift 2
  echo "=== [$name] start $(date -Is)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== [$name] exit $rc $(date -Is)" >> "$LOG"
  return $rc
}

run 12600 roi_adversarial python scripts/roi_policy_eval.py \
    --suite adversarial --policy-in docs/roi_policy.npz
run 7200 fit_views_marcher python scripts/fit_from_views.py
run 3600 fit_views_shearwarp python scripts/fit_from_views.py \
    --renderer shearwarp --shape 64,64,64 --res 256 --out-res 128 \
    --views 16 --held-views 4 --steps 400
run 2400 bench bash -c 'python bench.py > /root/repo/bench_out.json'
echo "[r5b-queue] ALL DONE $(date -Is)" >> "$LOG"
