#!/bin/bash
# Round-3 third TPU measurement queue: after the diagonal seg-overlay fix
# (fused-gather prep) — verify surfaces, full-scale parity, bench, mode-2
# overhead, ROI overhead diagnostic. Output tees to /root/repo/tpu_runs.log.
set -u
cd /root/repo
LOG=/root/repo/tpu_runs.log
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

run() {  # run <timeout-sec> <name> <cmd...>
  local t=$1 name=$2; shift 2
  echo "=== [$name] start $(date -Is)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit $? $(date -Is)" >> "$LOG"
}

# 0. verify surface 1: training CLI on synthetic data.
run 900 verify_train bash -c '
python - <<PY
from mri_raytracer_tpu.data.synthetic import write_synthetic_dataset
write_synthetic_dataset("/tmp/vdata", num_cases=4, shape=(48,48,40), seed=3)
PY
python scripts/train_inr.py --data-root /tmp/vdata --case-limit 4 \
  --num-folds 4 --steps 60 --hidden 32,32 --global-batch 4096 \
  --micro-batch 2048 --pool-size 3 --out /tmp/vrun --run-name demo'
# 0b. verify surface 2: renderer CLI with the INR baked in.
run 900 verify_render python scripts/render_brats.py \
  --case-dir /tmp/vdata/BraTS-SYN-00000-000 --width 512 --height 512 \
  --frames 3 --inr-checkpoint /tmp/vrun/demo.npz --out /tmp/vframes
# 1. mode-2 fused-vs-scan parity at full scale (field-stream hazard check).
run 3600 nm_parity python scripts/diag_neural_parity.py
# 2. bench (BENCH_r03 preview: diagonal pose should now be ~64 dB).
run 2400 bench bash -c 'python bench.py > /root/repo/bench_out.json'
# 3. mode-2 neural-march overhead (Goals.md < 1 ms target; round-3 bar <= 2 ms).
run 1800 neural_march_k2 python scripts/bench_neural_march.py \
  --pred-kstride 2 --frames 10 --batches 3
run 1800 neural_march_k1 python scripts/bench_neural_march.py \
  --pred-kstride 1 --frames 10 --batches 3
# 4. ROI 1080p overhead decomposition (bonsai + tumor-a).
run 1800 roi_diag_bonsai python scripts/diag_roi_1080.py --scene bonsai
run 1800 roi_diag_tumor python scripts/diag_roi_1080.py --scene tumor-a
echo "[queue-c] ALL DONE $(date -Is)" >> "$LOG"
