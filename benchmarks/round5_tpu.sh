#!/bin/sh
# Round-5 TPU measurements, sequential (single chip):
#   1. batch-192 dip attribution (VERDICT r4 weak #5): component breakdown
#      at 192 + a fine sweep around it
#   2. inference-side HBM roofline (VERDICT r4 weak #3): attainable stream
#      bandwidth + per-stage GB/s / TFLOP/s attribution of the headline fwd
#   3. config 5 refresh incl. the new mesh-scanned device-resident trainer
# Usage: sh benchmarks/round5_tpu.sh [logfile]
LOG=${1:-/tmp/round5_tpu.log}
cd "$(dirname "$0")/.." || exit 1
echo "=== round5 TPU $(date) ===" >> "$LOG"

run() {
  echo "--- $* ($(date +%H:%M:%S)) ---" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}

T=1800 run python benchmarks/breakdown.py 192
T=2400 run python benchmarks/exp_batch_sweep.py 160 176 192 208 224
T=4800 run python benchmarks/roofline.py
T=4800 run python benchmarks/roofline.py 192
T=2400 run python benchmarks/config5_coco_scale_dp.py

# Same guard as run_tpu_battery.sh (VERDICT r4 weak #1/#7): refuse to
# declare success if any step mutated a tracked benchmark-relevant file.
DIRTY=$(git status --porcelain -- trained benchmarks bench.py tpurpn)
if [ -n "$DIRTY" ]; then
  echo "=== round5 TPU FAILED $(date): tree dirty after run ===" >> "$LOG"
  echo "$DIRTY" >> "$LOG"
  exit 1
fi
echo "=== round5 TPU done $(date): tree clean ===" >> "$LOG"
