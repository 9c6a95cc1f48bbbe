#!/bin/sh
# Round-5 TPU measurements, part B (sequential, single chip):
#   1. 288px head-to-head compare (VERDICT r4 missing #3 / next #4) —
#      requires both result JSONs to exist (tf side ran on CPU, tpurpn side
#      on the chip, before this script)
#   2. blocks-4-5 fusion retry with dw_input_bf16 combined with chunked
#      expand + raised vmem limit (VERDICT r4 weak #4 / next #6), batch 8
#      and 128
#   3. roofline re-run with the 1 GB + f32 stream controls, at batch 128
#      and at 192 (the sweep-valley attribution point)
# Usage: sh benchmarks/round5b_tpu.sh [logfile]
LOG=${1:-/tmp/round5b_tpu.log}
cd "$(dirname "$0")/.." || exit 1
echo "=== round5b TPU $(date) ===" >> "$LOG"

run() {
  echo "--- $* ($(date +%H:%M:%S)) ---" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}

T=300 run python benchmarks/tf_reference_recall.py compare \
  benchmarks/results/tf_mobilenet_v2_288_mom099.json \
  benchmarks/results/tpurpn_mobilenet_v2_288_mom099.json
T=3000 run python benchmarks/exp_fused45.py 8
T=3000 run python benchmarks/exp_fused45.py 128
T=3000 run python benchmarks/exp_dw_bf16.py 128
T=3000 run python benchmarks/exp_dw_bf16.py 8
T=4800 run python benchmarks/roofline.py
T=4800 run python benchmarks/roofline.py 192

# Same guard as run_tpu_battery.sh (VERDICT r4 weak #1/#7)
DIRTY=$(git status --porcelain -- trained benchmarks bench.py tpurpn)
if [ -n "$DIRTY" ]; then
  echo "=== round5b TPU FAILED $(date): tree dirty after run ===" >> "$LOG"
  echo "$DIRTY" >> "$LOG"
  exit 1
fi
echo "=== round5b TPU done $(date): tree clean ===" >> "$LOG"
