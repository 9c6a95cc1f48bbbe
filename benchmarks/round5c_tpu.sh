#!/bin/sh
# Round-5 TPU measurements, part C (restart of the part-B tail that was
# killed mid-run, plus the 288px seed-spread runs):
#   1. dw-carry-dtype A/B in the fused IR stage (exp_dw_bf16), batch 128 + 8
#   2. roofline with the 1 GB + f32 stream controls, batch 128 and 192
#   3. tpurpn 288px head-to-head repeats at seeds 1 and 2 (bounds the
#      run-to-run recall spread behind the +0.040 delta; the TF-side
#      unseeded repeat runs separately on CPU)
# Usage: sh benchmarks/round5c_tpu.sh [logfile]
LOG=${1:-/tmp/round5c_tpu.log}
cd "$(dirname "$0")/.." || exit 1
echo "=== round5c TPU $(date) ===" >> "$LOG"

run() {
  echo "--- $* ($(date +%H:%M:%S)) ---" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}

T=4800 run python benchmarks/exp_dw_bf16.py 128
T=4800 run python benchmarks/exp_dw_bf16.py 8
T=4800 run python benchmarks/roofline.py
T=4800 run python benchmarks/roofline.py 192
T=3000 run python benchmarks/tf_reference_recall.py tpurpn mobilenet_v2 288 800 16 3e-4 \
  benchmarks/results/tpurpn_mobilenet_v2_288_mom099_seed1.json 0.99 bfloat16 1
T=3000 run python benchmarks/tf_reference_recall.py tpurpn mobilenet_v2 288 800 16 3e-4 \
  benchmarks/results/tpurpn_mobilenet_v2_288_mom099_seed2.json 0.99 bfloat16 2

# Same guard as run_tpu_battery.sh (VERDICT r4 weak #1/#7); the two
# tf_reference_recall outputs above are NEW untracked result files, which
# `git status --porcelain` reports as '??' — those are expected; only
# MODIFICATIONS to tracked benchmark-relevant files fail the run.
DIRTY=$(git status --porcelain -- trained benchmarks bench.py tpurpn | grep -v '^??')
if [ -n "$DIRTY" ]; then
  echo "=== round5c TPU FAILED $(date): tree dirty after run ===" >> "$LOG"
  echo "$DIRTY" >> "$LOG"
  exit 1
fi
echo "=== round5c TPU done $(date): tree clean ===" >> "$LOG"
