#!/bin/sh
# Round-5 part E: the native-500px head-to-head at a DOUBLED horizon.
#
# The 640-step point (round5d_500px.sh) measured tpurpn +0.118 recall@300
# and recorded the honest caveat that 640 steps at 500 px is very early
# training, where the 288 px seed study showed run-to-run variance peaks;
# BASELINE.md predicts within-1% parity re-emerges as the horizon grows
# (as it did at every smaller scale). This run tests that prediction at
# 1280 steps — the largest horizon the ~6.8 s/step TF-CPU side fits in
# the remaining round budget (~2.4 h) with margin. Identical protocol to
# round5d otherwise: 500x500, batch 8, anchor scales (128, 256, 512),
# matched bn_momentum 0.99, identical data/order/optimizer, compare tool
# asserts matched horizons. Results go to *_500x1280_* files so the
# 640-step point is preserved as its own row.
#
# Order: tpurpn (TPU, ~10 min) FIRST so its number exists even if the
# round ends mid-TF-run; then the TF reference (CPU, the long pole);
# then the compare line.
# Usage: sh benchmarks/round5e_500px_long.sh [logfile]
LOG=${1:-/tmp/round5e_500px_long.log}
cd "$(dirname "$0")/.." || exit 1
echo "=== round5e 500px x1280 head-to-head $(date) ===" >> "$LOG"

run() {
  echo "--- $* ($(date +%H:%M:%S)) ---" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}

T=4200 run python benchmarks/tf_reference_recall.py tpurpn mobilenet_v2 500 1280 8 3e-4 \
  benchmarks/results/tpurpn_mobilenet_v2_500x1280_mom099.json 0.99 bfloat16 0
T=12600 run python benchmarks/tf_reference_recall.py tf mobilenet_v2 500 1280 8 3e-4 \
  benchmarks/results/tf_mobilenet_v2_500x1280_mom099.json 0.99
T=300 run python benchmarks/tf_reference_recall.py compare \
  benchmarks/results/tf_mobilenet_v2_500x1280_mom099.json \
  benchmarks/results/tpurpn_mobilenet_v2_500x1280_mom099.json

# Dirty-tree guard (VERDICT r4 weak #1/#7): new '??' result files are
# expected; only modifications to tracked benchmark-relevant files fail.
DIRTY=$(git status --porcelain -- trained benchmarks bench.py tpurpn | grep -v '^??')
if [ -n "$DIRTY" ]; then
  echo "=== round5e FAILED $(date): tree dirty after run ===" >> "$LOG"
  echo "$DIRTY" >> "$LOG"
  exit 1
fi
echo "=== round5e done $(date): tree clean ===" >> "$LOG"
