#!/bin/sh
# Round-5 part G: extended-horizon tpurpn points at the native 500 px scale.
#
# The 640/1280-step head-to-head pairs are mid-training (BASELINE.md's
# native-scale section); the converged plateau ~0.84 was only measured via
# a different recipe (scanned trainer, batch 16). This battery runs the
# SAME protocol as the head-to-head (tf_reference_recall.py tpurpn side,
# batch 8, adam 3e-4, bn_momentum 0.99, seed 0) at 2560 and 5120 steps to
# show the 1280-step points sit on a still-climbing curve toward the
# plateau — i.e. the sub-plateau recalls are horizon effects, not gaps.
# Usage: sh benchmarks/round5g_500px_horizon.sh [logfile]
LOG=${1:-/tmp/round5g_500px_horizon.log}
cd "$(dirname "$0")/.." || exit 1
echo "=== round5g 500px horizon extension $(date) ===" >> "$LOG"

run() {
  echo "--- $* ($(date +%H:%M:%S)) ---" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}

T=4200 run python benchmarks/tf_reference_recall.py tpurpn mobilenet_v2 500 2560 8 3e-4 \
  benchmarks/results/tpurpn_mobilenet_v2_500x2560_mom099.json 0.99 bfloat16 0
T=7200 run python benchmarks/tf_reference_recall.py tpurpn mobilenet_v2 500 5120 8 3e-4 \
  benchmarks/results/tpurpn_mobilenet_v2_500x5120_mom099.json 0.99 bfloat16 0

DIRTY=$(git status --porcelain -- trained benchmarks bench.py tpurpn | grep -v '^??')
if [ -n "$DIRTY" ]; then
  echo "=== round5g FAILED $(date): tree dirty after run ===" >> "$LOG"
  echo "$DIRTY" >> "$LOG"
  exit 1
fi
echo "=== round5g done $(date): tree clean ===" >> "$LOG"
