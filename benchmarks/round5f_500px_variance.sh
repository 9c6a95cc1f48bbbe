#!/bin/sh
# Round-5 part F: variance bounds for the 1280-step native-500px point.
#
# round5e measured a sign flip at the doubled horizon: TF 0.7554 vs
# tpurpn 0.7384 (delta -0.017) after tpurpn led +0.118 at 640 steps.
# Both deltas are inside the run-to-run spread the 288 px study measured
# (TF 2-rep spread 0.023 from its unseeded Keras init alone), so the
# honest question is whether the 1280-step pairing is a draw effect or a
# real gap. This battery bounds both sides at the 1280-step horizon:
# tpurpn seeds 1 and 2 (TPU, ~7 min each) and a TF rep 2 (new unseeded
# init draw, CPU, ~2.5 h). Protocol identical to round5e otherwise.
# Usage: sh benchmarks/round5f_500px_variance.sh [logfile]
LOG=${1:-/tmp/round5f_500px_variance.log}
cd "$(dirname "$0")/.." || exit 1
echo "=== round5f 500px x1280 variance bounds $(date) ===" >> "$LOG"

run() {
  echo "--- $* ($(date +%H:%M:%S)) ---" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}

T=4200 run python benchmarks/tf_reference_recall.py tpurpn mobilenet_v2 500 1280 8 3e-4 \
  benchmarks/results/tpurpn_mobilenet_v2_500x1280_mom099_seed1.json 0.99 bfloat16 1
T=4200 run python benchmarks/tf_reference_recall.py tpurpn mobilenet_v2 500 1280 8 3e-4 \
  benchmarks/results/tpurpn_mobilenet_v2_500x1280_mom099_seed2.json 0.99 bfloat16 2
T=12600 run python benchmarks/tf_reference_recall.py tf mobilenet_v2 500 1280 8 3e-4 \
  benchmarks/results/tf_mobilenet_v2_500x1280_mom099_rep2.json 0.99

# Dirty-tree guard (VERDICT r4 weak #1/#7): new '??' result files are
# expected; only modifications to tracked benchmark-relevant files fail.
DIRTY=$(git status --porcelain -- trained benchmarks bench.py tpurpn | grep -v '^??')
if [ -n "$DIRTY" ]; then
  echo "=== round5f FAILED $(date): tree dirty after run ===" >> "$LOG"
  echo "$DIRTY" >> "$LOG"
  exit 1
fi
echo "=== round5f done $(date): tree clean ===" >> "$LOG"
