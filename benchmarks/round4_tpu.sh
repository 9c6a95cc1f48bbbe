#!/bin/sh
# Round-4 TPU session: everything queued behind the tunnel outage, in
# dependency order. Usage:  sh benchmarks/round4_tpu.sh [logfile]
#
#   1. run_tpu_battery.sh     — VERDICT r4 #1 (tpu tests, bench, config2,
#                               breakdown 8, s2d A/B 8+128, config4/5,
#                               grad-accum MFU)
#   2. recall_demo 16k steps  — VERDICT #6: converged demo checkpoint,
#                               overwrites trained/rpn_mobilenet_v2_trained.h5
#   3. bench.py re-run        — refreshes the trained-distribution row against
#                               the new checkpoint
#   4. tpurpn side of the 224px head-to-head on the chip (shipped defaults),
#                               replacing the CPU-f32 fallback if it ran
#
# After it finishes: read the log, decide the s2d routing (flip
# s2d_stem_supported to opt-in if the stem lost in context), and update
# BASELINE.md with every measured number.
#
# IMPORTANT (single host core): SIGSTOP any CPU-bound background jobs
# (pytest, TF/CPU training) before launching — timing scripts assume a
# quiet host — and SIGCONT them after.
LOG=${1:-/tmp/round4_tpu.log}
cd "$(dirname "$0")/.." || exit 1
echo "=== round4 TPU session $(date) ===" >> "$LOG"

sh benchmarks/run_tpu_battery.sh "$LOG"

run() {
  echo "--- $* ($(date +%H:%M:%S)) ---" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}

T=3600 run python benchmarks/recall_demo.py mobilenet_v2 16000 16 \
  /tmp/mnv2_demo_ckpt_16k 3e-4 trained/rpn_mobilenet_v2_trained.h5
T=1800 run python bench.py
T=3600 run python benchmarks/tf_reference_recall.py tpurpn mobilenet_v2 224 \
  800 16 3e-4 benchmarks/results/tpurpn_mobilenet_v2_224_mom099.json 0.99
T=300 run python benchmarks/tf_reference_recall.py compare \
  benchmarks/results/tf_mobilenet_v2_224_mom099.json \
  benchmarks/results/tpurpn_mobilenet_v2_224_mom099.json
echo "=== round4 TPU session done $(date) ===" >> "$LOG"
