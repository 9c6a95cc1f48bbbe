#!/bin/sh
# Resume the round-4 TPU session from the crash point (config5 was cut off
# mid-run). Remaining, in order: config5, grad-accum MFU coda, 16k-step
# converged demo checkpoint, bench refresh against it, tpurpn side of the
# 224px head-to-head, compare. Usage: sh benchmarks/round4_resume.sh [logfile]
LOG=${1:-/tmp/round4_tpu.log}
cd "$(dirname "$0")/.." || exit 1
echo "=== round4 RESUME $(date) ===" >> "$LOG"

run() {
  echo "--- $* ($(date +%H:%M:%S)) ---" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}

T=1800 run python benchmarks/config5_coco_scale_dp.py
T=1800 run python benchmarks/mfu.py 64 vgg16 500 2
T=3600 run python benchmarks/recall_demo.py mobilenet_v2 16000 16 \
  /tmp/mnv2_demo_ckpt_16k 3e-4 trained/rpn_mobilenet_v2_trained.h5
T=1800 run python bench.py
T=3600 run python benchmarks/tf_reference_recall.py tpurpn mobilenet_v2 224 \
  800 16 3e-4 benchmarks/results/tpurpn_mobilenet_v2_224_mom099.json 0.99
T=300 run python benchmarks/tf_reference_recall.py compare \
  benchmarks/results/tf_mobilenet_v2_224_mom099.json \
  benchmarks/results/tpurpn_mobilenet_v2_224_mom099.json
echo "=== round4 RESUME done $(date) ===" >> "$LOG"
