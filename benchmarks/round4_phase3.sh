#!/bin/sh
# Round-4 phase 3, queued behind phase 2. The 16k-step demo training is run
# as FOUR resumable 4000-step chunks (recall_demo resumes from ckpt_dir and
# saves at the end of each invocation): the original single 16k invocation
# ran at ~100 steps/min — host/tunnel-bound, not the 300+ img/s device rate —
# so it would have hit its own timeout 3600 with nothing saved. Chunking
# makes every 4000 steps durable and emits the recall trajectory
# (recall@4000/8000/12000/16000).
#   1. MFU grad-accum A/B (VERDICT #9): unrolled accum2 vs the scanned
#      27.2% result, plus a same-session plain-b32 baseline — isolates the
#      while-loop-body compilation-quality hypothesis (accum ran at exactly
#      half the plain step's TFLOP/s)
#   2. tpurpn side of the 224px head-to-head + compare   (VERDICT #5)
#   3. 4x4000-step mobilenet_v2 demo training -> .h5     (VERDICT #6)
#   4. bench.py refresh (trained-distribution row against the new .h5)
# Usage: sh benchmarks/round4_phase3.sh <wait_pid> [logfile]
WAIT_PID=$1
LOG=${2:-/tmp/round4_tpu.log}
cd "$(dirname "$0")/.." || exit 1

while [ -n "$WAIT_PID" ] && kill -0 "$WAIT_PID" 2>/dev/null; do
  sleep 30
done
echo "=== round4 PHASE3 $(date) ===" >> "$LOG"

run() {
  echo "--- $* ($(date +%H:%M:%S)) ---" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}

# pin the s2d-stem routing crossover: wins 1.111x at b8, loses 0.972x at b32
T=1800 run python benchmarks/exp_s2d_resize.py 16

T=1800 run python benchmarks/mfu.py 64 vgg16 500 2 1
T=1800 run python benchmarks/mfu.py 32 vgg16 500 1

T=3600 run python benchmarks/tf_reference_recall.py tpurpn mobilenet_v2 224 \
  800 16 3e-4 benchmarks/results/tpurpn_mobilenet_v2_224_mom099.json 0.99
T=300 run python benchmarks/tf_reference_recall.py compare \
  benchmarks/results/tf_mobilenet_v2_224_mom099.json \
  benchmarks/results/tpurpn_mobilenet_v2_224_mom099.json

for i in 1 2 3 4; do
  T=3400 run python benchmarks/recall_demo.py mobilenet_v2 4000 16 \
    /tmp/mnv2_demo_ckpt_16k 3e-4 trained/rpn_mobilenet_v2_trained.h5
done

T=1800 run python bench.py
echo "=== round4 PHASE3 done $(date) ===" >> "$LOG"
