#!/bin/sh
# Round-4 phase 2: measurements that depend on phase-1 results, queued behind
# the resume battery (waits on its PID to keep the single host core quiet).
#   - exp_s2d_resize 32/64: pin the batch crossover for the s2d-stem routing
#     (phase 1: stem wins 1.111x at b8, loses 0.917x at b128)
#   - exp_batch_sweep: is batch 128 actually the headline throughput peak?
# Usage: sh benchmarks/round4_phase2.sh <wait_pid> [logfile]
WAIT_PID=$1
LOG=${2:-/tmp/round4_tpu.log}
cd "$(dirname "$0")/.." || exit 1

while [ -n "$WAIT_PID" ] && kill -0 "$WAIT_PID" 2>/dev/null; do
  sleep 30
done
echo "=== round4 PHASE2 $(date) ===" >> "$LOG"

run() {
  echo "--- $* ($(date +%H:%M:%S)) ---" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}

T=1800 run python benchmarks/exp_s2d_resize.py 32
T=1800 run python benchmarks/exp_s2d_resize.py 64
T=2400 run python benchmarks/exp_batch_sweep.py 64 128 192 256
# config2 re-measure on the now-two-row script (fast serving path + flax path)
T=1800 run python benchmarks/config2_mobilenet_batch8.py
echo "=== round4 PHASE2 done $(date) ===" >> "$LOG"
