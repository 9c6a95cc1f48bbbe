#!/bin/sh
# Post-outage TPU measurement battery: run everything that needs the real
# chip, sequentially (single host core, single chip), each step bounded and
# logged. Usage:  sh benchmarks/run_tpu_battery.sh [logfile]
# Steps that matter after the round-3 review fixes:
#   1. on-device kernel test lane (non-interpreted parity)
#   2. bench.py          — headline + uint8 e2e with the LICM-proof carry
#                          nudge (A/B vs the recorded 6170/5970)
#   3. config2           — batch-8 e2e with the nudge (vs 2115)
#   4. breakdown 8       — honest preprocess component number
#   5. exp_s2d_resize    — the s2d serving stem A/B at batch 8 and 128
#   6. config4/config5   — unchanged paths, refresh numbers
LOG=${1:-/tmp/tpu_battery.log}
cd "$(dirname "$0")/.." || exit 1
echo "=== TPU battery $(date) ===" >> "$LOG"

run() {
  echo "--- $* ($(date +%H:%M:%S)) ---" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}

T=240 run python -c "
import jax; d = jax.devices(); assert d[0].platform == 'tpu', d
import jax.numpy as jnp
assert float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()) == 512.0
print('TPU OK:', d)"
grep -q "TPU OK" "$LOG" || { echo "TPU unreachable; aborting" >> "$LOG"; exit 1; }

T=1800 run sh tests/run_tpu_tests.sh
T=1800 run python bench.py
T=1200 run python benchmarks/config2_mobilenet_batch8.py
T=1200 run python benchmarks/breakdown.py 8
T=1800 run python benchmarks/exp_s2d_resize.py 8
T=1800 run python benchmarks/exp_s2d_resize.py 128
T=1200 run python benchmarks/config4_nms_stress.py
T=1800 run python benchmarks/config5_coco_scale_dp.py
#   7. MFU coda (round 4): exact grad accumulation past the batch-64 OOM
T=1800 run python benchmarks/mfu.py 64 vgg16 500 2

# Round-5 guard (VERDICT r4 weak #1/#7): the r4 snapshot raced a background
# export that left the committed trained checkpoint desynchronized from the
# benched one. Refuse to declare the battery done with benchmark-relevant
# files dirty — a dirty tree here means some step mutated a tracked artifact.
DIRTY=$(git status --porcelain -- trained benchmarks bench.py tpurpn)
if [ -n "$DIRTY" ]; then
  echo "=== battery FAILED $(date): tree dirty after run ===" >> "$LOG"
  echo "$DIRTY" >> "$LOG"
  exit 1
fi
echo "=== battery done $(date): tree clean ===" >> "$LOG"
