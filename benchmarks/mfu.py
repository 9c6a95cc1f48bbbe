"""MFU verification artifact for the training step (VERDICT r2 #8).

BASELINE config 3/5 claim the fused train step is compute-bound at ~49-53%
bf16 MFU. This script makes that claim runnable: it pulls the step's FLOP
count from XLA's own cost analysis of the compiled program (not a hand
model), times the step with the dispatch-chained methodology
(benchmarks/common.py — the scan-chained variant can't carry the train
state), and emits measured TFLOP/s and MFU against the v5e bf16 peak.

    python benchmarks/mfu.py [batch] [backbone] [img_size]
"""

import sys
import time

sys.path.insert(0, ".")

from benchmarks.common import emit, enable_compile_cache

V5E_BF16_PEAK_TFLOPS = 197.0  # TPU v5e (v5litepod) peak dense bf16


def main(batch=32, backbone="vgg16", img_size=500):
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from tpurpn import get_hyper_params
    from tpurpn.data import SyntheticVOC
    from tpurpn.train import create_train_state, make_train_step

    hp = get_hyper_params(backbone, img_size=img_size)
    state = create_train_state(hp, jax.random.key(0))
    step = make_train_step(hp, augment=True)

    ds = SyntheticVOC(num_samples=batch)
    imgs, boxes, labels = next(ds.batches(batch))
    imgs, boxes, labels = (
        jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(labels)
    )
    key = jax.random.key(1)

    # XLA's own FLOP count for the exact compiled program
    compiled = step.lower(state, imgs, boxes, labels, key).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost["flops"])

    # timing: chain steps through the state carry across dispatches; the
    # final scalar pull is the single host sync. The state must be carried
    # FORWARD through all reps: the step donates its input state, so
    # restarting a rep from a saved state re-submits donated buffers
    # (INVALID_ARGUMENT on this backend).
    state, m = step(state, imgs, boxes, labels, key)
    float(m["loss"])  # warm
    best = float("inf")
    iters = 20
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            key, sk = jax.random.split(key)
            state, m = step(state, imgs, boxes, labels, sk)
        float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / iters)

    tflops = flops / best / 1e12
    emit(
        f"train_step_mfu_{backbone}_b{batch}",
        100.0 * tflops / V5E_BF16_PEAK_TFLOPS,
        "percent_of_v5e_bf16_peak",
        tflop_per_step=round(flops / 1e12, 3),
        ms_per_step=round(best * 1e3, 2),
        measured_tflops=round(tflops, 1),
        img_per_s=round(batch / best, 1),
    )


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 32,
        sys.argv[2] if len(sys.argv) > 2 else "vgg16",
        int(sys.argv[3]) if len(sys.argv) > 3 else 500,
    )
