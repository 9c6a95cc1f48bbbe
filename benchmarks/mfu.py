"""MFU verification artifact for the training step (VERDICT r2 #8).

BASELINE config 3/5 claim the fused train step is compute-bound at ~49-53%
bf16 MFU. This script makes that claim runnable: it pulls the step's FLOP
count from XLA's own cost analysis of the compiled program (not a hand
model), times steps chained inside ONE jitted scan carrying the train state
(config3's methodology — the scan is the clean measurement: dispatch
chaining paid a per-iteration host key-split + tunnel enqueue inside the
timed window, systematically deflating measured TFLOP/s), and emits
measured TFLOP/s and MFU against the v5e bf16 peak.

    python benchmarks/mfu.py [batch] [backbone] [img_size] [grad_accum]

``grad_accum=n`` measures the exact-accumulation step (train.make_train_step
grad_accum) at effective batch = ``batch``, peak activation memory =
batch/n — the attack on the VGG16 batch-64 OOM boundary (VERDICT r3 #9):
``python benchmarks/mfu.py 64 vgg16 500 2`` trains at effective batch 64
where the monolithic step OOMs.
"""

import sys
import time

sys.path.insert(0, ".")

from benchmarks.common import emit, enable_compile_cache

V5E_BF16_PEAK_TFLOPS = 197.0  # TPU v5e (v5litepod) peak dense bf16


def main(batch=32, backbone="vgg16", img_size=500, grad_accum=1):
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from tpurpn import get_hyper_params
    from tpurpn.data import SyntheticVOC
    from tpurpn.train import create_train_state, make_train_step

    hp = get_hyper_params(backbone, img_size=img_size)
    state = create_train_state(hp, jax.random.key(0))
    step = make_train_step(hp, augment=True, grad_accum=grad_accum)

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

    # timing: steps chained inside ONE jitted scan carrying (state, key) —
    # pure device compute, single host sync per rep. The outer jit does NOT
    # donate, so each rep can restart from the same state (the inner step's
    # donation annotation is inlined away by jit-in-jit tracing; config3
    # uses the same pattern). min-of-3 reps per CLAUDE.md.
    iters = 10

    @jax.jit
    def many(state, imgs, boxes, labels, key):
        def body(carry, _):
            s, k = carry
            k, sk = jax.random.split(k)
            s, m = step(s, imgs, boxes, labels, sk)
            return (s, k), m["loss"]

        _, losses = jax.lax.scan(
            body, (state, key), None, length=iters
        )
        return losses[-1]

    float(many(state, imgs, boxes, labels, key))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(state, imgs, boxes, labels, key))
        best = min(best, (time.perf_counter() - t0) / iters)

    tflops = flops / best / 1e12
    suffix = f"_accum{grad_accum}" if grad_accum > 1 else ""
    emit(
        f"train_step_mfu_{backbone}_b{batch}{suffix}",
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
        int(sys.argv[4]) if len(sys.argv) > 4 else 1,
    )
