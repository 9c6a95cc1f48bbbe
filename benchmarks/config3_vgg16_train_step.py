"""BASELINE config 3: VGG16 RPN training step — IoU matching + smooth-L1/BCE.

    python benchmarks/config3_vgg16_train_step.py [batch]

One fused jitted step (on-device preprocess + target assignment + fwd/bwd +
SGD), VOC-style synthetic data; batch 8 default (BASELINE.json:9 fixes no
batch — larger batches amortize better, see BASELINE.md).
"""

import sys

sys.path.insert(0, ".")

from benchmarks.common import emit, enable_compile_cache

import time


def main(batch=8):
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from tpurpn import get_hyper_params
    from tpurpn.data import SyntheticVOC
    from tpurpn.model import get_model
    from tpurpn.train import create_train_state, make_train_step

    BATCH = int(batch)
    hp = get_hyper_params("vgg16")
    model = get_model(hp)
    state = create_train_state(hp, jax.random.key(0), model=model)
    step = make_train_step(hp, model=model, augment=True)

    ds = SyntheticVOC(num_samples=BATCH)
    imgs, boxes, labels = next(ds.batches(BATCH))
    imgs, boxes, labels = jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(labels)

    # K steps chained inside ONE jitted scan carrying the train state: device
    # throughput, not the ~25 ms/dispatch axon-tunnel artifact (a real
    # training loop runs steps back-to-back; benchmarks/common.py docstring)
    iters = 10

    @jax.jit
    def many(state, imgs, boxes, labels):
        def body(carry, i):
            s, key = carry
            key, sk = jax.random.split(key)
            s, m = step(s, imgs, boxes, labels, sk)  # jit-in-jit traces inline
            return (s, key), m["loss"]

        (state, _), losses = jax.lax.scan(
            body, (state, jax.random.key(1)), jnp.arange(iters)
        )
        return losses[-1]

    float(many(state, imgs, boxes, labels))  # compile + warm
    dt = float("inf")  # min-of-3: ~5% run-to-run tunnel spread (CLAUDE.md)
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(state, imgs, boxes, labels))
        dt = min(dt, (time.perf_counter() - t0) / iters)
    emit(f"config3_vgg16_train_step_batch{BATCH}", BATCH / dt, "images/sec/chip",
         ms_per_step=round(dt * 1e3, 2))


if __name__ == "__main__":
    main(*sys.argv[1:])
