"""BASELINE config 3: VGG16 RPN training step — IoU matching + smooth-L1/BCE.

    python benchmarks/config3_vgg16_train_step.py

One fused jitted step (on-device preprocess + target assignment + fwd/bwd +
SGD) at batch 8, VOC-style synthetic data. BASELINE.json:9.
"""

import sys

sys.path.insert(0, ".")

from benchmarks.common import emit, enable_compile_cache

import time


def main():
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from tpurpn import get_hyper_params
    from tpurpn.data import SyntheticVOC
    from tpurpn.model import get_model
    from tpurpn.train import create_train_state, make_train_step

    BATCH = 8
    hp = get_hyper_params("vgg16")
    model = get_model(hp)
    state = create_train_state(hp, jax.random.key(0), model=model)
    step = make_train_step(hp, model=model, augment=True)

    ds = SyntheticVOC(num_samples=BATCH)
    imgs, boxes, labels = next(ds.batches(BATCH))
    imgs, boxes, labels = jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(labels)
    key = jax.random.key(1)

    # warm + compile; steps chain naturally through the state
    state, m = step(state, imgs, boxes, labels, key)
    float(m["loss"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, imgs, boxes, labels, key)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    emit("config3_vgg16_train_step_batch8", BATCH / dt, "images/sec/chip")


if __name__ == "__main__":
    main()
