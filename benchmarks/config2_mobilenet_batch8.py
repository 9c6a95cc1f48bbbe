"""BASELINE config 2: MobileNetV2 RPN batched inference (batch 8), VOC-style
data, anchors + NMS end-to-end. BASELINE.json:8.

    python benchmarks/config2_mobilenet_batch8.py
"""

import sys

sys.path.insert(0, ".")

from benchmarks.common import emit, enable_compile_cache, time_dispatch_chained


def main():
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from tpurpn import get_hyper_params
    from tpurpn.anchors import generate_anchors
    from tpurpn.data import SyntheticVOC, preprocess_batch
    from tpurpn.model import get_model, init_model
    from tpurpn.predict import decode_outputs, generate_proposals

    BATCH = 8
    hp = get_hyper_params("mobilenet_v2")
    model = get_model(hp)
    variables = init_model(model, jax.random.key(0))
    anchors = generate_anchors(hp)

    ds = SyntheticVOC(num_samples=BATCH)
    raw_imgs, boxes, labels = next(ds.batches(BATCH))
    raw_imgs = jnp.asarray(raw_imgs)

    @jax.jit
    def step(variables, raw, carry):
        # on-device preprocessing included: uint8 -> resize 500x500
        imgs, _ = preprocess_batch(raw, jnp.zeros((BATCH, 1, 4)), hp.img_size)
        reg, cls = model.module.apply(variables, imgs + carry, train=False)
        b, s = decode_outputs(anchors, reg, cls, hp)
        out = generate_proposals(b, s, hp, topn=hp.test_nms_topn)
        return out["roi_scores"].mean() * 1e-6

    dt = time_dispatch_chained(step, variables, raw_imgs, iters=10)
    emit(
        "config2_mobilenet_v2_batch8_e2e",
        BATCH / dt,
        "images/sec/chip",
        baseline=5000.0,
    )


if __name__ == "__main__":
    main()
