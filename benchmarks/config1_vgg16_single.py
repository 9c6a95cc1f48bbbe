"""BASELINE config 1: VGG16 RPN single-image inference, 500x500 (CPU-runnable).

    python benchmarks/config1_vgg16_single.py [--cpu]

Full inference path (forward -> decode -> top-k -> NMS) at batch 1, reporting
latency per image. BASELINE.json:7.
"""

import sys

sys.path.insert(0, ".")

from benchmarks.common import emit, enable_compile_cache, time_dispatch_chained


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from tpurpn import get_hyper_params
    from tpurpn.anchors import generate_anchors
    from tpurpn.model import get_model, init_model
    from tpurpn.predict import decode_outputs, generate_proposals

    hp = get_hyper_params("vgg16")
    model = get_model(hp)
    variables = init_model(model, jax.random.key(0))
    anchors = generate_anchors(hp)
    images = jax.random.uniform(jax.random.key(1), (1, 500, 500, 3), jnp.float32)

    @jax.jit
    def step(variables, images, carry):
        reg, cls = model.module.apply(variables, images + carry, train=False)
        boxes, scores = decode_outputs(anchors, reg, cls, hp)
        out = generate_proposals(boxes, scores, hp, topn=hp.test_nms_topn)
        return out["roi_scores"].mean() * 1e-6

    dt = time_dispatch_chained(step, variables, images, iters=10)
    emit(
        "config1_vgg16_single_image_inference",
        dt * 1e3,
        "ms/image",
        backend=jax.default_backend(),
    )


if __name__ == "__main__":
    main()
