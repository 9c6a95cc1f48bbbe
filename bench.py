"""Headline benchmark: RPN end-to-end inference throughput (images/sec/chip).

BASELINE config 2 (BASELINE.json:8): MobileNetV2 batched inference,
anchors + decode + top-k + NMS end-to-end at 500x500. The north-star target is
>= 5000 images/sec/chip on v5e (BASELINE.json:5); the reference publishes no
numbers (BASELINE.json:13), so vs_baseline is measured against that target.

Timing methodology: the axon TPU tunnel adds ~25 ms per dispatch and its
block_until_ready does not reliably block, so K steps are chained *inside one
jitted program* via lax.scan (data-dependent carry prevents CSE) and the
result is pulled to the host once. This measures device compute, the honest
per-chip number for a pipelined serving deployment.

Prints exactly ONE JSON line.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# Persistent compile cache: remote TPU compiles of while-loop-heavy programs
# are slow (~minutes cold); cached reruns are instant.
os.makedirs(os.path.expanduser("~/.cache/jax_compilation"), exist_ok=True)
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_compilation")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 128
K = 20  # chained steps per timing call
TARGET = 5000.0  # img/s/chip, BASELINE.json:5


def main():
    from tpurpn import get_hyper_params
    from tpurpn.anchors import generate_anchors
    from tpurpn.model import get_model, init_model
    from tpurpn.predict import decode_outputs_planes, generate_proposals_planes

    hp = get_hyper_params("mobilenet_v2")
    model = get_model(hp)
    variables = init_model(model, jax.random.key(0))
    anchors = generate_anchors(hp)

    @jax.jit
    def e2e(variables, images, carry):
        imgs = images + carry  # data dependency chains successive dispatches
        rpn_reg, rpn_cls = model.module.apply(variables, imgs, train=False)
        planes, scores = decode_outputs_planes(anchors, rpn_reg, rpn_cls, hp)
        out = generate_proposals_planes(planes, scores, hp, topn=hp.test_nms_topn)
        return out["roi_scores"].mean() * 1e-6

    images = jax.random.uniform(
        jax.random.key(1), (BATCH, hp.img_size, hp.img_size, 3), jnp.float32
    )

    def run_chain(k):
        # async dispatches chained by the carry; one host sync at the end
        carry = jnp.float32(0.0)
        for _ in range(k):
            carry = e2e(variables, images, carry)
        return float(carry)

    run_chain(2)  # compile + warm
    t0 = time.perf_counter()
    run_chain(K)
    dt = (time.perf_counter() - t0) / K
    throughput = BATCH / dt
    print(
        json.dumps(
            {
                "metric": "mobilenet_v2_rpn_e2e_inference_500x500",
                "value": round(throughput, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(throughput / TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
