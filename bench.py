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
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# Persistent compile cache: remote TPU compiles of while-loop-heavy programs
# are slow (~minutes cold); cached reruns are instant. ONE implementation
# (benchmarks/common.py) so the cache location/threshold cannot drift
# between the headline bench and the config scripts.
from benchmarks.common import enable_compile_cache  # noqa: E402

enable_compile_cache()

BATCH = 128
K = 50  # chained steps per timing call
TARGET = 5000.0  # img/s/chip, BASELINE.json:5


def main():
    from tpurpn import get_hyper_params
    from tpurpn.anchors import generate_anchors
    from tpurpn.model import fold_batch_norm, get_model, init_model
    from tpurpn.predict import decode_outputs_packed, generate_proposals_packed

    hp = get_hyper_params("mobilenet_v2")
    base_model = get_model(hp)
    base_variables = init_model(base_model, jax.random.key(0))
    # inference-time BN folding: same math, ~34 fewer elementwise passes
    model, variables = fold_batch_norm(hp, base_variables)
    anchors = generate_anchors(hp)

    # keep every scan iteration data-dependent (so XLA can't hoist the
    # loop-invariant body): shared helper, see benchmarks/common.py
    from benchmarks.common import perturb_variables as perturb

    def e2e_step(variables, images, carry):
        # images are held in bf16 (the model's compute dtype — a serving
        # pipeline hands over bf16/uint8, not fp32). The forward swaps the
        # backbone mid-stage for the fused inverted-residual Pallas kernel
        # (tpurpn.inference) — +4.7% over the pure-flax forward at batch 128
        # (benchmarks/exp_fast_forward.py; parity in tests/test_ir_stage.py)
        from tpurpn.inference import fast_mobilenet_forward

        rpn_reg, rpn_cls = fast_mobilenet_forward(
            hp, perturb(variables, carry), images
        )
        planes_t, scores = decode_outputs_packed(anchors, rpn_reg, rpn_cls, hp)
        out = generate_proposals_packed(planes_t, scores, hp, topn=hp.test_nms_topn)
        return out["roi_scores"].mean() * 1e-6

    @jax.jit
    def e2e_many(variables, images):
        # K steps inside ONE program: measures device throughput, not the
        # ~10 ms/dispatch tunnel overhead (a production server pipelines
        # requests; the tunnel is an artifact of this environment)
        def body(c, _):
            return e2e_step(variables, images, c), None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return carry

    images = jax.random.uniform(
        jax.random.key(1), (BATCH, hp.img_size, hp.img_size, 3), jnp.float32
    ).astype(jnp.bfloat16)

    # honest end-to-end variant: raw uint8 VOC-shaped frames, on-device
    # bf16 preprocess (uint8 -> [0,1] resize 500x500) included in the timing
    from tpurpn.data import preprocess_batch

    raw_u8 = (
        jax.random.uniform(jax.random.key(2), (BATCH, 375, 500, 3)) * 255
    ).astype(jnp.uint8)

    @jax.jit
    def e2e_u8_many(variables, raw):
        def body(c, _):
            # the raw input must be carry-dependent too: a loop-invariant
            # preprocess_batch(raw, ...) is hoisted out of the scan by XLA's
            # while-loop LICM and the "preprocess included" number would
            # silently exclude it. The carry is clipped to [0, 1] before the
            # uint8 cast: float->unsigned convert is UNDEFINED for negative
            # inputs, so a negative carry could otherwise perturb every pixel
            # (ADVICE r3). The clipped ~1e-6-scale value truncates to 0, and
            # the add fuses into the uint8->bf16 convert (same pattern as
            # benchmarks/exp_smallbatch.py's prep probe).
            imgs, _ = preprocess_batch(
                raw + jnp.clip(c, 0.0, 1.0).astype(jnp.uint8),
                jnp.zeros((BATCH, 1, 4)),
                hp.img_size, dtype=jnp.bfloat16,
            )
            return e2e_step(variables, imgs, c), None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return carry

    def measure(fn, *args, reps=3):
        # min-of-reps: each rep is already a K=50-step average; the min
        # discards host/tunnel hiccups (observed ~5% run-to-run spread)
        float(fn(*args))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, (time.perf_counter() - t0) / K)
        return BATCH / best

    throughput = measure(e2e_many, variables, images)
    throughput_u8 = measure(e2e_u8_many, variables, raw_u8)

    rec = {
        "metric": "mobilenet_v2_rpn_e2e_inference_500x500",
        "value": round(throughput, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(throughput / TARGET, 3),
        "uint8_preprocess_e2e": round(throughput_u8, 1),
    }

    # trained-distribution re-validation (CLAUDE.md gotcha: NMS cost depends
    # on the score distribution; random-init scores could flatter the number).
    # With the committed trained checkpoint, re-measure on trained weights +
    # real synthetic-VOC frames and report the delta alongside.
    trained_h5 = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "trained", "rpn_mobilenet_v2_trained.h5",
    )
    if os.path.exists(trained_h5):
        from tpurpn.data import SyntheticVOC, preprocess_batch
        from tpurpn.io_utils import load_keras_h5_weights

        params, stats, _ = load_keras_h5_weights(
            trained_h5, base_variables["params"],
            base_variables.get("batch_stats"),
        )
        _, t_variables = fold_batch_norm(
            hp, {"params": params, "batch_stats": stats}
        )
        val_imgs, _, _ = next(
            SyntheticVOC(seed=1, num_samples=BATCH).batches(BATCH)
        )
        t_imgs, _ = preprocess_batch(
            jnp.asarray(val_imgs), jnp.zeros((BATCH, 1, 4)), hp.img_size,
            dtype=jnp.bfloat16,
        )
        trained = measure(e2e_many, t_variables, t_imgs)
        rec["trained_ckpt_real_frames_e2e"] = round(trained, 1)
        rec["trained_vs_random_init_pct"] = round(
            100.0 * (trained - throughput) / throughput, 1
        )

    print(json.dumps(rec))


if __name__ == "__main__":
    main()
