"""In-context A/B of the space-to-depth Conv1 in the config-2 pipeline.

Standalone, the s2d-folded Conv1 wins 1.34x at batch 8 / 1.16x at 128
(exp_s2d_conv1.py) — IF the s2d reshape is free. Here the reshape is fused
into the preprocess (the resize's gather writes a permuted layout; XLA
should fold the transpose into it) and the full config-2 program is timed
A/B, per the in-context rule (two previous standalone wins reversed in
context).

    python benchmarks/exp_s2d_incontext.py [batch]
"""

import sys

sys.path.insert(0, ".")

from benchmarks.common import emit, enable_compile_cache, time_scan_chained


def main(batch=8):
    enable_compile_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpurpn import get_hyper_params
    from tpurpn.anchors import generate_anchors
    from tpurpn.backbones.mobilenet_v2 import MobileNetV2Backbone
    from tpurpn.data import SyntheticVOC, preprocess_batch
    from tpurpn.inference import RPNHeadOnly
    from tpurpn.model import fold_batch_norm, get_model, init_model
    from tpurpn.predict import decode_outputs_packed, generate_proposals_packed

    hp = get_hyper_params("mobilenet_v2")
    model, variables = fold_batch_norm(
        hp, init_model(get_model(hp), jax.random.key(0))
    )
    anchors = generate_anchors(hp)
    bb = variables["params"]["backbone"]

    # fold Conv1 (3,3,3,32) into the s2d 2x2-over-12 kernel via the SHIPPING
    # fold (tpurpn.inference.fold_conv1_s2d) so this probe stays pinned to
    # the code config-2 serving actually runs
    from tpurpn.inference import fold_conv1_s2d

    w4, b1 = fold_conv1_s2d({
        "kernel": jnp.asarray(bb["Conv1"]["kernel"], jnp.float32),
        "bias": jnp.asarray(bb["Conv1"]["bias"], jnp.float32),
    })
    w4 = w4.astype(jnp.bfloat16)

    rest = MobileNetV2Backbone(
        dtype=jnp.bfloat16, param_dtype=jnp.float32, fold_bn=True,
        skip_stem=True,
    )
    rest_params = {k: v for k, v in bb.items() if k != "Conv1"}
    head = RPNHeadOnly(hp)
    head_params = {
        k: variables["params"][k] for k in ("rpn_conv", "rpn_cls", "rpn_reg")
    }

    def s2d(x):
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(B, H // 2, W // 2, 4 * C)

    def tail(feat):
        reg, cls = head.apply({"params": head_params}, feat)
        planes_t, s = decode_outputs_packed(anchors, reg, cls, hp)
        out = generate_proposals_packed(planes_t, s, hp, topn=hp.test_nms_topn)
        return out["roi_scores"].mean() * 1e-6

    # raw nudged by the carry BEFORE the preprocess: a loop-invariant resize
    # is LICM-hoisted out of the timing scan (carry ~1e-6 -> uint8 adds 0)
    def step_base(raw, carry):
        imgs, _ = preprocess_batch(
            raw + carry.astype(jnp.uint8), jnp.zeros((batch, 1, 4)),
            hp.img_size, dtype=jnp.bfloat16,
        )
        reg_cls = model.module.apply(variables, imgs, train=False)
        planes_t, s = decode_outputs_packed(anchors, *reg_cls, hp)
        out = generate_proposals_packed(planes_t, s, hp, topn=hp.test_nms_topn)
        return out["roi_scores"].mean() * 1e-6

    def step_s2d(raw, carry):
        imgs, _ = preprocess_batch(
            raw + carry.astype(jnp.uint8), jnp.zeros((batch, 1, 4)),
            hp.img_size, dtype=jnp.bfloat16,
        )
        x12 = s2d(imgs)
        y = lax.conv_general_dilated(
            x12, w4, (1, 1), ((0, 1), (0, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + b1
        conv1_out = jnp.clip(y, 0.0, 6.0).astype(jnp.bfloat16)
        feat = rest.apply({"params": rest_params}, conv1_out, train=False)
        return tail(feat)

    ds = SyntheticVOC(num_samples=batch)
    raw_imgs, _, _ = next(ds.batches(batch))
    raw_imgs = jnp.asarray(raw_imgs)

    # parity first: same proposals from both programs
    imgs, _ = preprocess_batch(
        raw_imgs, jnp.zeros((batch, 1, 4)), hp.img_size, dtype=jnp.bfloat16
    )
    reg_a, cls_a = model.module.apply(variables, imgs, train=False)
    x12 = s2d(imgs)
    y = lax.conv_general_dilated(
        x12, w4, (1, 1), ((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b1
    c1 = jnp.clip(y, 0.0, 6.0).astype(jnp.bfloat16)
    feat = rest.apply({"params": rest_params}, c1, train=False)
    reg_b, cls_b = head.apply({"params": head_params}, feat)
    emit("s2d_pipeline_max_abs_err",
         float(jnp.max(jnp.abs(cls_a - cls_b))), "logits")

    dt_a = time_scan_chained(step_base, raw_imgs, iters=30)
    dt_b = time_scan_chained(step_s2d, raw_imgs, iters=30)
    emit(f"config2_base_b{batch}", batch / dt_a, "img/s")
    emit(f"config2_s2d_b{batch}", batch / dt_b, "img/s",
         speedup=round(dt_a / dt_b, 3))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
