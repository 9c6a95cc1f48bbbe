"""A/B the S=32 fused IR stage's depthwise carry dtype in the full forward.

Round-5 probe (VERDICT r4 weak #3 follow-up): inside
``kernels/ir_stage_pallas.py`` the 3x3 depthwise is 9 masked sublane-shifted
multiply-adds — per block that moves 9 copies of the (m_pad, c_exp)
expanded activation through the VPU, the kernel's dominant non-MXU traffic.
The headline serving path runs it in f32 (``dw_input_bf16=False``, the
more-precise-than-flax default); carrying it bf16 halves that traffic at
the flax oracle's own rounding. The S=63 experiments needed bf16 to fit
VMEM at all; at S=32 it was never A/B'd for SPEED.

Measures the full serving forward + proposal tail in context (the repo's
standalone-vs-in-context rule) with the stage's dw carry f32 vs bf16, plus
stage-only timings, at the given batch.

    python benchmarks/exp_dw_bf16.py [batch]
"""

import sys

sys.path.insert(0, ".")

from benchmarks.common import (emit, enable_compile_cache, perturb_variables
                               as perturb, time_scan_chained)


def main(batch=128):
    enable_compile_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tpurpn import get_hyper_params
    from tpurpn.anchors import generate_anchors
    from tpurpn.backbones.mobilenet_v2 import MobileNetV2Backbone
    from tpurpn.inference import _FUSED_BLOCKS, _PREFIX_MODULES, RPNHeadOnly
    from tpurpn.kernels.ir_stage_pallas import fused_ir_stage, pack_stage_weights
    from tpurpn.model import fold_batch_norm, get_model, init_model
    from tpurpn.predict import decode_outputs_packed, generate_proposals_packed

    batch = int(batch)
    hp = get_hyper_params("mobilenet_v2")
    model, variables = fold_batch_norm(
        hp, init_model(get_model(hp), jax.random.key(0))
    )
    anchors = generate_anchors(hp)
    bb = variables["params"]["backbone"]

    prefix = MobileNetV2Backbone(
        dtype=jnp.bfloat16, param_dtype=jnp.float32, fold_bn=True,
        stop_after_block=6,
    )
    p6 = {k: bb[k] for k in _PREFIX_MODULES}
    weights, blocks = pack_stage_weights(
        bb, _FUSED_BLOCKS, tail_expand="block_13_expand"
    )
    head = RPNHeadOnly(hp)
    head_params = {
        k: variables["params"][k] for k in ("rpn_conv", "rpn_cls", "rpn_reg")
    }

    # numerics: bf16 dw carry vs the shipped f32 carry on real activations
    imgs2 = jax.random.uniform(
        jax.random.key(1), (2, hp.img_size, hp.img_size, 3), jnp.float32
    ).astype(jnp.bfloat16)
    feat6 = prefix.apply({"params": p6}, imgs2, train=False)
    ref = np.asarray(
        fused_ir_stage(feat6.astype(jnp.bfloat16), weights, blocks), np.float32
    )
    got = np.asarray(
        fused_ir_stage(feat6.astype(jnp.bfloat16), weights, blocks,
                       dw_input_bf16=True),
        np.float32,
    )
    emit("dw_bf16_max_abs_err", float(np.max(np.abs(ref - got))), "f32",
         ref_scale=round(float(np.max(np.abs(ref))), 2))

    def tail(feat):
        reg, cls = head.apply({"params": head_params}, feat)
        planes_t, s = decode_outputs_packed(anchors, reg, cls, hp)
        out = generate_proposals_packed(planes_t, s, hp, topn=hp.test_nms_topn)
        return out["roi_scores"].mean() * 1e-6

    def make_e2e(dw_bf16):
        def e2e(p, x, c):
            f6 = prefix.apply({"params": perturb({"p": p}, c)["p"]}, x,
                              train=False)
            feat = fused_ir_stage(f6.astype(jnp.bfloat16), weights, blocks,
                                  dw_input_bf16=dw_bf16)
            return tail(feat)
        return e2e

    def make_stage(dw_bf16):
        def stage(p, x, c):
            # stage-only: carry-perturb the input activation instead of params
            f = fused_ir_stage(
                (x + c.astype(jnp.bfloat16) * 1e-6).astype(jnp.bfloat16),
                weights, blocks, dw_input_bf16=dw_bf16,
            )
            return f.mean().astype(jnp.float32) * 1e-6
        return stage

    images = jax.random.uniform(
        jax.random.key(2), (batch, hp.img_size, hp.img_size, 3), jnp.float32
    ).astype(jnp.bfloat16)
    feat6_b = prefix.apply({"params": p6}, images, train=False)

    dt_f32 = time_scan_chained(make_stage(False), p6, feat6_b, iters=30) * 1e3
    dt_bf16 = time_scan_chained(make_stage(True), p6, feat6_b, iters=30) * 1e3
    emit(f"stage_dw_f32_b{batch}", round(dt_f32, 3), "ms/batch")
    emit(f"stage_dw_bf16_b{batch}", round(dt_bf16, 3), "ms/batch",
         speedup=round(dt_f32 / dt_bf16, 3))

    dt_a = time_scan_chained(make_e2e(False), p6, images, iters=30) * 1e3
    emit(f"e2e_dw_f32_b{batch}", round(dt_a, 3), "ms/batch",
         img_per_s=round(batch / dt_a * 1e3, 1))
    dt_b = time_scan_chained(make_e2e(True), p6, images, iters=30) * 1e3
    emit(f"e2e_dw_bf16_b{batch}", round(dt_b, 3), "ms/batch",
         img_per_s=round(batch / dt_b * 1e3, 1),
         speedup=round(dt_a / dt_b, 3))


if __name__ == "__main__":
    main(*sys.argv[1:])
