"""Fused blocks 4-5 (63x63 stride-1 stage) via the existing IR-stage kernel.

exp_stage_budget.py attributes 1.59 ms/batch128 to blocks 4-5 under XLA.
The fused kernel wins at 32x32 (blocks 7-12, +4.7% e2e); this probes the
same kernel at S=63 (m_pad 3976, c_exp 192), then A/Bs the FULL serving
forward in context per the standalone-vs-in-context rule.

MEASURED NEGATIVE (round 3). Getting S=63 to compile needed two kernel
additions (kept, tested): chunked expand (c_exp_split) and a raised Mosaic
scoped-vmem limit (vmem_limit_mb — the unrolled working set is ~20-24 MB
vs the 16 MB default; scratch-serializing the taps only INCREASED Mosaic's
stack accounting, 21.7 -> 24.3 MB). Output is bit-exact vs the folded flax
stage on-device, but the e2e forward LOSES at every batch size:

  batch 128: base 21.4 ms -> fused45 24.1 ms (0.889x); split=2 0.785x
  batch 8:   base 3.45 ms -> fused45 4.15 ms (0.833x); split=2 0.879x

At S=63 the per-image grid serializes ~16x more rows/step than the S=32
stage while XLA batches the convs; the win at 32x32 does not transfer.
Blocks 4-5 stay on XLA convs.

    python benchmarks/exp_fused45.py [batch]
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
    from tpurpn.backbones.mobilenet_v2 import MobileNetV2Backbone, _InvertedResidual
    from tpurpn.inference import RPNHeadOnly, fast_mobilenet_forward
    from tpurpn.kernels.ir_stage_pallas import fused_ir_stage, pack_stage_weights
    from tpurpn.model import fold_batch_norm, get_model, init_model
    from tpurpn.predict import decode_outputs_packed, generate_proposals_packed

    hp = get_hyper_params("mobilenet_v2")
    model, variables = fold_batch_norm(
        hp, init_model(get_model(hp), jax.random.key(0))
    )
    anchors = generate_anchors(hp)
    bb = variables["params"]["backbone"]

    prefix3 = MobileNetV2Backbone(
        dtype=jnp.bfloat16, param_dtype=jnp.float32, fold_bn=True,
        stop_after_block=3,
    )
    p3_mods = ("Conv1", "expanded_conv", "block_1", "block_2", "block_3")
    p3 = {k: bb[k] for k in p3_mods}

    w45, blocks45 = pack_stage_weights(bb, ("block_4", "block_5"))

    def flax_45(x):
        for name, exp in (("block_4", 6), ("block_5", 6)):
            x = _InvertedResidual(
                expansion=exp, out_ch=32, stride=1, block_name=name,
                dtype=jnp.bfloat16, param_dtype=jnp.float32, fold_bn=True,
                name=name,
            ).apply({"params": bb[name]}, x, train=False)
        return x

    VARIANTS = {  # name -> fused_ir_stage kwargs for the S=63 stage
        "split1_vmem64": dict(vmem_limit_mb=64),
        "split2_vmem64": dict(c_exp_split=2, vmem_limit_mb=64),
        # round 5 (VERDICT r4 weak #4): the r3 attempts predate dw_input_bf16
        # — carrying the expanded activations bf16 halves the depthwise
        # working set (the S=63 stage's dominant VMEM pressure), the one
        # toolkit lever the 0.83x result never combined with the others
        "split1_bf16_vmem64": dict(dw_input_bf16=True, vmem_limit_mb=64),
        "split2_bf16_vmem64": dict(c_exp_split=2, dw_input_bf16=True,
                                   vmem_limit_mb=64),
        "split2_bf16_vmem32": dict(c_exp_split=2, dw_input_bf16=True,
                                   vmem_limit_mb=32),
    }

    # parity on real activations
    imgs = jax.random.uniform(
        jax.random.key(1), (2, hp.img_size, hp.img_size, 3), jnp.float32
    ).astype(jnp.bfloat16)
    feat3 = prefix3.apply({"params": p3}, imgs, train=False)
    ref = np.asarray(flax_45(feat3), np.float32)
    scale = float(np.max(np.abs(ref)))
    for vname, kw in VARIANTS.items():
        got = np.asarray(
            fused_ir_stage(feat3.astype(jnp.bfloat16), w45, blocks45, **kw),
            np.float32,
        )
        err = float(np.max(np.abs(ref - got)))
        emit(f"fused45_{vname}_max_abs_err", err, "f32",
             ref_scale=round(scale, 2))

    # in-context A/B: full fast serving forward + proposal tail
    head = RPNHeadOnly(hp)
    head_params = {
        k: variables["params"][k] for k in ("rpn_conv", "rpn_cls", "rpn_reg")
    }
    w712, blocks712 = pack_stage_weights(
        bb, ("block_7", "block_8", "block_9", "block_10", "block_11",
             "block_12"), tail_expand="block_13_expand",
    )
    prefix6_mods = p3_mods + ("block_4", "block_5", "block_6")
    prefix6 = MobileNetV2Backbone(
        dtype=jnp.bfloat16, param_dtype=jnp.float32, fold_bn=True,
        stop_after_block=6,
    )
    p6 = {k: bb[k] for k in prefix6_mods}

    def block6(x):
        return _InvertedResidual(
            expansion=6, out_ch=64, stride=2, block_name="block_6",
            dtype=jnp.bfloat16, param_dtype=jnp.float32, fold_bn=True,
            name="block_6",
        ).apply({"params": bb["block_6"]}, x, train=False)

    def tail(feat):
        reg, cls = head.apply({"params": head_params}, feat)
        planes_t, s = decode_outputs_packed(anchors, reg, cls, hp)
        out = generate_proposals_packed(planes_t, s, hp, topn=hp.test_nms_topn)
        return out["roi_scores"].mean() * 1e-6

    def e2e_base(p, x, c):
        f6 = prefix6.apply({"params": perturb({"p": p}, c)["p"]}, x, train=False)
        feat = fused_ir_stage(f6.astype(jnp.bfloat16), w712, blocks712)
        return tail(feat)

    def make_e2e_fused45(kw):
        def e2e_fused45(p, x, c):
            f3 = prefix3.apply(
                {"params": {k: perturb({"p": p}, c)["p"][k] for k in p3_mods}},
                x, train=False,
            )
            f5 = fused_ir_stage(f3.astype(jnp.bfloat16), w45, blocks45, **kw)
            f6 = block6(f5)
            feat = fused_ir_stage(f6.astype(jnp.bfloat16), w712, blocks712)
            return tail(feat)
        return e2e_fused45

    images = jax.random.uniform(
        jax.random.key(2), (batch, hp.img_size, hp.img_size, 3), jnp.float32
    ).astype(jnp.bfloat16)
    dt_a = time_scan_chained(e2e_base, p6, images, iters=30) * 1e3
    emit(f"e2e_base_b{batch}", dt_a, "ms/batch",
         img_per_s=round(batch / dt_a * 1e3, 1))
    for vname, kw in VARIANTS.items():
        dt_b = time_scan_chained(make_e2e_fused45(kw), p6, images, iters=30) * 1e3
        emit(f"e2e_fused45_{vname}_b{batch}", dt_b, "ms/batch",
             img_per_s=round(batch / dt_b * 1e3, 1),
             speedup=round(dt_a / dt_b, 3))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
