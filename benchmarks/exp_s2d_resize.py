"""s2d-EMITTING resize: the resize itself produces space-to-depth layout.

Round-3 follow-up to exp_s2d_conv1/exp_s2d_incontext. The s2d Conv1 fold
(2x2/s1/C_in=12, bit-exact) wins standalone (1.34x at batch 8) but lost
0.80x in context because the reshape/transpose AFTER the resize does not
fold into the resize and serializes against the backbone. This removes the
reshape entirely: each (row-parity p, col-parity q) sub-grid of the resized
image is itself a linear resize computed directly by
jax.image.scale_and_translate (the SAME family jax.image.resize lowers to
for method="bilinear" — resize(out) row i samples input coord
(i+0.5)*(in/out)-0.5; rows i=2u+p are scale'=out/(2*in),
translation'=(0.5-p)/2), so the (B, 250, 250, 12) tensor is emitted
directly and Conv1 runs as the folded 2x2 conv with no layout op at all.

The shipping formulation lives in tpurpn.inference (s2d_resize /
s2d_uint8_stem / fast_uint8_forward; parity: tests/test_inference_s2d.py);
this experiment A/Bs it inside the full uint8 e2e pipeline: base
(preprocess_batch + flax forward), base+fused-mid-stage (the bench.py
forward), s2d stem, and s2d stem + fused mid-stage.

    python benchmarks/exp_s2d_resize.py [batch]
"""

import sys

sys.path.insert(0, ".")

from benchmarks.common import (
    emit,
    enable_compile_cache,
    perturb_variables,
    time_scan_chained,
)


def main(batch=8):
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from tpurpn import get_hyper_params
    from tpurpn.anchors import generate_anchors
    from tpurpn.data import SyntheticVOC, preprocess_batch
    from tpurpn.inference import (
        fast_mobilenet_forward,
        fast_uint8_forward,
        s2d_resize,
    )
    from tpurpn.model import fold_batch_norm, get_model, init_model
    from tpurpn.predict import decode_outputs_packed, generate_proposals_packed

    hp = get_hyper_params("mobilenet_v2")
    model, variables = fold_batch_norm(
        hp, init_model(get_model(hp), jax.random.key(0))
    )
    anchors = generate_anchors(hp)

    def tail(reg, cls):
        planes_t, s = decode_outputs_packed(anchors, reg, cls, hp)
        out = generate_proposals_packed(planes_t, s, hp, topn=hp.test_nms_topn)
        return out["roi_scores"].mean() * 1e-6

    # every step nudges raw with the carry BEFORE the preprocess/stem:
    # a loop-invariant resize is hoisted out of the scan by XLA's while-loop
    # LICM, silently excluding exactly the cost this experiment compares
    # (carry ~1e-6 -> uint8 cast adds 0; fuses into the convert)
    def step_base(variables, raw, carry):
        imgs, _ = preprocess_batch(
            raw + carry.astype(jnp.uint8), jnp.zeros((batch, 1, 4)),
            hp.img_size, dtype=jnp.bfloat16,
        )
        reg, cls = model.module.apply(
            perturb_variables(variables, carry), imgs, train=False
        )
        return tail(reg, cls)

    def step_base_fused(variables, raw, carry):
        imgs, _ = preprocess_batch(
            raw + carry.astype(jnp.uint8), jnp.zeros((batch, 1, 4)),
            hp.img_size, dtype=jnp.bfloat16,
        )
        reg, cls = fast_mobilenet_forward(
            hp, perturb_variables(variables, carry), imgs
        )
        return tail(reg, cls)

    def step_s2d(variables, raw, carry):
        reg, cls = fast_uint8_forward(
            hp, perturb_variables(variables, carry),
            raw + carry.astype(jnp.uint8), fused_stage=False
        )
        return tail(reg, cls)

    def step_s2d_fused(variables, raw, carry):
        reg, cls = fast_uint8_forward(
            hp, perturb_variables(variables, carry),
            raw + carry.astype(jnp.uint8), fused_stage=True
        )
        return tail(reg, cls)

    ds = SyntheticVOC(num_samples=batch)
    raw_imgs, _, _ = next(ds.batches(batch))
    raw_imgs = jnp.asarray(raw_imgs)

    # parity 1: s2d_resize vs resize-then-slice, elementwise (bf16 path)
    x = raw_imgs.astype(jnp.bfloat16) / jnp.asarray(255.0, jnp.bfloat16)
    full = jax.image.resize(
        x, (batch, hp.img_size, hp.img_size, 3), method="bilinear"
    )
    got12 = s2d_resize(x, hp.img_size)
    ref12 = jnp.concatenate(
        [full[:, p::2, q::2, :] for p in (0, 1) for q in (0, 1)], axis=-1
    )
    bitexact = bool((got12 == ref12).all())
    err12 = float(jnp.abs(
        got12.astype(jnp.float32) - ref12.astype(jnp.float32)
    ).max())
    # emit() rounds value to 2 decimals — report the exact error in extras
    emit("s2d_resize_vs_resize_slice", err12, "max_abs_err",
         bitexact=bitexact, err_exact=err12)

    # parity 2: end pipeline, BOTH heads (cls logits and reg deltas)
    imgs, _ = preprocess_batch(
        raw_imgs, jnp.zeros((batch, 1, 4)), hp.img_size, dtype=jnp.bfloat16
    )
    reg_a, cls_a = model.module.apply(variables, imgs, train=False)
    reg_b, cls_b = fast_uint8_forward(
        hp, variables, raw_imgs, fused_stage=False
    )
    cls_err = float(jnp.max(jnp.abs(cls_a - cls_b)))
    reg_err = float(jnp.max(jnp.abs(reg_a - reg_b)))
    emit("s2d_pipeline_max_abs_err", max(cls_err, reg_err), "logits",
         cls_err=cls_err, reg_err=reg_err,
         cls_scale=float(jnp.max(jnp.abs(cls_a))),
         reg_scale=float(jnp.max(jnp.abs(reg_a))))

    dt_a = time_scan_chained(step_base, variables, raw_imgs, iters=30)
    emit(f"uint8_e2e_base_b{batch}", batch / dt_a, "img/s")
    dt_af = time_scan_chained(step_base_fused, variables, raw_imgs, iters=30)
    emit(f"uint8_e2e_base_fusedstage_b{batch}", batch / dt_af, "img/s",
         speedup_vs_base=round(dt_a / dt_af, 3))
    dt_b = time_scan_chained(step_s2d, variables, raw_imgs, iters=30)
    emit(f"uint8_e2e_s2dresize_b{batch}", batch / dt_b, "img/s",
         speedup_vs_base=round(dt_a / dt_b, 3))
    dt_bf = time_scan_chained(step_s2d_fused, variables, raw_imgs, iters=30)
    emit(f"uint8_e2e_s2dresize_fusedstage_b{batch}", batch / dt_bf, "img/s",
         speedup_vs_base=round(dt_a / dt_bf, 3))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
