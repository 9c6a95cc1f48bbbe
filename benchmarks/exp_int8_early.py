"""Probe: can int8 halve the byte-bound early-stage traffic (block_1-2)?

Round-5 follow-up to the inference HBM roofline (BASELINE.md): ~62% of the
headline forward is byte-bound AT the measured ~510-570 GB/s attainable
roof — block_1-2 (26.6% of fwd, 2720 MB at batch 128) is the largest such
stage and "only less traffic would help; activations are already bf16".
The one mechanism left is int8: v5e's MXU runs s8xs8->s32 at 2x bf16
rate and int8 activations halve every byte-bound buffer again.

This measures the block_1 -> block_2 chain (real folded-BN weights, real
expanded_conv activations) in three variants:

  bf16        the shipping arithmetic (plain-lax twin of the flax chain,
              parity-checked against the flax prefix at bf16 tolerance)
  w8a8        full int8 inference: per-output-channel int8 weights,
              per-tensor int8 activations, s8 conv -> s32 accum, f32
              requant epilogue (scale+bias+relu6+round) writing int8 —
              every inter-op buffer is int8
  a8_storage  int8 STORAGE only: convs stay bf16 (dequant fused into the
              conv input read, quant into its epilogue) — isolates the
              traffic saving from int8-MXU support

plus the stride-2 depthwise alone (the op most likely to lack an int8
TPU lowering). Scales are calibrated from one real batch (max/127);
numerics are reported vs the bf16 chain but this is a SPEED probe — a
shippable path would calibrate properly.

    python benchmarks/exp_int8_early.py [batch]
"""

import sys

sys.path.insert(0, ".")

from benchmarks.common import emit, enable_compile_cache, time_scan_chained


def main(batch=128):
    enable_compile_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpurpn import get_hyper_params
    from tpurpn.backbones.mobilenet_v2 import MobileNetV2Backbone
    from tpurpn.model import fold_batch_norm, get_model, init_model

    batch = int(batch)
    hp = get_hyper_params("mobilenet_v2")
    _, variables = fold_batch_norm(
        hp, init_model(get_model(hp), jax.random.key(0))
    )
    bb = variables["params"]["backbone"]

    def conv(x, w, stride=1, groups=1, prefer=None):
        return lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=prefer,
        )

    # --- real input: expanded_conv activations at (B, 250, 250, 16) ---
    prefix0 = MobileNetV2Backbone(
        dtype=jnp.bfloat16, param_dtype=jnp.float32, fold_bn=True,
        stop_after_block=0,
    )
    p0 = {k: bb[k] for k in ("Conv1", "expanded_conv")}
    images = jax.random.uniform(
        jax.random.key(2), (batch, hp.img_size, hp.img_size, 3), jnp.float32
    ).astype(jnp.bfloat16)
    x0 = jax.jit(
        lambda im: prefix0.apply({"params": p0}, im, train=False)
    )(images)
    x0 = jax.block_until_ready(x0)

    W = {}  # name -> (kernel f32, bias f32, stride, groups, relu6)
    for blk, names in (("block_1", ("expand", "depthwise", "project")),
                       ("block_2", ("expand", "depthwise", "project"))):
        for nm in names:
            p = bb[blk][f"{blk}_{nm}"]
            stride = 2 if (blk, nm) == ("block_1", "depthwise") else 1
            groups = p["kernel"].shape[-1] if nm == "depthwise" else 1
            W[f"{blk}_{nm}"] = (
                p["kernel"], p["bias"], stride, groups, nm != "project"
            )
    ORDER = [f"{b}_{n}" for b in ("block_1", "block_2")
             for n in ("expand", "depthwise", "project")]

    def bf16_chain(biases, x):
        h = x
        x1 = None
        for k in ORDER:
            w, _, stride, groups, act = W[k]
            h = conv(h, w.astype(jnp.bfloat16), stride, groups)
            h = h + biases[k].astype(jnp.bfloat16)
            if act:
                h = jnp.clip(h, 0.0, 6.0)
            if k == "block_1_project":
                x1 = h
        return x1 + h  # block_2 residual

    biases_f32 = {k: W[k][1] for k in ORDER}

    # parity check of the plain-lax twin vs the flax prefix (2 images)
    prefix2 = MobileNetV2Backbone(
        dtype=jnp.bfloat16, param_dtype=jnp.float32, fold_bn=True,
        stop_after_block=2,
    )
    p2 = {k: bb[k] for k in
          ("Conv1", "expanded_conv", "block_1", "block_2")}
    ref2 = np.asarray(
        prefix2.apply({"params": p2}, images[:2], train=False), np.float32
    )
    tw2 = np.asarray(bf16_chain(biases_f32, x0[:2]), np.float32)
    emit("lax_twin_max_abs_err", float(np.max(np.abs(ref2 - tw2))), "f32",
         ref_scale=round(float(np.max(np.abs(ref2))), 2))

    # --- calibration from one real batch: per-tensor activation scales ---
    def run_acts(x):
        acts = {"in": x}
        h = x
        x1 = None
        for k in ORDER:
            w, b, stride, groups, act = W[k]
            h = conv(h, w.astype(jnp.bfloat16), stride, groups)
            h = h + b.astype(jnp.bfloat16)
            if act:
                h = jnp.clip(h, 0.0, 6.0)
            if k == "block_1_project":
                x1 = h
            acts[k] = h
        acts["out"] = x1 + h
        return acts

    acts = jax.jit(run_acts)(x0[: min(batch, 8)])
    a_scale = {
        k: float(jnp.max(jnp.abs(v.astype(jnp.float32)))) / 127.0
        for k, v in acts.items()
    }
    ref_out = np.asarray(bf16_chain(biases_f32, x0), np.float32)

    wq, w_scale = {}, {}
    for k in ORDER:
        w = np.asarray(W[k][0], np.float32)
        s = np.max(np.abs(w), axis=(0, 1, 2), keepdims=True) / 127.0
        s = np.maximum(s, 1e-12)
        wq[k] = jnp.asarray(np.clip(np.round(w / s), -127, 127), jnp.int8)
        w_scale[k] = jnp.asarray(s[0, 0, 0], jnp.float32)  # (Cout,)

    def quant(x, scale):
        return jnp.clip(
            jnp.round(x.astype(jnp.float32) / scale), -128, 127
        ).astype(jnp.int8)

    x0_q = jax.jit(lambda x: quant(x, a_scale["in"]))(x0)
    x0_q = jax.block_until_ready(x0_q)

    def make_chain(int8_mxu):
        """w8a8 (int8 conv) or a8_storage (bf16 conv, int8 buffers)."""

        def chain(biases, xq):
            h, s_in = xq, a_scale["in"]
            x1q = None
            for k in ORDER:
                _, _, stride, groups, act = W[k]
                if int8_mxu:
                    y = conv(h, wq[k], stride, groups, prefer=jnp.int32)
                    y = y.astype(jnp.float32) * (s_in * w_scale[k])
                else:
                    hf = h.astype(jnp.bfloat16) * jnp.bfloat16(s_in)
                    wf = (wq[k].astype(jnp.float32) * w_scale[k]).astype(
                        jnp.bfloat16)
                    y = conv(hf, wf, stride, groups).astype(jnp.float32)
                y = y + biases[k]
                if act:
                    y = jnp.clip(y, 0.0, 6.0)
                if k == "block_2_project":
                    # residual add in the epilogue: dequant block_1's out
                    y = y + x1q.astype(jnp.float32) * a_scale["block_1_project"]
                    return quant(y, a_scale["out"])
                h = quant(y, a_scale[k])
                s_in = a_scale[k]
                if k == "block_1_project":
                    x1q = h
            raise AssertionError

        return chain

    for name, fn in (("w8a8", make_chain(True)),
                     ("a8_storage", make_chain(False))):
        try:
            out = jax.jit(fn)(biases_f32, x0_q)
            out = np.asarray(out, np.float32) * a_scale["out"]
            err = float(np.max(np.abs(out - ref_out)))
            emit(f"{name}_max_abs_err", err, "f32",
                 ref_scale=round(float(np.max(np.abs(ref_out))), 2))
        except Exception as e:  # unsupported lowering dies here, cheaply
            emit(f"{name}_unsupported", 1.0, "bool",
                 error=type(e).__name__, detail=str(e)[:200])

    # --- timing: nudge one f32 bias by the carry (perturb_variables'
    # trick; int8 inputs can't carry a 1e-20 nudge) ---
    def timed(fn, x_in):
        def step(biases, x, c):
            b = dict(biases)
            b["block_1_expand"] = b["block_1_expand"] + c * 1e-20
            out = fn(b, x)
            return out.astype(jnp.float32).mean() * 1e-6

        return time_scan_chained(step, biases_f32, x_in, iters=30) * 1e3

    dt_bf16 = timed(bf16_chain, x0)
    emit(f"chain_bf16_b{batch}", round(dt_bf16, 3), "ms/batch")
    for name, fn in (("w8a8", make_chain(True)),
                     ("a8_storage", make_chain(False))):
        try:
            dt = timed(fn, x0_q)
            emit(f"chain_{name}_b{batch}", round(dt, 3), "ms/batch",
                 speedup=round(dt_bf16 / dt, 3))
        except Exception as e:
            emit(f"chain_{name}_failed", 1.0, "bool",
                 error=type(e).__name__, detail=str(e)[:200])

    # --- the risky op alone: stride-2 depthwise at (B, 250, 250, 96) ---
    k = "block_1_depthwise"
    he = jax.jit(lambda x: jnp.clip(
        conv(x, W["block_1_expand"][0].astype(jnp.bfloat16))
        + W["block_1_expand"][1].astype(jnp.bfloat16), 0.0, 6.0
    ))(x0)
    he = jax.block_until_ready(he)
    he_q = jax.block_until_ready(
        jax.jit(lambda x: quant(x, a_scale["block_1_expand"]))(he))

    def dw_bf16(biases, x, c):
        y = conv(x + (c * 1e-20).astype(jnp.bfloat16),
                 W[k][0].astype(jnp.bfloat16), 2, 96)
        return y.astype(jnp.float32).mean() * 1e-6

    dt = time_scan_chained(dw_bf16, biases_f32, he, iters=30) * 1e3
    emit(f"dw_s2_bf16_b{batch}", round(dt, 3), "ms/batch")
    try:
        def dw_i8(biases, x, c):
            # carry-dependent +0 that XLA cannot algebraically fold away
            # (c*0 would be simplified to 0 and the conv hoisted)
            xx = x + (c > 1e30).astype(jnp.int8)
            y = conv(xx, wq[k], 2, 96, prefer=jnp.int32)
            return y.astype(jnp.float32).mean() * 1e-6

        dt8 = time_scan_chained(dw_i8, biases_f32, he_q, iters=30) * 1e3
        emit(f"dw_s2_int8_b{batch}", round(dt8, 3), "ms/batch",
             speedup=round(dt / dt8, 3))
    except Exception as e:
        emit("dw_s2_int8_failed", 1.0, "bool",
             error=type(e).__name__, detail=str(e)[:200])


if __name__ == "__main__":
    main(*sys.argv[1:])
