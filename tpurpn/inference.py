"""Optimized inference engine: BN-folded MobileNetV2 forward with fused
Pallas MBConv blocks.

The flax module (tpurpn.model) is the training/reference forward. This module
is the serving path: it consumes BN-folded variables (model.fold_batch_norm)
and computes the same function with

* all stride-1 inverted-residual blocks fused into single Pallas kernels
  (kernels/mbconv_pallas) — the 6x-expanded activations never touch HBM;
* consecutive fused blocks chained in the (B, C, H*W) plane layout, with a
  single NHWC<->planes transpose per fused segment;
* XLA convolutions for the stride-2 blocks, the stem, the block-13 expansion
  tap, and the RPN head.

Parity with the folded flax model is tested in tests/test_inference.py.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .config import HyperParams
from .kernels.mbconv_pallas import (
    fused_mbconv_flat,
    flat_padded_to_nhwc,
    nhwc_to_flat_padded,
)


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _conv(x, p, stride=1, groups=1, dtype=jnp.bfloat16):
    y = lax.conv_general_dilated(
        x.astype(dtype),
        p["kernel"].astype(dtype),
        (stride, stride),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y + p["bias"].astype(dtype)


def _xla_block(bp, name, x, stride, dtype):
    """Unfused inverted residual (folded weights) via XLA convs."""
    in_ch = x.shape[-1]
    h = x
    if f"{name}_expand" in bp:
        h = _relu6(_conv(h, bp[f"{name}_expand"], dtype=dtype))
    h = _relu6(
        _conv(h, bp[f"{name}_depthwise"], stride=stride, groups=h.shape[-1],
              dtype=dtype)
    )
    h = _conv(h, bp[f"{name}_project"], dtype=dtype)
    out_ch = h.shape[-1]
    if stride == 1 and in_ch == out_ch:
        h = h + x
    return h


def _fused_args(bp, name):
    return (
        bp[f"{name}_expand"]["kernel"][0, 0],
        bp[f"{name}_expand"]["bias"],
        bp[f"{name}_depthwise"]["kernel"][:, :, 0, :],
        bp[f"{name}_depthwise"]["bias"],
        bp[f"{name}_project"]["kernel"][0, 0],
        bp[f"{name}_project"]["bias"],
    )


def _fused_segment(bb, x, block_ids, H, W, dtype, interpret):
    """Run consecutive stride-1 blocks fused, lane-flattened over the batch."""
    B = x.shape[0]
    flat = nhwc_to_flat_padded(x)
    for bid, residual in block_ids:
        name = f"block_{bid}"
        w1, b1, k, b2, w2, b3 = _fused_args(bb[name], name)
        flat = fused_mbconv_flat(
            flat, w1, b1, k, b2, w2, b3, Hp=H + 2, Wp=W + 2, n_img=B,
            residual=residual, dtype=dtype, interpret=interpret,
        )
    return flat_padded_to_nhwc(flat, B, H, W)


def mobilenet_v2_fused_forward(
    folded_variables,
    images: jnp.ndarray,
    hp: HyperParams,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BN-folded MobileNetV2 RPN forward with fused MBConv kernels.

    Args:
      folded_variables: output of model.fold_batch_norm(hp, variables)[1].
      images: (B, H, W, 3) float (any dtype; cast to hp.compute_dtype).
      hp: hyper params (mobilenet_v2 backbone).

    Returns (rpn_reg, rpn_cls_logits) as float32, identical (up to dtype
    rounding) to the folded flax model's apply.
    """
    assert hp.backbone == "mobilenet_v2"
    dtype = jnp.dtype(hp.compute_dtype)
    params = folded_variables["params"]
    bb = params["backbone"]

    s1 = math.ceil(hp.img_size / 2)  # after Conv1
    s2 = math.ceil(s1 / 2)  # after block_1 dw
    s3 = math.ceil(s2 / 2)  # after block_3 dw
    s4 = math.ceil(s3 / 2)  # after block_6 dw

    x = _relu6(_conv(images, bb["Conv1"], stride=2, dtype=dtype))  # (B,s1,s1,32)

    # block 0 (expanded_conv, t=1): dw + project, XLA
    p0 = bb["expanded_conv"]
    h = _relu6(
        _conv(x, p0["expanded_conv_depthwise"], groups=x.shape[-1], dtype=dtype)
    )
    x = _conv(h, p0["expanded_conv_project"], dtype=dtype)  # 16ch, s1

    x = _xla_block(bb["block_1"], "block_1", x, stride=2, dtype=dtype)  # 24ch, s2
    x = _fused_segment(bb, x, [(2, True)], s2, s2, dtype, interpret)
    x = _xla_block(bb["block_3"], "block_3", x, stride=2, dtype=dtype)  # 32ch, s3
    x = _fused_segment(bb, x, [(4, True), (5, True)], s3, s3, dtype, interpret)
    x = _xla_block(bb["block_6"], "block_6", x, stride=2, dtype=dtype)  # 64ch, s4
    x = _fused_segment(
        bb, x,
        [(7, True), (8, True), (9, True), (10, False), (11, True), (12, True)],
        s4, s4, dtype, interpret,
    )

    feat = _relu6(_conv(x, bb["block_13_expand"], dtype=dtype))  # 576ch, s4

    h = jax.nn.relu(_conv(feat, params["rpn_conv"], dtype=dtype))
    rpn_cls = _conv(h, params["rpn_cls"], dtype=dtype)
    rpn_reg = _conv(h, params["rpn_reg"], dtype=dtype)
    return rpn_reg.astype(jnp.float32), rpn_cls.astype(jnp.float32)


def make_fused_predict_fn(hp: HyperParams, topn: int | None = None):
    """Full serving pipeline: fused forward -> plane decode -> sort -> NMS.

    Returns predict(folded_variables, images) -> proposals dict. TPU only
    (Pallas kernels); use tpurpn.predict.make_predict_fn elsewhere.
    """
    from .anchors import generate_anchors
    from .predict import decode_outputs_planes, generate_proposals_planes

    anchors = generate_anchors(hp)
    out_topn = hp.test_nms_topn if topn is None else topn

    @jax.jit
    def predict(folded_variables, images):
        rpn_reg, rpn_cls = mobilenet_v2_fused_forward(folded_variables, images, hp)
        planes, scores = decode_outputs_planes(anchors, rpn_reg, rpn_cls, hp)
        return generate_proposals_planes(planes, scores, hp, topn=out_topn)

    return predict
