"""Small-batch fused serving forward for MobileNetV2 (BASELINE config 2).

The standard serving path applies the folded-BN flax model — optimal at
large batch, but at batch 8 its ~70 separate conv kernels each pay pipeline
ramp (benchmarks/exp_smallbatch.py: 0.42 vs 0.146 ms/img). This module
assembles the batch-8-optimized forward:

  flax prefix (Conv1 .. block_6: the stride-2 spine XLA handles well)
  -> kernels/ir_stage_pallas.fused_ir_stage (blocks 7-12 + block_13_expand:
     22 kernels fused into one per-image Pallas program)
  -> flax RPN head (3x3 conv + 1x1 cls/reg)

Numerically equivalent to ``model.fold_batch_norm``'s flax forward at bf16
tolerance (tests/test_ir_stage.py); selection downstream is unchanged.
Opt-in via ``predict.make_predict_fn(..., fast=True)`` or direct call.

Performance path for the reference's ``models/rpn_mobilenet_v2.py`` forward
(SURVEY.md §2 row 4); the flax model remains the semantic source of truth.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from .backbones.mobilenet_v2 import MobileNetV2Backbone, relu6
from .config import HyperParams
from .kernels.ir_stage_pallas import fused_ir_stage, pack_stage_weights

_PREFIX_MODULES = (
    "Conv1", "expanded_conv", "block_1", "block_2", "block_3", "block_4",
    "block_5", "block_6",
)
_FUSED_BLOCKS = ("block_7", "block_8", "block_9", "block_10", "block_11",
                 "block_12")


class RPNHeadOnly(nn.Module):
    """The RPN head alone — delegates to model.apply_rpn_head, so the layer
    names and arithmetic are THE SAME code as model.RPN's head (no drift)."""

    hp: HyperParams

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        from .model import apply_rpn_head

        return apply_rpn_head(self.hp, feat)


def s2d_stem_supported(hp: HyperParams, raw_shape) -> bool:
    """True when the s2d-emitting-resize stem can serve ``raw_shape`` frames.

    The single routing predicate for ``predict.make_predict_fn(fast=True,
    from_uint8=True)`` — keeps the decision next to the invariants it
    mirrors (``s2d_resize``'s asserts: even target size, upsampling-only)
    so the two can't drift.
    """
    return (
        hp.img_size % 2 == 0
        and raw_shape[1] <= hp.img_size
        and raw_shape[2] <= hp.img_size
    )


def s2d_resize(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Bilinear-resize ``x`` to (out_size, out_size) and emit the result in
    2x2 space-to-depth layout — (B, out/2, out/2, 4C) — with NO layout op.

    Each (row-parity p, col-parity q) sub-grid of the resized image is itself
    a linear resize computed directly by ``jax.image.scale_and_translate``
    (the same family ``jax.image.resize`` lowers to for method="bilinear":
    output row i samples input coordinate (i+0.5)*(in/out)-0.5, so rows
    i=2u+p form a resize with scale out/(2*in) and translation (0.5-p)/2).
    Channel blocks are ordered [p0q0, p0q1, p1q0, p1q1] * C — the order
    ``fold_conv1_s2d`` assumes.

    Why this exists (round-3 history, benchmarks/exp_s2d_*.py): folding the
    stride-2 Conv1 stem into a 2x2/s1 conv over s2d input wins standalone but
    the reshape/transpose AFTER a normal resize does not fold into the
    resize's gather and serialized against the backbone (0.80x in context).
    Emitting s2d straight from the resize removes the layout op entirely.

    Valid only while the FULL resize upsamples (H, W <= out_size): the
    sub-grids then downsample (scale < 1) and ``antialias=False`` keeps the
    pure 2-tap bilinear kernel the upsampling full resize uses at these
    exact sample coordinates. A downsampling full resize would antialias
    with kernel width 1/scale, which per-sub-grid scale_and_translate
    cannot express — asserted against.
    """
    B, H, W, C = x.shape
    assert out_size % 2 == 0, (
        "s2d_resize requires an even out_size: the 2x2 factorization (and "
        "fold_conv1_s2d's ((0,1),(0,1)) pad reproducing SAME) only holds at "
        "even sizes", out_size)
    assert H <= out_size and W <= out_size, (
        "s2d_resize requires an upsampling full resize", (H, W, out_size))
    subs = []
    for p in (0, 1):
        for q in (0, 1):
            # scale/translation stay f32: the interpolation weight matrix is
            # computed in their dtype and only cast to x.dtype afterwards —
            # exactly what jax.image.resize does. bf16 coordinate math would
            # drift the sample positions by whole pixels at row ~250.
            subs.append(jax.image.scale_and_translate(
                x, (B, out_size // 2, out_size // 2, C), (1, 2),
                scale=jnp.array(
                    [out_size / (2 * H), out_size / (2 * W)], jnp.float32
                ),
                translation=jnp.array(
                    [(0.5 - p) / 2.0, (0.5 - q) / 2.0], jnp.float32
                ),
                method="linear",
                antialias=False,
            ))
    return jnp.concatenate(subs, axis=-1)


def fold_conv1_s2d(conv1_params) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold the 3x3/s2 Conv1 stem into a 2x2/s1 conv over 2x2-s2d input.

    Exact: tap (ky, kx) of input pixel (2i+u, 2j+v) lives at s2d spatial
    position (i+du, j+dv), channel block u*2+v, where (du,u)=divmod(ky,2)
    and (dv,v)=divmod(kx,2) — matching ``s2d_resize``'s concat order. The
    folded conv uses padding ((0,1),(0,1)), reproducing SAME's single
    trailing zero row/column at even input sizes.

    ``conv1_params``: the folded-BN Conv1 dict {"kernel": (3,3,Cin,Cout),
    "bias": (Cout,)}. Returns (w4 (2,2,4*Cin,Cout), bias), same dtypes in.
    Pure jnp (jit-traceable; loop-invariant, so XLA hoists it out of scans).
    """
    w = conv1_params["kernel"]
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3), (kh, kw)
    # pad taps to 4x4 so tap (2*du+u, 2*dv+v) indexes cleanly; taps 3 are
    # the zero rows/cols (stride-2 SAME never reads them twice)
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    w4 = (
        wp.reshape(2, 2, 2, 2, cin, cout)     # (du, u, dv, v, cin, cout)
        .transpose(0, 2, 1, 3, 4, 5)          # (du, dv, u, v, cin, cout)
        .reshape(2, 2, 4 * cin, cout)         # channel block = u*2+v
    )
    return w4, conv1_params["bias"]


def s2d_uint8_stem(
    hp: HyperParams, variables, raw: jnp.ndarray
) -> jnp.ndarray:
    """Raw uint8 frames -> Conv1 activations, fusing preprocess and stem.

    Computes exactly data.preprocess_batch (uint8 -> [0,1] bf16, bilinear
    resize to img_size) followed by the folded-BN Conv1 + ReLU6 — but the
    resize emits s2d layout directly and Conv1 runs as the folded 2x2/s1
    conv (``fold_conv1_s2d``), so the stride-2 stem conv XLA emits at an
    ~1.4 ms batch-independent floor (BASELINE.md config-2 analysis items
    4-6) is replaced by a cheaper dense formulation with zero layout ops.

    Requires raw H, W <= hp.img_size (the VOC serving case; see s2d_resize).
    """
    dtype = jnp.dtype(hp.compute_dtype)
    w4, b1 = fold_conv1_s2d(variables["params"]["backbone"]["Conv1"])
    x = raw.astype(dtype) / jnp.asarray(255.0, dtype)
    x12 = s2d_resize(x, hp.img_size)
    # same arithmetic as the flax nn.Conv stem: bf16 operands, bf16 output
    # (MXU accumulates f32 internally), bias added in compute dtype
    y = lax.conv_general_dilated(
        x12, w4.astype(dtype), (1, 1), ((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b1.astype(dtype)
    return relu6(y)


def fast_uint8_forward(
    hp: HyperParams,
    variables,
    raw: jnp.ndarray,
    fused_stage: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Raw uint8 frames -> (rpn_reg, rpn_cls_logits), the full serving
    forward with the fused s2d stem (``s2d_uint8_stem``) in place of
    preprocess_batch + Conv1.

    ``fused_stage=True`` additionally swaps the backbone mid-stage for the
    fused inverted-residual Pallas kernel (``fast_mobilenet_forward``'s
    path; TPU only). ``variables`` must be the folded-BN tree.
    """
    assert hp.backbone == "mobilenet_v2", hp.backbone
    feat1 = s2d_uint8_stem(hp, variables, raw)
    if fused_stage:
        return _fused_stage_from(hp, variables, feat1, skip_stem=True,
                                 interpret=interpret)

    params = variables["params"]
    rest = MobileNetV2Backbone(
        dtype=jnp.dtype(hp.compute_dtype),
        param_dtype=jnp.dtype(hp.param_dtype),
        fold_bn=True,
        skip_stem=True,
    )
    rest_params = {
        k: v for k, v in params["backbone"].items() if k != "Conv1"
    }
    feat = rest.apply({"params": rest_params}, feat1, train=False)
    return _apply_head(hp, params, feat)


def _apply_head(hp: HyperParams, params, feat):
    head = RPNHeadOnly(hp)
    head_params = {k: params[k] for k in ("rpn_conv", "rpn_cls", "rpn_reg")}
    return head.apply({"params": head_params}, feat)


def _fused_stage_from(
    hp: HyperParams, variables, x: jnp.ndarray, skip_stem: bool,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared fused-mid-stage tail: (images | Conv1 activations) -> logits.

    flax prefix (through block_6) -> fused_ir_stage -> RPN head. Both fast
    serving paths funnel here so the stage boundary (block_6/7 split,
    block_13_expand tail) lives in exactly one place.
    """
    params = variables["params"]
    bb = params["backbone"]
    prefix = MobileNetV2Backbone(
        dtype=jnp.dtype(hp.compute_dtype),
        param_dtype=jnp.dtype(hp.param_dtype),
        fold_bn=True,
        skip_stem=skip_stem,
        stop_after_block=6,
    )
    prefix_params = {
        k: bb[k] for k in _PREFIX_MODULES if not (skip_stem and k == "Conv1")
    }
    feat6 = prefix.apply({"params": prefix_params}, x, train=False)
    weights, blocks = pack_stage_weights(
        bb, _FUSED_BLOCKS, tail_expand="block_13_expand"
    )
    feat = fused_ir_stage(
        feat6.astype(jnp.bfloat16), weights, blocks, interpret=interpret
    )
    return _apply_head(hp, params, feat)


def fast_mobilenet_forward(
    hp: HyperParams, variables, images: jnp.ndarray, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """images -> (rpn_reg, rpn_cls_logits) via the fused mid-stage kernel.

    ``variables`` must be the folded-BN tree ({"params": ...} from
    model.fold_batch_norm) for the mobilenet_v2 backbone.
    """
    assert hp.backbone == "mobilenet_v2", hp.backbone
    return _fused_stage_from(hp, variables, images, skip_stem=False,
                             interpret=interpret)
