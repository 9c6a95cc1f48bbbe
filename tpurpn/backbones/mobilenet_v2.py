"""MobileNetV2 feature backbone (to block_13_expand_relu, stride 16).

TPU-native equivalent of the reference's
``keras.applications.MobileNetV2(include_top=False)`` tapped at the stride-16
``block_13_expand_relu`` activation (reference: models/rpn_mobilenet_v2.py,
SURVEY.md §2 row 4): the ReLU6 after block 13's 1x1 expansion conv, *before*
its stride-2 depthwise — spatial 32x32 at 500x500 input, 576 channels.

flax.linen, bf16 compute / fp32 params. SAME padding on stride-2 convs gives
the same sizes AND the same effective padding as Keras' correct_pad+VALID for
the sizes involved (500: pad (0,1); 125: pad (1,1)), so ImageNet ``.h5``
weights remain importable 1:1. Module names mirror Keras layer names.

Architecture (width multiplier 1.0), inverted residual bottlenecks
(expansion t, output channels c, stride s), through the tap:

    Conv1 3x3 s2 -> 32
    expanded_conv: t=1  c=16  s1
    block_1..2:    t=6  c=24  s2,s1
    block_3..5:    t=6  c=32  s2,s1,s1
    block_6..9:    t=6  c=64  s2,s1,s1,s1
    block_10..12:  t=6  c=96  s1
    block_13_expand (1x1 -> 576) + BN + ReLU6   <- output
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn


def relu6(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


# (num_blocks, expansion, channels, first_stride) per stage, Keras numbering
_STAGES = (
    (1, 1, 16, 1),  # expanded_conv
    (2, 6, 24, 2),  # block_1, block_2
    (3, 6, 32, 2),  # block_3..5
    (4, 6, 64, 2),  # block_6..9
    (3, 6, 96, 1),  # block_10..12
)


class _InvertedResidual(nn.Module):
    """One MobileNetV2 bottleneck: [1x1 expand] -> 3x3 dw -> 1x1 project.

    With ``fold_bn=True`` the BatchNorms are folded into conv biases
    (inference-only variant; see model.fold_batch_norm for the param
    transformation).
    """

    expansion: int
    out_ch: int
    stride: int
    block_name: str  # e.g. "block_3" or "expanded_conv"
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    fold_bn: bool = False
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv_kw = dict(
            use_bias=self.fold_bn, dtype=self.dtype, param_dtype=self.param_dtype
        )
        bn_kw = dict(
            use_running_average=not train,
            epsilon=1e-3,
            momentum=self.bn_momentum,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        nm = self.block_name
        in_ch = x.shape[-1]
        residual = x

        def maybe_bn(h, name):
            return h if self.fold_bn else nn.BatchNorm(name=name, **bn_kw)(h)

        h = x
        if self.expansion != 1:
            h = nn.Conv(in_ch * self.expansion, (1, 1), name=f"{nm}_expand", **conv_kw)(h)
            h = maybe_bn(h, f"{nm}_expand_BN")
            h = relu6(h)
        h = nn.Conv(
            h.shape[-1],
            (3, 3),
            strides=(self.stride, self.stride),
            padding="SAME",
            feature_group_count=h.shape[-1],
            name=f"{nm}_depthwise",
            **conv_kw,
        )(h)
        h = maybe_bn(h, f"{nm}_depthwise_BN")
        h = relu6(h)
        h = nn.Conv(self.out_ch, (1, 1), name=f"{nm}_project", **conv_kw)(h)
        h = maybe_bn(h, f"{nm}_project_BN")
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + residual
        return h


class MobileNetV2Backbone(nn.Module):
    """Outputs block_13_expand_relu features: (B, ceil(H/16), ceil(W/16), 576).

    ``fold_bn=True`` builds the inference-only BN-folded variant (convs carry
    biases, no BatchNorm modules); use model.fold_batch_norm to convert
    trained variables.
    """

    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    fold_bn: bool = False
    bn_momentum: float = 0.99
    # stop after this block_id and return its output (skipping the
    # block_13_expand tail): the prefix half of the small-batch fused
    # serving path (tpurpn.inference; kernels/ir_stage_pallas.py runs the
    # remaining stride-1 blocks in one Pallas kernel)
    stop_after_block: int | None = None
    # accept a precomputed Conv1 output (B, ceil(H/2), ceil(W/2), 32),
    # post-activation, instead of raw images: the space-to-depth serving
    # stem (tpurpn.inference.s2d_uint8_stem) computes Conv1 outside the module
    skip_stem: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv_kw = dict(
            use_bias=self.fold_bn, dtype=self.dtype, param_dtype=self.param_dtype
        )
        bn_kw = dict(
            use_running_average=not train,
            epsilon=1e-3,
            momentum=self.bn_momentum,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        x = x.astype(self.dtype)
        if not self.skip_stem:
            x = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME", name="Conv1", **conv_kw)(x)
            if not self.fold_bn:
                x = nn.BatchNorm(name="bn_Conv1", **bn_kw)(x)
            x = relu6(x)

        block_id = 0
        for num_blocks, expansion, channels, first_stride in _STAGES:
            for i in range(num_blocks):
                name = "expanded_conv" if block_id == 0 else f"block_{block_id}"
                x = _InvertedResidual(
                    expansion=expansion,
                    out_ch=channels,
                    stride=first_stride if i == 0 else 1,
                    block_name=name,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    fold_bn=self.fold_bn,
                    bn_momentum=self.bn_momentum,
                    name=name,
                )(x, train=train)
                if self.stop_after_block is not None and (
                    block_id == self.stop_after_block
                ):
                    return x
                block_id += 1

        # block_13 expansion only (96 * 6 = 576 channels), stride-16 tap
        x = nn.Conv(576, (1, 1), name="block_13_expand", **conv_kw)(x)
        if not self.fold_bn:
            x = nn.BatchNorm(name="block_13_expand_BN", **bn_kw)(x)
        return relu6(x)
