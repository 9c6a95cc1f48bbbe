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

import jax.numpy as jnp
import flax.linen as nn

from .backbones.mobilenet_v2 import MobileNetV2Backbone
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


def fast_mobilenet_forward(
    hp: HyperParams, variables, images: jnp.ndarray, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """images -> (rpn_reg, rpn_cls_logits) via the fused mid-stage kernel.

    ``variables`` must be the folded-BN tree ({"params": ...} from
    model.fold_batch_norm) for the mobilenet_v2 backbone.
    """
    assert hp.backbone == "mobilenet_v2", hp.backbone
    params = variables["params"]
    bb = params["backbone"]

    prefix = MobileNetV2Backbone(
        dtype=jnp.dtype(hp.compute_dtype),
        param_dtype=jnp.dtype(hp.param_dtype),
        fold_bn=True,
        stop_after_block=6,
    )
    prefix_params = {k: bb[k] for k in _PREFIX_MODULES}
    feat6 = prefix.apply({"params": prefix_params}, images, train=False)

    weights, blocks = pack_stage_weights(
        bb, _FUSED_BLOCKS, tail_expand="block_13_expand"
    )
    feat = fused_ir_stage(
        feat6.astype(jnp.bfloat16), weights, blocks, interpret=interpret
    )

    head = RPNHeadOnly(hp)
    head_params = {k: params[k] for k in ("rpn_conv", "rpn_cls", "rpn_reg")}
    return head.apply({"params": head_params}, feat)
