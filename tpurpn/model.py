"""RPN model: backbone + shared 3x3 conv head + 1x1 cls/reg branches.

TPU-native rebuild of the reference's ``models/rpn_vgg16.get_model`` /
``models/rpn_mobilenet_v2.get_model`` (SURVEY.md §3.3): a stride-16 backbone
feature map, a shared ``Conv2D(512, 3, same, relu)`` ("rpn_conv"), and two 1x1
branches — ``rpn_cls`` (anchor_count objectness channels) and ``rpn_reg``
(4*anchor_count delta channels).

Design difference from the reference: the cls branch emits **logits** (no
sigmoid baked into the conv) — the stable/fusable form for the loss; the
predictor applies the sigmoid where scores are needed. Output order matches
the reference: ``(rpn_reg, rpn_cls)``.

``get_model(hp)`` / ``init_model(model)`` mirror the reference's public API
(BASELINE.json:5 "Public API mirrors tf-rpn's get_model").
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .config import HyperParams
from .backbones import VGG16Backbone, MobileNetV2Backbone


def apply_rpn_head(hp: HyperParams, feat: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The RPN head (3x3 rpn_conv + 1x1 rpn_cls / rpn_reg), shared by RPN
    and the fast serving path (tpurpn.inference.RPNHeadOnly).

    Must be called inside an ``@nn.compact`` ``__call__`` — the convs
    register as direct children of the calling module, so the parameter
    names (rpn_conv/rpn_cls/rpn_reg) are identical wherever it is used.
    """
    conv_kw = dict(
        dtype=jnp.dtype(hp.compute_dtype),
        param_dtype=jnp.dtype(hp.param_dtype),
    )
    x = nn.Conv(512, (3, 3), padding="SAME", name="rpn_conv", **conv_kw)(feat)
    x = nn.relu(x)
    rpn_cls = nn.Conv(hp.anchor_count, (1, 1), name="rpn_cls", **conv_kw)(x)
    rpn_reg = nn.Conv(4 * hp.anchor_count, (1, 1), name="rpn_reg", **conv_kw)(x)
    # head outputs in fp32: small tensors, and the loss/decode math wants
    # full precision
    return rpn_reg.astype(jnp.float32), rpn_cls.astype(jnp.float32)


class RPN(nn.Module):
    """Flax module: image batch -> (rpn_reg, rpn_cls_logits)."""

    hp: HyperParams
    fold_bn: bool = False  # inference-only BN-folded variant

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        hp = self.hp
        dtype = jnp.dtype(hp.compute_dtype)
        param_dtype = jnp.dtype(hp.param_dtype)
        if hp.backbone == "vgg16":
            backbone = VGG16Backbone(
                dtype=dtype, param_dtype=param_dtype, name="backbone"
            )
        elif hp.backbone == "mobilenet_v2":
            backbone = MobileNetV2Backbone(
                dtype=dtype,
                param_dtype=param_dtype,
                fold_bn=self.fold_bn,
                bn_momentum=hp.bn_momentum,
                name="backbone",
            )
        else:  # pragma: no cover - config validates earlier
            raise ValueError(f"unknown backbone {hp.backbone!r}")

        feat = backbone(images, train=train)
        return apply_rpn_head(hp, feat)


@dataclasses.dataclass
class RPNModel:
    """Thin convenience wrapper pairing the module with its hyper params.

    Keeps the reference's ``model = get_model(hp)`` call shape while staying
    functional underneath (flax init/apply).
    """

    hp: HyperParams
    module: RPN

    def init(self, key: jax.Array, sample: jnp.ndarray | None = None):
        """Initialize variables ({'params': ..., 'batch_stats': ...?})."""
        if sample is None:
            sample = jnp.zeros((1, self.hp.img_size, self.hp.img_size, 3), jnp.float32)
        return self.module.init(key, sample, train=False)

    def apply(self, variables, images, train: bool = False, **kw):
        """Forward pass -> (rpn_reg, rpn_cls_logits). With train=True and a
        batch_stats collection present, pass mutable=['batch_stats'] via kw."""
        return self.module.apply(variables, images, train=train, **kw)


def get_model(hp: HyperParams) -> RPNModel:
    """Mirror of the reference's ``get_model(hyper_params)``."""
    return RPNModel(hp=hp, module=RPN(hp=hp))


def init_model(model: RPNModel, key: jax.Array | None = None):
    """Mirror of the reference's ``init_model`` (dummy forward to build).

    In JAX, initialization IS the dummy forward; returns the variables.
    """
    if key is None:
        key = jax.random.key(0)
    return model.init(key)


def fold_batch_norm(hp: HyperParams, variables):
    """Fold BatchNorms into conv weights/biases for inference.

    Standard inference optimization (absent in the reference, which pays the
    BN elementwise passes every predict): with frozen statistics,
    BN(conv(x)) == conv'(x) where kernel' = kernel * g and bias' = beta -
    mean * g, g = gamma / sqrt(var + eps). Removes ~34 elementwise passes
    over large activations from the MobileNetV2 forward.

    Returns (folded_model, folded_variables) for an RPN(fold_bn=True) module;
    VGG16 has no BN and is returned as-is (minus batch_stats). The returned
    variables are committed to the default device: weights loaded from .h5
    arrive as host numpy, and leaves that skip the fold math (the BN-less
    head convs — rpn_conv alone is 10.6 MB) would otherwise stay
    host-resident and be re-uploaded through the dispatch path on every
    inference call (~10 ms/call through the axon tunnel; see
    benchmarks/exp_trained_fwd.py for the measurement).
    """
    import numpy as np

    model = RPNModel(hp=hp, module=RPN(hp=hp, fold_bn=True))
    if hp.backbone != "mobilenet_v2":
        return model, jax.device_put({"params": variables["params"]})

    params = jax.tree_util.tree_map(lambda x: x, variables["params"])  # copy
    stats = variables["batch_stats"]
    eps = 1e-3

    def fold_into(conv_params, bn_params, bn_stats):
        g = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
        out = {"kernel": conv_params["kernel"] * g}
        bias = bn_params["bias"] - bn_stats["mean"] * g
        if "bias" in conv_params:
            bias = bias + conv_params["bias"] * g
        out["bias"] = bias
        return out

    bb, sbb = dict(params["backbone"]), stats["backbone"]
    new_bb = {}
    for name, sub in bb.items():
        if name.endswith("_BN") or name == "bn_Conv1":
            continue  # consumed by its conv
        if name == "Conv1":
            new_bb[name] = fold_into(sub, bb["bn_Conv1"], sbb["bn_Conv1"])
        elif name == "block_13_expand":
            new_bb[name] = fold_into(
                sub, bb["block_13_expand_BN"], sbb["block_13_expand_BN"]
            )
        elif isinstance(sub, dict) and any(k.endswith("_BN") for k in sub):
            blk = {}
            for k, conv in sub.items():
                if k.endswith("_BN"):
                    continue
                blk[k] = fold_into(conv, sub[f"{k}_BN"], sbb[name][f"{k}_BN"])
            new_bb[name] = blk
        else:
            new_bb[name] = sub

    new_params = {k: v for k, v in params.items() if k != "backbone"}
    new_params["backbone"] = new_bb
    return model, jax.device_put({"params": new_params})
