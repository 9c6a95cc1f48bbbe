"""tpurpn — a TPU-native Region Proposal Network framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
TensorFlow implementation (FurkanOM/tf-rpn): VGG16 / MobileNetV2 backbones with
a 3x3 RPN head and 1x1 objectness / box-delta branches, dense anchor x GT IoU
matching with balanced positive/negative sampling, smooth-L1 + BCE training,
and sorted-top-k NMS proposal selection — designed TPU-first (static shapes,
bf16 MXU compute, data-parallel jit over a device mesh, Pallas hot kernels).

Public API mirrors the reference (BASELINE.json:5): ``get_model``, anchor
utils, delta encode/decode, ``non_max_suppression``, trainer/predictor entry
points.
"""

from .config import HyperParams, get_hyper_params, feature_map_shape_for
from .anchors import generate_anchors, generate_base_anchors
from .boxes import (
    get_deltas_from_bboxes,
    get_bboxes_from_deltas,
    generate_iou_map,
    non_max_suppression,
    batched_non_max_suppression,
    normalize_bboxes,
    denormalize_bboxes,
    clip_bboxes,
)

__version__ = "0.5.0"


def __getattr__(name):
    """Lazy top-level conveniences (avoid importing flax/optax on light use)."""
    if name in ("get_model", "init_model", "fold_batch_norm", "RPNModel"):
        from . import model

        return getattr(model, name)
    if name == "make_predict_fn":
        from .predict import make_predict_fn

        return make_predict_fn
    if name in ("make_train_step", "make_scan_train_steps", "create_train_state",
                "rpn_generator", "get_step_size"):
        from . import train

        return getattr(train, name)
    if name == "proposal_recall":
        from .eval import proposal_recall

        return proposal_recall
    raise AttributeError(f"module 'tpurpn' has no attribute {name!r}")


__all__ = [
    "HyperParams",
    "get_hyper_params",
    "feature_map_shape_for",
    "generate_anchors",
    "generate_base_anchors",
    "get_deltas_from_bboxes",
    "get_bboxes_from_deltas",
    "generate_iou_map",
    "non_max_suppression",
    "batched_non_max_suppression",
    "normalize_bboxes",
    "denormalize_bboxes",
    "clip_bboxes",
    "get_model",
    "init_model",
    "fold_batch_norm",
    "make_predict_fn",
    "make_train_step",
    "make_scan_train_steps",
    "create_train_state",
    "rpn_generator",
    "get_step_size",
    "proposal_recall",
    "__version__",
]
