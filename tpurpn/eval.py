"""Evaluation metrics: proposal recall — the accuracy arbiter.

BASELINE.json:5's accuracy target is "proposal recall within 1% of the TF
reference"; recall@300 (fraction of GT boxes matched by at least one of the
top-300 proposals at IoU >= 0.5) is the north-star accuracy metric
(BASELINE.json:2). The reference has no metric code at all (it eyeballs drawn
boxes — SURVEY.md §4); this module is the rebuild's measurable replacement.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from .boxes import generate_iou_map


@functools.partial(jax.jit, static_argnames=("iou_threshold",))
def proposal_recall(
    roi_boxes: jnp.ndarray,
    num_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    iou_threshold: float = 0.5,
) -> Dict[str, jnp.ndarray]:
    """Recall of GT boxes by proposals.

    Args:
      roi_boxes: (B, P, 4) proposals (zero rows past num_valid).
      num_valid: (B,) valid proposal counts.
      gt_boxes: (B, M, 4) zero-padded GT.
      gt_labels: (B, M), -1 = padding.
      iou_threshold: a GT counts as recalled if some valid proposal overlaps
        it with IoU >= this.

    Returns dict with 'recall' (scalar), 'num_gt', 'num_recalled'.
    """
    B, P, _ = roi_boxes.shape
    iou = generate_iou_map(roi_boxes, gt_boxes)  # (B, P, M)
    prop_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (B, P), 1) < num_valid[:, None]
    )
    iou = jnp.where(prop_valid[..., None], iou, 0.0)
    best_per_gt = jnp.max(iou, axis=1)  # (B, M)
    gt_valid = gt_labels != -1
    recalled = (best_per_gt >= iou_threshold) & gt_valid
    num_gt = jnp.sum(gt_valid)
    num_recalled = jnp.sum(recalled)
    return {
        "recall": num_recalled / jnp.maximum(1, num_gt),
        "num_gt": num_gt,
        "num_recalled": num_recalled,
    }
