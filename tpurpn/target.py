"""RPN training-target assignment — the algorithmic core (SURVEY.md §3.4).

TPU-native rebuild of the reference's
``utils/train_utils.calculate_rpn_actual_outputs`` and
``randomly_select_xyz_mask``. Every correctness property the reference
guarantees is reproduced here with static shapes so the whole thing jits and
runs **on-device inside the train step** (the reference runs it host-side in a
Python generator per step — its structural bottleneck, SURVEY.md §3.1):

* dense anchor x GT IoU matching (best GT per anchor),
* positives = IoU > pos_threshold, PLUS the forced best-anchor-per-valid-GT
  (guarantees every GT gets at least one positive anchor),
* balanced random subsampling: <= total_pos_bboxes positives, and negatives
  fill the remainder of the (total_pos + total_neg) minibatch,
* labels: 1 = positive, 0 = negative, -1 = ignore,
* regression targets: encoded deltas / variances, dense over the anchor grid,
  zero outside positives.

Randomness uses explicit ``jax.random`` keys (functional, reproducible) in
place of the reference's stateful ``tf.random.uniform`` ranking trick — same
distributional contract: a uniformly random subset of the candidate mask.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import generate_iou_map, get_deltas_from_bboxes
from .config import HyperParams


def random_select_mask(
    mask: jnp.ndarray, max_count, key: jax.Array, k_max: int | None = None
) -> jnp.ndarray:
    """Keep a uniformly-random subset of at most ``max_count`` True entries.

    ``mask`` is (..., N) bool; ``max_count`` is a scalar or broadcastable
    (...,) int. Mirrors the reference's ``randomly_select_xyz_mask`` (random
    ranking of masked entries, keep the first k).

    ``k_max``: static upper bound on ``max_count``. When given, selection is
    one ``lax.top_k(k_max)`` + scatter instead of two full argsorts over N —
    the train-step callers bound it by hp.total_pos/neg_bboxes.
    """
    r = jax.random.uniform(key, mask.shape)
    scores = jnp.where(mask, r, -1.0)
    limit = jnp.asarray(max_count)
    if k_max is not None and k_max < mask.shape[-1]:
        v, idx = jax.lax.top_k(scores, k_max)  # (..., k_max) descending
        ranks = jnp.arange(k_max)
        sel = (ranks < limit[..., None] if limit.ndim else ranks < limit) & (
            v >= 0.0  # uniform r is >= 0; excluded entries carry -1
        )
        return jnp.put_along_axis(
            jnp.zeros(mask.shape, bool), idx, sel, axis=-1, inplace=False
        )
    order = jnp.argsort(-scores, axis=-1)
    ranks = jnp.argsort(order, axis=-1)  # rank of each entry in desc order
    if limit.ndim:
        limit = limit[..., None]
    return mask & (ranks < limit)


def iou_matching(
    anchors: jnp.ndarray, gt_boxes: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense IoU matching reductions (pure-jnp twin of the Pallas kernel).

    Returns (merged_iou (B,N), best_gt_per_anchor (B,N), best_anchor_per_gt
    (B,M)). The Pallas version (kernels/target_pallas.fused_iou_matching)
    computes the same without materializing the (B, N, M) IoU tensor.
    """
    iou_map = generate_iou_map(anchors[None], gt_boxes)  # (B, N, M)
    return (
        jnp.max(iou_map, axis=2),
        jnp.argmax(iou_map, axis=2),
        jnp.argmax(iou_map, axis=1),
    )


def calculate_rpn_actual_outputs(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    hp: HyperParams,
    key: jax.Array,
    use_pallas: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute dense RPN regression + objectness targets for a batch.

    Args:
      anchors: (N, 4) normalized [y1, x1, y2, x2] anchor grid.
      gt_boxes: (B, M, 4) normalized GT boxes, zero-padded rows.
      gt_labels: (B, M) int labels, -1 for padding rows (reference pads
        labels with -1 in padded_batch — SURVEY.md §2 row 7).
      hp: hyper parameters.
      key: PRNG key for balanced subsampling.

    Returns:
      bbox_deltas: (B, fm, fm, anchor_count*4) float32 — encoded deltas /
        variances at positive anchors, zero elsewhere.
      bbox_labels: (B, fm, fm, anchor_count) float32 in {1, 0, -1}.
    """
    B = gt_boxes.shape[0]
    N = anchors.shape[0]
    fm, A = hp.feature_map_shape, hp.anchor_count
    assert N == fm * fm * A, (N, fm, A)

    pos_key, neg_key = jax.random.split(key)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        # the fully-fused north-star kernel (BASELINE.json:5): IoU matrix +
        # matching + balanced pos/neg sampling + delta encode in one Pallas
        # kernel; random ranking words come from the same functional key
        from jax import lax

        from .kernels.target_pallas import fused_rpn_targets

        rand_bits = lax.bitcast_convert_type(
            jax.random.bits(key, (B, 2, N)), jnp.int32
        )
        deltas, labels = fused_rpn_targets(
            anchors, gt_boxes, gt_labels, rand_bits, hp
        )
        return (
            deltas.reshape(B, fm, fm, A * 4),
            labels.reshape(B, fm, fm, A),
        )

    merged_iou, best_gt_per_anchor, best_anchor_per_gt = iou_matching(
        anchors, gt_boxes
    )

    pos_mask = merged_iou > hp.pos_threshold

    # forced positive: the best anchor of every *valid* GT (padding rows have
    # label -1 and must not force anchor 0 positive). Scatter-free one-hot
    # formulation: shards over the batch axis with no collectives, and XLA
    # fuses it into the IoU reduction.
    valid_gt = gt_labels != -1  # (B, M)
    anchor_ids = jax.lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
    forced = jnp.any(
        (best_anchor_per_gt[:, None, :] == anchor_ids) & valid_gt[:, None, :],
        axis=2,
    )  # (B, N)
    pos_mask = pos_mask | forced

    pos_mask = random_select_mask(
        pos_mask, hp.total_pos_bboxes, pos_key, k_max=hp.total_pos_bboxes
    )
    pos_count = jnp.sum(pos_mask, axis=-1)  # (B,)
    neg_count = (hp.total_pos_bboxes + hp.total_neg_bboxes) - pos_count

    neg_mask = (merged_iou < hp.neg_threshold) & ~pos_mask
    neg_mask = random_select_mask(
        neg_mask, neg_count, neg_key,
        k_max=hp.total_pos_bboxes + hp.total_neg_bboxes,
    )

    labels = jnp.where(pos_mask, 1.0, jnp.where(neg_mask, 0.0, -1.0)).astype(
        jnp.float32
    )

    # regression targets: matched GT box per positive anchor, encoded / variances
    gt_boxes_map = jnp.take_along_axis(
        gt_boxes, best_gt_per_anchor[..., None], axis=1
    )  # (B, N, 4)
    expanded_gt = jnp.where(pos_mask[..., None], gt_boxes_map, 0.0)
    deltas = get_deltas_from_bboxes(anchors[None], expanded_gt) / jnp.asarray(
        hp.variances, dtype=jnp.float32
    )

    bbox_deltas = deltas.reshape(B, fm, fm, A * 4)
    bbox_labels = labels.reshape(B, fm, fm, A)
    return bbox_deltas, bbox_labels
