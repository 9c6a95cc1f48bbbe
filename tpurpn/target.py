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
distributional contract: a random subset of the candidate mask.

**One selection contract, both backends.** Subsampling ranks candidates by
unique 28-bit keys — the top random bits of a per-anchor random word above
the anchor index (:func:`selection_keys`) — and keeps the k smallest. The
Pallas kernel (kernels/target_pallas.fused_rpn_targets) and the pure-jnp
path here consume the **same** ``jax.random.bits``-derived words, so a run
selects bit-identical anchor subsets on CPU and TPU. Key uniqueness makes
k-th-smallest selection exact; the cost is a deterministic low-index
tie-break when random fields collide — a ~k/2**(28 - lane_bits) bias toward
low anchor indices, negligible at k=128 (~0.8% of picks for the 500x500
grids) and documented here rather than papered over.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .boxes import generate_iou_map, get_deltas_from_bboxes
from .config import HyperParams

KEY_SENTINEL = 1 << 29  # above any real selection key (< 2**28)


def _lane_bits_for(n: int) -> int:
    """Width of the anchor-index field in the 28-bit selection keys.

    14 for every grid up to 16384 anchors (the standard 500x500 grids);
    wider for larger grids so the lane index never overlaps the random-rank
    bits. At least 8 random bits must remain or the subsample would become
    mostly index-ordered — grids beyond 2**20 anchors fail loudly here.
    """
    bits = max(14, (n - 1).bit_length())
    if bits > 20:
        raise ValueError(
            f"anchor grid of {n} anchors needs a {bits}-bit index field, "
            "leaving <8 random rank bits in the 28-bit selection keys; "
            "widen the key (see tpurpn/target.py) to support it"
        )
    return bits


def selection_keys(rand_words: jnp.ndarray, n: int) -> jnp.ndarray:
    """Unique 28-bit selection keys from (..., n) int32 random words.

    key = (top (28 - lane_bits) random bits << lane_bits) | anchor_index.
    Bit-identical to the Pallas kernel's in-VMEM key rule (_make_key_row).
    """
    lane_bits = _lane_bits_for(n)
    lane = jnp.arange(n, dtype=jnp.int32)
    hi = jnp.left_shift(
        lax.shift_right_logical(rand_words, 32 - (28 - lane_bits)), lane_bits
    )
    return jnp.bitwise_or(hi, lane)


def select_by_keys(
    cand: jnp.ndarray,
    rand_words: jnp.ndarray,
    k_eff: jnp.ndarray,
    k_max: int | None = None,
) -> jnp.ndarray:
    """Keep the ``k_eff`` candidates with the smallest selection keys.

    cand: (B, N) bool candidate mask; rand_words: (B, N) int32;
    k_eff: (B,) float — number to keep (callers pass
    min(budget, available)). Returns the (B, N) bool selected mask.
    This is THE subsampling rule of the framework — the Pallas target kernel
    computes the identical selection in-kernel from the same words.

    ``k_max``: static upper bound on ``k_eff``. When given, the threshold
    comes from one ``lax.top_k(k_max)`` instead of a full O(N log N) sort
    — the train-step callers bound it by hp.total_pos/minibatch size.
    Selection is identical either way (same k-th-smallest threshold).
    """
    N = cand.shape[-1]
    keys = jnp.where(cand, selection_keys(rand_words, N), KEY_SENTINEL)
    if k_max is not None and k_max < N:
        # top_k of the negated keys = the k_max smallest keys, ascending
        neg_top, _ = jax.lax.top_k(-keys, k_max)
        sorted_keys = -neg_top
        k_idx = jnp.clip(k_eff.astype(jnp.int32) - 1, 0, k_max - 1)
    else:
        sorted_keys = jnp.sort(keys, axis=-1)
        k_idx = jnp.clip(k_eff.astype(jnp.int32) - 1, 0, N - 1)
    thr = jnp.take_along_axis(sorted_keys, k_idx[:, None], axis=1)
    thr = jnp.where(k_eff[:, None] > 0, thr, -1)
    return keys <= thr


def target_rand_bits(key: jax.Array, batch: int, n: int) -> jnp.ndarray:
    """(B, 2, N) int32 random words for pos (row 0) / neg (row 1) sampling.

    The single source of selection randomness for BOTH backends of
    :func:`calculate_rpn_actual_outputs`.
    """
    return lax.bitcast_convert_type(
        jax.random.bits(key, (batch, 2, n)), jnp.int32
    )


def random_select_mask(
    mask: jnp.ndarray, max_count, key: jax.Array, k_max: int | None = None
) -> jnp.ndarray:
    """Keep a uniformly-random subset of at most ``max_count`` True entries.

    API-parity mirror of the reference's ``randomly_select_xyz_mask`` (random
    ranking of masked entries, keep the first k), kept for users migrating
    from the reference. The production target path uses
    :func:`select_by_keys` instead — the key-based rule both backends share
    bit-for-bit. ``mask`` is (..., N) bool; ``max_count`` is a scalar or
    broadcastable (...,) int.

    ``k_max``: static upper bound on ``max_count``. When given, selection is
    one ``lax.top_k(k_max)`` + scatter instead of two full argsorts over N.
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

    # the single source of selection randomness: both backends rank
    # candidates by the same key rule over the same words, so a run selects
    # bit-identical anchor subsets on CPU and TPU
    rand_bits = target_rand_bits(key, B, N)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        # the fully-fused north-star kernel (BASELINE.json:5): IoU matrix +
        # matching + balanced pos/neg sampling + delta encode in one Pallas
        # kernel
        from .kernels.target_pallas import fused_rpn_targets

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

    pos_cand = merged_iou > hp.pos_threshold

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
    pos_cand = pos_cand | forced

    avail_pos = jnp.sum(pos_cand, axis=-1).astype(jnp.float32)
    pos_mask = select_by_keys(
        pos_cand, rand_bits[:, 0],
        jnp.minimum(float(hp.total_pos_bboxes), avail_pos),
        k_max=hp.total_pos_bboxes,
    )
    pos_count = jnp.sum(pos_mask, axis=-1).astype(jnp.float32)  # (B,)

    neg_cand = (merged_iou < hp.neg_threshold) & ~pos_mask
    avail_neg = jnp.sum(neg_cand, axis=-1).astype(jnp.float32)
    neg_mask = select_by_keys(
        neg_cand, rand_bits[:, 1],
        jnp.minimum(
            float(hp.total_pos_bboxes + hp.total_neg_bboxes) - pos_count,
            avail_neg,
        ),
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
