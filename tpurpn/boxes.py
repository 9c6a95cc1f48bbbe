"""Box geometry: delta encode/decode, IoU, NMS.

TPU-native rebuild of the reference's ``utils/bbox_utils`` (SURVEY.md §2 row 5).
Boxes are ``[y1, x1, y2, x2]`` in normalized image coordinates throughout (the
TF convention the reference uses).

Everything here is pure jnp with static shapes, jit/vmap/grad-compatible, and
runs identically on CPU and TPU. The NMS is an *exact* greedy NMS (same
selection as ``tf.image.non_max_suppression``) implemented blockwise so the
inner sequential loop is short and all heavy work is wide vector ops — the
structure the Pallas kernel in ``tpurpn.kernels.nms_pallas`` mirrors.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_EPS = 1e-8


# ---------------------------------------------------------------------------
# Delta encode / decode
# ---------------------------------------------------------------------------


def _box_ctr_size(boxes: jnp.ndarray):
    h = boxes[..., 2] - boxes[..., 0]
    w = boxes[..., 3] - boxes[..., 1]
    cy = boxes[..., 0] + 0.5 * h
    cx = boxes[..., 1] + 0.5 * w
    return cy, cx, h, w


def get_deltas_from_bboxes(bboxes: jnp.ndarray, gt_boxes: jnp.ndarray) -> jnp.ndarray:
    """Encode gt boxes as (dy, dx, dh, dw) deltas relative to anchor boxes.

    dy = (gt_cy - a_cy) / a_h, dh = log(gt_h / a_h) (and likewise for x/w),
    with the reference's zero-size guards: zero-size anchors are clamped to
    1e-3 and zero-size gt rows (padding) encode to all-zero deltas
    (reference: utils/bbox_utils.get_deltas_from_bboxes).

    Shapes broadcast: (..., 4) x (..., 4) -> (..., 4).
    """
    a_cy, a_cx, a_h, a_w = _box_ctr_size(bboxes)
    g_cy, g_cx, g_h, g_w = _box_ctr_size(gt_boxes)

    a_h = jnp.where(a_h == 0, 1e-3, a_h)
    a_w = jnp.where(a_w == 0, 1e-3, a_w)
    gt_h_safe = jnp.where(g_h <= 0, 1.0, g_h)
    gt_w_safe = jnp.where(g_w <= 0, 1.0, g_w)

    dy = jnp.where(g_h == 0, 0.0, (g_cy - a_cy) / a_h)
    dx = jnp.where(g_w == 0, 0.0, (g_cx - a_cx) / a_w)
    dh = jnp.where(g_h == 0, 0.0, jnp.log(gt_h_safe / a_h))
    dw = jnp.where(g_w == 0, 0.0, jnp.log(gt_w_safe / a_w))
    return jnp.stack([dy, dx, dh, dw], axis=-1)


def get_bboxes_from_deltas(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Decode (dy, dx, dh, dw) deltas against anchors -> [y1, x1, y2, x2].

    Inverse of :func:`get_deltas_from_bboxes`
    (reference: utils/bbox_utils.get_bboxes_from_deltas).
    """
    a_cy, a_cx, a_h, a_w = _box_ctr_size(anchors)
    h = jnp.exp(deltas[..., 2]) * a_h
    w = jnp.exp(deltas[..., 3]) * a_w
    cy = deltas[..., 0] * a_h + a_cy
    cx = deltas[..., 1] * a_w + a_cx
    return jnp.stack(
        [cy - 0.5 * h, cx - 0.5 * w, cy + 0.5 * h, cx + 0.5 * w], axis=-1
    )


def clip_bboxes(boxes: jnp.ndarray) -> jnp.ndarray:
    """Clip normalized boxes to the [0, 1] image window."""
    return jnp.clip(boxes, 0.0, 1.0)


def normalize_bboxes(boxes: jnp.ndarray, height, width) -> jnp.ndarray:
    """Pixel [y1,x1,y2,x2] -> normalized (reference: bbox_utils.normalize_bboxes)."""
    scale = jnp.stack(
        [jnp.asarray(height, jnp.float32), jnp.asarray(width, jnp.float32)] * 2
    )
    return boxes / scale


def denormalize_bboxes(boxes: jnp.ndarray, height, width) -> jnp.ndarray:
    """Normalized [y1,x1,y2,x2] -> pixel (reference: bbox_utils.denormalize_bboxes)."""
    scale = jnp.stack(
        [jnp.asarray(height, jnp.float32), jnp.asarray(width, jnp.float32)] * 2
    )
    return boxes * scale


# ---------------------------------------------------------------------------
# IoU
# ---------------------------------------------------------------------------


def bbox_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0.0
    )


def pairwise_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Dense pairwise IoU: (N, 4) x (M, 4) -> (N, M). Zero-area rows give 0."""
    y1 = jnp.maximum(boxes_a[:, None, 0], boxes_b[None, :, 0])
    x1 = jnp.maximum(boxes_a[:, None, 1], boxes_b[None, :, 1])
    y2 = jnp.minimum(boxes_a[:, None, 2], boxes_b[None, :, 2])
    x2 = jnp.minimum(boxes_a[:, None, 3], boxes_b[None, :, 3])
    inter = jnp.maximum(y2 - y1, 0.0) * jnp.maximum(x2 - x1, 0.0)
    union = bbox_area(boxes_a)[:, None] + bbox_area(boxes_b)[None, :] - inter
    return inter / jnp.maximum(union, _EPS)


def generate_iou_map(bboxes: jnp.ndarray, gt_boxes: jnp.ndarray) -> jnp.ndarray:
    """Batched dense IoU: (..., N, 4) x (..., M, 4) -> (..., N, M).

    Reference parity: utils/bbox_utils.generate_iou_map — the dense anchor x GT
    IoU matrix at the heart of target assignment (SURVEY.md §3.4).
    """
    y1 = jnp.maximum(bboxes[..., :, None, 0], gt_boxes[..., None, :, 0])
    x1 = jnp.maximum(bboxes[..., :, None, 1], gt_boxes[..., None, :, 1])
    y2 = jnp.minimum(bboxes[..., :, None, 2], gt_boxes[..., None, :, 2])
    x2 = jnp.minimum(bboxes[..., :, None, 3], gt_boxes[..., None, :, 3])
    inter = jnp.maximum(y2 - y1, 0.0) * jnp.maximum(x2 - x1, 0.0)
    union = (
        bbox_area(bboxes)[..., :, None] + bbox_area(gt_boxes)[..., None, :] - inter
    )
    return inter / jnp.maximum(union, _EPS)


# ---------------------------------------------------------------------------
# NMS — exact greedy, blockwise (TPU-friendly)
# ---------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nms_keep_sorted(
    boxes_sorted: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    block: int,
) -> jnp.ndarray:
    """Greedy-NMS keep mask over score-sorted boxes.

    Exact greedy semantics: a box is kept iff its IoU with every higher-scoring
    kept box is <= iou_threshold. Processes boxes in blocks: a short sequential
    loop resolves within-block suppression, then one wide (block x N) IoU sweep
    suppresses all later boxes — the same structure as the Pallas kernel.
    """
    n = boxes_sorted.shape[0]
    assert n % block == 0, "caller pads to a multiple of block"
    num_blocks = n // block
    positions = lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    blk_positions = lax.broadcasted_iota(jnp.int32, (block, 1), 0).squeeze(-1)

    def outer(i, keep):
        start = i * block
        blk = lax.dynamic_slice(boxes_sorted, (start, 0), (block, 4))
        keep_blk = lax.dynamic_slice(keep, (start,), (block,))

        # within-block sequential resolution (short loop, width-`block` vec ops)
        iou_blk = pairwise_iou(blk, blk)

        def inner(j, kb):
            suppress = (iou_blk[j] > iou_threshold) & kb[j] & (blk_positions > j)
            return kb & ~suppress

        keep_blk = lax.fori_loop(0, block, inner, keep_blk)

        # one wide sweep: kept boxes of this block suppress all later boxes
        iou_cross = pairwise_iou(blk, boxes_sorted)  # (block, n)
        suppressed = jnp.any((iou_cross > iou_threshold) & keep_blk[:, None], axis=0)
        later = positions >= (start + block)
        keep = keep & ~(suppressed & later)
        keep = lax.dynamic_update_slice(keep, keep_blk, (start,))
        return keep

    return lax.fori_loop(0, num_blocks, outer, valid)


@functools.partial(
    jax.jit, static_argnames=("max_output_size", "iou_threshold", "block")
)
def non_max_suppression(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_output_size: int,
    iou_threshold: float = 0.7,
    score_threshold: float = float("-inf"),
    block: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with ``tf.image.non_max_suppression`` selection semantics.

    Args:
      boxes: (N, 4) [y1, x1, y2, x2].
      scores: (N,).
      max_output_size: static output size k.
      iou_threshold: boxes with IoU > threshold vs a kept higher-scoring box
        are suppressed.
      score_threshold: boxes scoring <= this are dropped up front.
      block: internal tile size (multiple of 128 for TPU lanes).

    Returns:
      (indices, num_valid): indices is (k,) int32 of selected box indices in
      descending score order, padded with -1 past num_valid (TF's *padded*
      variant pads with 0; we pad with -1 so padding is unambiguous — gather
      with ``jnp.maximum(indices, 0)`` for TF-style behavior).

    Reference parity: utils/bbox_utils.non_max_suppression wrapping
    tf.image.non_max_suppression (BASELINE.json:5).
    """
    n = boxes.shape[0]
    n_pad = _round_up(max(n, block), block)

    # stable sort by descending score -> ties broken by lower original index,
    # matching TF's sort.
    order = jnp.argsort(-scores)  # jax sorts are stable
    boxes_sorted = jnp.zeros((n_pad, 4), boxes.dtype).at[:n].set(boxes[order])
    scores_sorted = jnp.full((n_pad,), -jnp.inf, scores.dtype).at[:n].set(scores[order])
    valid = scores_sorted > score_threshold

    keep = _nms_keep_sorted(boxes_sorted, valid, float(iou_threshold), block)

    # first `max_output_size` kept boxes, in score order
    positions = lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0).squeeze(-1)
    sort_key = jnp.where(keep, positions, n_pad + positions)
    first_kept = jnp.argsort(sort_key)[:max_output_size]  # sorted positions
    is_valid_out = keep[first_kept]
    orig_indices = jnp.where(
        is_valid_out, order[jnp.minimum(first_kept, n - 1)], -1
    ).astype(jnp.int32)
    num_valid = jnp.sum(is_valid_out).astype(jnp.int32)
    return orig_indices, num_valid


def batched_non_max_suppression(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_output_size: int,
    iou_threshold: float = 0.7,
    score_threshold: float = float("-inf"),
    block: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """vmap of :func:`non_max_suppression` over a leading batch axis.

    boxes (B, N, 4), scores (B, N) -> indices (B, k), num_valid (B,).
    """
    fn = functools.partial(
        non_max_suppression,
        max_output_size=max_output_size,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
        block=block,
    )
    return jax.vmap(fn)(boxes, scores)
