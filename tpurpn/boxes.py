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


def _nms_keep_sorted_batched(
    boxes_sorted: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    block: int,
    max_output: int,
) -> jnp.ndarray:
    """Greedy-NMS keep masks over batched score-sorted boxes: (B,n,4) -> (B,n).

    Exact greedy semantics (identical selection to tf.image.non_max_suppression):
    a box is kept iff its IoU with every higher-scoring kept box is
    <= iou_threshold, and per-image processing stops once max_output boxes
    are kept.

    TPU-friendly structure — the batch dimension lives INSIDE every op (wide
    VPU work, no vmap-of-while lane masking), and there is no O(n) sequential
    loop:
    * boxes are processed block-by-block in score order;
    * each block is screened against the per-image **kept-box buffer** (one
      (B, block, kmax) IoU sweep) — suppression only flows forward, so
      earlier kept boxes fully determine cross-block suppression;
    * within-block suppression is resolved by **fixed-point iteration** of
      m[j] = alive[j] & !any_{i<j}(m[i] & iou[i,j] > thr) — the greedy keep
      set is this map's unique fixpoint (induction over sorted index), and
      iteration t settles every box with suppression-chain depth <= t, so it
      converges in a handful of wide sweeps instead of `block` sequential
      steps;
    * the outer while_loop **early-exits** once every image has max_output
      kept boxes; images that finish early are frozen (no further keeps),
      exactly TF's stop-at-max_output behavior.

    Work: O(processed_blocks * B * block * (kmax + block)) vs the naive
    O(B * n^2) — and processed_blocks is small because scores are sorted.
    """
    B, n, _ = boxes_sorted.shape
    assert n % block == 0, "caller pads to a multiple of block"
    num_blocks = n // block
    kmax = _round_up(max_output + block, block)
    tri = (
        lax.broadcasted_iota(jnp.int32, (block, block), 0)
        < lax.broadcasted_iota(jnp.int32, (block, block), 1)
    )  # tri[i, j] = i < j : earlier box i can suppress later box j
    buf_slot = lax.broadcasted_iota(jnp.int32, (B, kmax), 1)
    batch_idx = lax.broadcasted_iota(jnp.int32, (B, block), 0)

    def _iou_bmm(a, b):
        """Batched pairwise IoU: (B, P, 4) x (B, Q, 4) -> (B, P, Q)."""
        return generate_iou_map(a, b)

    def cond(state):
        i, kept_count, _, _ = state
        return (i < num_blocks) & jnp.any(kept_count < max_output)

    def body(state):
        i, kept_count, keep, buf = state
        start = i * block
        blk = lax.dynamic_slice_in_dim(boxes_sorted, start, block, axis=1)
        valid_blk = lax.dynamic_slice_in_dim(valid, start, block, axis=1)
        active_img = kept_count < max_output  # frozen images keep nothing more

        # screen against all previously-kept boxes of each image
        iou_buf = _iou_bmm(blk, buf)  # (B, block, kmax)
        buf_active = buf_slot < kept_count[:, None]  # (B, kmax)
        suppressed = jnp.any(
            (iou_buf > iou_threshold) & buf_active[:, None, :], axis=2
        )
        alive = valid_blk & ~suppressed & active_img[:, None]

        # within-block greedy via fixpoint iteration (global convergence)
        over = _iou_bmm(blk, blk) > iou_threshold  # (B, block, block)
        over_tri = over & tri[None]

        def fix_cond(c):
            return c[1]

        def fix_body(c):
            m, _ = c
            sup = jnp.any(over_tri & m[:, :, None], axis=1)  # (B, block)
            m_new = alive & ~sup
            return m_new, jnp.any(m_new != m)

        m, _ = lax.while_loop(fix_cond, fix_body, (alive, True))

        # append each image's kept boxes to its buffer (compacting scatter)
        pos = kept_count[:, None] + jnp.cumsum(m, axis=1) - 1
        pos = jnp.where(m, pos, kmax)  # out-of-bounds -> dropped
        buf = buf.at[batch_idx, pos].set(blk, mode="drop")
        keep = lax.dynamic_update_slice_in_dim(keep, m, start, axis=1)
        kept_count = kept_count + jnp.sum(m, axis=1, dtype=jnp.int32)
        return i + 1, kept_count, keep, buf

    state = (
        jnp.int32(0),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B, n), bool),
        jnp.zeros((B, kmax, 4), boxes_sorted.dtype),
    )
    _, _, keep, _ = lax.while_loop(cond, body, state)
    return keep


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_output_size",
        "iou_threshold",
        "score_threshold",
        "block",
        "presorted",
        "use_pallas",
    ),
)
def batched_non_max_suppression(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_output_size: int,
    iou_threshold: float = 0.7,
    score_threshold: float = float("-inf"),
    block: int = 128,
    presorted: bool = False,
    use_pallas: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched greedy NMS with ``tf.image.non_max_suppression`` semantics.

    Args:
      boxes: (B, N, 4) [y1, x1, y2, x2].
      scores: (B, N).
      max_output_size: static output size k.
      iou_threshold: boxes with IoU > threshold vs a kept higher-scoring box
        are suppressed.
      score_threshold: boxes scoring <= this are dropped up front.
      block: internal tile size (multiple of 128 for TPU lanes).
      presorted: set True when boxes/scores are already in descending score
        order (e.g. straight out of lax.top_k) to skip the internal sort.
      use_pallas: run the Pallas TPU kernel (tpurpn.kernels.nms_pallas) for
        the keep-mask computation; None (default) auto-selects it on TPU.
        Both paths produce identical selections.

    Returns:
      (indices, num_valid): indices is (B, k) int32 of selected box indices in
      descending score order, padded with -1 past num_valid (TF's *padded*
      variant pads with 0; we pad with -1 so padding is unambiguous — gather
      with ``jnp.maximum(indices, 0)`` for TF-style behavior).

    Reference parity: utils/bbox_utils.non_max_suppression wrapping
    tf.image.non_max_suppression (BASELINE.json:5).
    """
    B, n = scores.shape
    n_pad = _round_up(max(n, block), block)

    if presorted:
        order = None
        boxes_sorted, scores_sorted = boxes, scores
    else:
        # stable sort by descending score -> ties broken by lower original
        # index, matching TF's sort (jax sorts are stable).
        order = jnp.argsort(-scores, axis=-1)  # (B, n)
        boxes_sorted = jnp.take_along_axis(boxes, order[..., None], axis=1)
        scores_sorted = jnp.take_along_axis(scores, order, axis=1)
    if n_pad > n:
        boxes_sorted = jnp.pad(boxes_sorted, ((0, 0), (0, n_pad - n), (0, 0)))
        scores_sorted = jnp.pad(
            scores_sorted, ((0, 0), (0, n_pad - n)), constant_values=-jnp.inf
        )
    valid = scores_sorted > score_threshold

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from .kernels.nms_pallas import nms_pallas_keep

        # interpret off-TPU: an explicit use_pallas=True on CPU runs the
        # SAME kernel through the Pallas interpreter, so the production glue
        # below (keep-mask -> index compaction) is testable without a chip
        keep, _ = nms_pallas_keep(
            boxes_sorted, valid, float(iou_threshold), max_output_size, block,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        keep = _nms_keep_sorted_batched(
            boxes_sorted, valid, float(iou_threshold), block, max_output_size
        )

    # first `max_output_size` kept boxes per image, in score order: top-k of
    # (kept first, then by position) — cheaper than a full argsort. k may
    # exceed the candidate count (e.g. tiny images): clamp and pad.
    positions = lax.broadcasted_iota(jnp.int32, (B, n_pad), 1)
    sort_key = jnp.where(keep, positions, n_pad + positions)
    k_eff = min(max_output_size, n_pad)
    _, first_kept = lax.top_k(-sort_key, k_eff)
    if k_eff < max_output_size:
        first_kept = jnp.pad(
            first_kept, ((0, 0), (0, max_output_size - k_eff)),
            constant_values=n_pad - 1,
        )
    is_valid_out = jnp.take_along_axis(keep, first_kept, axis=1)
    if k_eff < max_output_size:
        is_valid_out = is_valid_out.at[:, k_eff:].set(False)
    safe_kept = jnp.minimum(first_kept, n - 1)
    unsorted_indices = (
        safe_kept if order is None else jnp.take_along_axis(order, safe_kept, axis=1)
    )
    orig_indices = jnp.where(is_valid_out, unsorted_indices, -1).astype(jnp.int32)
    num_valid = jnp.sum(is_valid_out, axis=-1).astype(jnp.int32)
    return orig_indices, num_valid


def non_max_suppression(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_output_size: int,
    iou_threshold: float = 0.7,
    score_threshold: float = float("-inf"),
    block: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-image greedy NMS: (N, 4), (N,) -> ((k,) indices, num_valid).

    Thin wrapper over :func:`batched_non_max_suppression` (see there for
    semantics and reference parity notes).
    """
    idx, nv = batched_non_max_suppression(
        boxes[None],
        scores[None],
        max_output_size=max_output_size,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
        block=block,
    )
    return idx[0], nv[0]
