"""Fused dense anchor x GT IoU + matching as a Pallas TPU kernel.

BASELINE.json:5: "anchor-grid generation, bbox delta encode/decode, and the
dense anchor x GT IoU matrix with pos/neg anchor sampling fuse into Pallas
kernels". This kernel fuses the IoU matrix with all three matching reductions
— the (B, N, M) IoU tensor (the largest intermediate of the training step,
SURVEY.md §3.4) never touches HBM:

  merged_iou[b, n]          = max_m IoU(anchor n, gt[b, m])
  best_gt_per_anchor[b, n]  = argmax_m IoU (first max, like jnp.argmax)
  best_anchor_per_gt[b, m]  = argmax_n IoU (first max)

Layout: anchors along **lanes** (tiles of 512), gt boxes along **sublanes**
(padded to 64) — so the per-anchor reductions are sublane reductions that
write rows straight into the outputs, and the per-gt reduction is a running
lane-reduction accumulated in VMEM scratch across anchor tiles.

The pure-jnp twin is ``tpurpn.target.iou_matching``. ``fused_rpn_targets``
below goes further — the full north-star target pipeline (matching +
forced-positive + balanced pos/neg subsampling + delta encoding) in one
kernel; only the dense per-anchor deltas/labels ever leave it.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._util import round_up as _round_up

from ..target import _lane_bits_for

_BIG = 2**30  # plain int: a jnp constant would be captured as a traced value


def _iou_matching_phase(
    anchor_planes_ref,  # (8, n_pad) f32: y1,x1,y2,x2,... (shared)
    gt_planes_ref,  # (1, 8, m_pad) f32: y1,x1,y2,x2 rows per image
    col_max_scr,  # (m_pad, 1) f32 scratch
    col_arg_scr,  # (m_pad, 1) i32 scratch
    write_merged,  # (start, (1, tile) f32) -> None: per-anchor best IoU
    write_best_gt,  # (start, (1, tile) i32) -> None: per-anchor argmax GT
    *,
    n_pad: int,
    m_pad: int,
    tile: int,
):
    """The fused IoU + matching reduction shared by BOTH kernels — ONE
    implementation so a future change to the reduction (tie-break, epsilon)
    cannot desynchronize fused_iou_matching from fused_rpn_targets' phase 1
    and silently break their bit-parity contract. Leaves the per-GT best
    anchor in col_arg_scr; per-anchor rows go through the writer callbacks
    (the two kernels store them in differently-shaped refs/scratch)."""
    num_tiles = n_pad // tile

    # gt coordinates as columns (m_pad, 1)
    g_y1 = jnp.transpose(gt_planes_ref[0, 0:1, :])
    g_x1 = jnp.transpose(gt_planes_ref[0, 1:2, :])
    g_y2 = jnp.transpose(gt_planes_ref[0, 2:3, :])
    g_x2 = jnp.transpose(gt_planes_ref[0, 3:4, :])
    g_area = jnp.maximum(g_y2 - g_y1, 0.0) * jnp.maximum(g_x2 - g_x1, 0.0)

    col_max_scr[...] = jnp.full((m_pad, 1), -1.0, jnp.float32)
    col_arg_scr[...] = jnp.zeros((m_pad, 1), jnp.int32)

    gt_ids = lax.broadcasted_iota(jnp.int32, (m_pad, tile), 0)
    lane_ids = lax.broadcasted_iota(jnp.int32, (m_pad, tile), 1)

    def body(t, _):
        start = pl.multiple_of(t * tile, tile)
        a_y1 = anchor_planes_ref[0:1, pl.ds(start, tile)]  # (1, tile) rows
        a_x1 = anchor_planes_ref[1:2, pl.ds(start, tile)]
        a_y2 = anchor_planes_ref[2:3, pl.ds(start, tile)]
        a_x2 = anchor_planes_ref[3:4, pl.ds(start, tile)]
        a_area = jnp.maximum(a_y2 - a_y1, 0.0) * jnp.maximum(a_x2 - a_x1, 0.0)

        ih = jnp.maximum(jnp.minimum(g_y2, a_y2) - jnp.maximum(g_y1, a_y1), 0.0)
        iw = jnp.maximum(jnp.minimum(g_x2, a_x2) - jnp.maximum(g_x1, a_x1), 0.0)
        inter = ih * iw  # (m_pad, tile)
        union = jnp.maximum(g_area + a_area - inter, 1e-8)
        iou = inter / union  # zero-area rows (padded gt) -> 0

        # per-anchor reductions over gt (sublanes)
        merged = jnp.max(iou, axis=0, keepdims=True)  # (1, tile)
        first_max_gt = jnp.min(
            jnp.where(iou == merged, gt_ids, _BIG), axis=0, keepdims=True
        )
        write_merged(start, merged)
        write_best_gt(start, first_max_gt)

        # per-gt running max over anchors (lanes)
        tile_max = jnp.max(iou, axis=1, keepdims=True)  # (m_pad, 1)
        tile_arg = jnp.min(
            jnp.where(iou == tile_max, lane_ids + start, _BIG),
            axis=1,
            keepdims=True,
        )
        better = tile_max > col_max_scr[...]
        col_arg_scr[...] = jnp.where(better, tile_arg, col_arg_scr[...])
        col_max_scr[...] = jnp.maximum(tile_max, col_max_scr[...])
        return 0

    lax.fori_loop(0, num_tiles, body, 0)


def _matching_kernel(
    anchor_planes_ref,  # (8, n_pad) f32: y1,x1,y2,x2,valid,0,0,0 (shared)
    gt_planes_ref,  # (1, 8, m_pad) f32: y1,x1,y2,x2 rows per image
    merged_ref,  # (1, 1, n_pad) f32 out
    best_gt_ref,  # (1, 1, n_pad) i32 out
    col_arg_ref,  # (1, 1, m_pad) i32 out
    col_max_scr,  # (m_pad, 1) f32 scratch
    col_arg_scr,  # (m_pad, 1) i32 scratch
    *,
    n_pad: int,
    m_pad: int,
    tile: int,
):
    def write_merged(start, merged):
        merged_ref[0, 0:1, pl.ds(start, tile)] = merged

    def write_best_gt(start, first_max_gt):
        best_gt_ref[0, 0:1, pl.ds(start, tile)] = first_max_gt

    _iou_matching_phase(
        anchor_planes_ref, gt_planes_ref, col_max_scr, col_arg_scr,
        write_merged, write_best_gt, n_pad=n_pad, m_pad=m_pad, tile=tile,
    )
    col_arg_ref[0, 0:1, :] = jnp.transpose(col_arg_scr[...])


def _make_key_row(rand_row, lane_iota, lane_bits: int):
    """Unique 28-bit selection keys: top (28 - lane_bits) bits of the random
    word above the anchor index (< 2**lane_bits). Uniqueness makes the
    k-th-smallest threshold selection EXACT (no tie handling); ranking is
    uniformly random with a deterministic low-index tie-break on random-field
    collisions — a ~k/2**(28 - lane_bits) bias toward low anchor indices,
    otherwise the same distributional contract as the reference's
    random-ranking subsample (utils/train_utils.randomly_select_xyz_mask)."""
    rand_bits = 28 - lane_bits
    hi = lax.shift_left(
        lax.shift_right_logical(rand_row, 32 - rand_bits), lane_bits
    )  # top rand_bits of rand -> bits [lane_bits, 28)
    return lax.bitwise_or(hi, lane_iota)


_KEY_SENTINEL = 1 << 29  # above any real key (< 2**28)


def _kth_smallest_threshold(keys_row, k_eff):
    """Largest T with count(keys <= T) == k_eff, by unrolled binary search.

    keys_row: (1, n_pad) int32 in [0, 2**28) for candidates, _KEY_SENTINEL
    elsewhere. k_eff: f32 scalar (0 disables selection -> returns -1).
    Unrolled straight-line (29 compare+reduce rounds): an in-kernel fori_loop
    pays per-iteration sync overhead that would dominate at this size.
    """
    lo = jnp.int32(0)
    hi = jnp.int32(1 << 28)
    for _ in range(29):
        mid = lax.shift_right_logical(lo + hi, 1)
        cnt = jnp.sum(jnp.where(keys_row <= mid, 1.0, 0.0))  # exact in f32
        pred = cnt >= k_eff
        lo = jnp.where(pred, lo, mid + 1)
        hi = jnp.where(pred, mid, hi)
    return jnp.where(k_eff > 0.0, hi, jnp.int32(-1))


def _targets_kernel(
    anchor_planes_ref,  # (8, n_pad) f32: y1,x1,y2,x2,0.. (shared)
    gt_planes_ref,  # (1, 8, m_pad) f32: y1,x1,y2,x2,valid,0,0,0 per image
    rand_ref,  # (1, 2, n_pad) i32: random words (pos row 0, neg row 1)
    out_ref,  # (1, 8, n_pad) f32: rows 0-3 deltas/variances, 4 labels
    col_max_scr,  # (m_pad, 1) f32
    col_arg_scr,  # (m_pad, 1) i32
    merged_scr,  # (1, n_pad) f32
    best_gt_scr,  # (1, n_pad) i32
    *,
    n_pad: int,
    m_pad: int,
    tile: int,
    n_real: int,
    lane_bits: int,
    pos_threshold: float,
    neg_threshold: float,
    total_pos: int,
    total_minibatch: int,
    variances: Tuple[float, float, float, float],
):
    """North-star target kernel (BASELINE.json:5): IoU matrix + matching +
    balanced pos/neg sampling + delta encode, fused — nothing but the dense
    per-anchor outputs leaves the kernel."""
    # ---- phase 1: fused IoU + matching reductions (shared implementation
    # with _matching_kernel, results kept in VMEM scratch) --------------------
    def write_merged(start, merged):
        merged_scr[0:1, pl.ds(start, tile)] = merged

    def write_best_gt(start, first_max_gt):
        best_gt_scr[0:1, pl.ds(start, tile)] = first_max_gt

    _iou_matching_phase(
        anchor_planes_ref, gt_planes_ref, col_max_scr, col_arg_scr,
        write_merged, write_best_gt, n_pad=n_pad, m_pad=m_pad, tile=tile,
    )

    # ---- phase 2: balanced sampling + delta encode, whole-row ---------------
    # gt coordinates as columns (m_pad, 1), same reads phase 1 does
    g_y1 = jnp.transpose(gt_planes_ref[0, 0:1, :])
    g_x1 = jnp.transpose(gt_planes_ref[0, 1:2, :])
    g_y2 = jnp.transpose(gt_planes_ref[0, 2:3, :])
    g_x2 = jnp.transpose(gt_planes_ref[0, 3:4, :])

    merged = merged_scr[...]  # (1, n_pad)
    best_gt = best_gt_scr[...]  # (1, n_pad)
    lane = lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    lane_valid = lane < n_real

    # forced positive: best anchor of every valid GT
    valid_col = jnp.transpose(gt_planes_ref[0, 4:5, :])  # (m_pad, 1)
    anchor_iota_mn = lax.broadcasted_iota(jnp.int32, (m_pad, n_pad), 1)
    forced = (
        jnp.max(
            jnp.where(
                (col_arg_scr[...] == anchor_iota_mn) & (valid_col > 0.5), 1.0, 0.0
            ),
            axis=0,
            keepdims=True,
        )
        > 0.5
    )

    pos_cand = ((merged > pos_threshold) | forced) & lane_valid
    pos_keys = jnp.where(
        pos_cand, _make_key_row(rand_ref[0, 0:1, :], lane, lane_bits), _KEY_SENTINEL
    )
    avail_pos = jnp.sum(jnp.where(pos_cand, 1.0, 0.0))
    t_pos = _kth_smallest_threshold(
        pos_keys, jnp.minimum(jnp.float32(total_pos), avail_pos)
    )
    pos_sel = pos_keys <= t_pos

    pos_count = jnp.sum(jnp.where(pos_sel, 1.0, 0.0))
    neg_cand = (merged < neg_threshold) & (~pos_sel) & lane_valid
    neg_keys = jnp.where(
        neg_cand, _make_key_row(rand_ref[0, 1:2, :], lane, lane_bits), _KEY_SENTINEL
    )
    avail_neg = jnp.sum(jnp.where(neg_cand, 1.0, 0.0))
    t_neg = _kth_smallest_threshold(
        neg_keys, jnp.minimum(jnp.float32(total_minibatch) - pos_count, avail_neg)
    )
    neg_sel = neg_keys <= t_neg

    out_ref[0, 4:5, :] = jnp.where(pos_sel, 1.0, jnp.where(neg_sel, 0.0, -1.0))

    # matched-GT gather via one-hot mask-reduce (best_gt in [0, m_pad) always)
    onehot = jnp.where(
        lax.broadcasted_iota(jnp.int32, (m_pad, n_pad), 0) == best_gt, 1.0, 0.0
    )  # (m_pad, n_pad)
    pos_f = jnp.where(pos_sel, 1.0, 0.0)
    gt_y1 = jnp.sum(g_y1 * onehot, axis=0, keepdims=True) * pos_f  # (1, n_pad)
    gt_x1 = jnp.sum(g_x1 * onehot, axis=0, keepdims=True) * pos_f
    gt_y2 = jnp.sum(g_y2 * onehot, axis=0, keepdims=True) * pos_f
    gt_x2 = jnp.sum(g_x2 * onehot, axis=0, keepdims=True) * pos_f

    # encode exactly like boxes.get_deltas_from_bboxes (zero-size guards: the
    # masked-to-zero non-positive rows encode to all-zero deltas)
    a_y1 = anchor_planes_ref[0:1, :]
    a_x1 = anchor_planes_ref[1:2, :]
    a_y2 = anchor_planes_ref[2:3, :]
    a_x2 = anchor_planes_ref[3:4, :]
    a_h = a_y2 - a_y1
    a_w = a_x2 - a_x1
    a_cy = a_y1 + 0.5 * a_h
    a_cx = a_x1 + 0.5 * a_w
    g_h = gt_y2 - gt_y1
    g_w = gt_x2 - gt_x1
    g_cy = gt_y1 + 0.5 * g_h
    g_cx = gt_x1 + 0.5 * g_w
    a_h = jnp.where(a_h == 0.0, 1e-3, a_h)
    a_w = jnp.where(a_w == 0.0, 1e-3, a_w)
    g_h_safe = jnp.where(g_h <= 0.0, 1.0, g_h)
    g_w_safe = jnp.where(g_w <= 0.0, 1.0, g_w)
    out_ref[0, 0:1, :] = jnp.where(g_h == 0.0, 0.0, (g_cy - a_cy) / a_h) / variances[0]
    out_ref[0, 1:2, :] = jnp.where(g_w == 0.0, 0.0, (g_cx - a_cx) / a_w) / variances[1]
    out_ref[0, 2:3, :] = jnp.where(g_h == 0.0, 0.0, jnp.log(g_h_safe / a_h)) / variances[2]
    out_ref[0, 3:4, :] = jnp.where(g_w == 0.0, 0.0, jnp.log(g_w_safe / a_w)) / variances[3]
    out_ref[0, 5:8, :] = jnp.zeros((3, n_pad), jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("hp", "tile", "interpret")
)
def fused_rpn_targets(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    rand_bits: jnp.ndarray,
    hp,
    tile: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fully-fused RPN target assignment (the BASELINE.json:5 north-star
    kernel): dense IoU matching + forced best-per-GT + balanced pos/neg
    subsampling + delta encoding in ONE Pallas kernel.

    Args:
      anchors: (N, 4); gt_boxes: (B, M, 4) zero-padded; gt_labels: (B, M)
        with -1 padding; rand_bits: (B, 2, N) int32 random words (row 0
        ranks positives, row 1 negatives — e.g. bitcast of
        jax.random.bits(key, (B, 2, N))).
      hp: HyperParams (thresholds, total_pos/neg, variances).

    Returns (bbox_deltas (B, N, 4) — already / variances, bbox_labels (B, N)).
    Selection semantics: random subset of the candidate mask ranked by unique
    28-bit keys (top random bits above the anchor index — see _make_key_row
    for the exact rule and its small low-index tie-break bias). The pure-jnp
    implementation in ``target.select_by_keys`` consumes the same rand_bits
    and matches bit-for-bit, so CPU and TPU runs select identical subsets.
    """
    N = anchors.shape[0]
    B, M, _ = gt_boxes.shape
    n_pad = _round_up(N, tile)
    m_pad = _round_up(M, 8)
    assert rand_bits.shape == (B, 2, N), rand_bits.shape

    anchor_planes = jnp.zeros((8, n_pad), jnp.float32)
    anchor_planes = anchor_planes.at[:4, :N].set(anchors.T)
    gt_planes = jnp.zeros((B, 8, m_pad), jnp.float32)
    gt_planes = gt_planes.at[:, :4, :M].set(jnp.moveaxis(gt_boxes, -1, 1))
    gt_planes = gt_planes.at[:, 4, :M].set((gt_labels != -1).astype(jnp.float32))
    rand_pad = jnp.zeros((B, 2, n_pad), jnp.int32)
    rand_pad = rand_pad.at[:, :, :N].set(rand_bits)

    kernel = functools.partial(
        _targets_kernel,
        n_pad=n_pad,
        m_pad=m_pad,
        tile=tile,
        n_real=N,
        # only real lanes (< N) need unique keys: padded lanes are never
        # candidates and carry the sentinel regardless of index overflow
        lane_bits=_lane_bits_for(N),
        pos_threshold=float(hp.pos_threshold),
        neg_threshold=float(hp.neg_threshold),
        total_pos=int(hp.total_pos_bboxes),
        total_minibatch=int(hp.total_pos_bboxes + hp.total_neg_bboxes),
        variances=tuple(float(v) for v in hp.variances),
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((8, n_pad), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, m_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, n_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 8, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((m_pad, 1), jnp.float32),
            pltpu.VMEM((m_pad, 1), jnp.int32),
            pltpu.VMEM((1, n_pad), jnp.float32),
            pltpu.VMEM((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(anchor_planes, gt_planes, rand_pad)
    bbox_deltas = jnp.moveaxis(out[:, :4, :N], 1, -1)  # (B, N, 4)
    bbox_labels = out[:, 4, :N]  # (B, N)
    return bbox_deltas, bbox_labels


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_iou_matching(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    tile: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused anchor x GT IoU matching (Pallas kernel).

    Args:
      anchors: (N, 4) [y1,x1,y2,x2].
      gt_boxes: (B, M, 4), zero-padded rows.

    Returns:
      merged_iou: (B, N) f32 — best IoU per anchor.
      best_gt_per_anchor: (B, N) i32.
      best_anchor_per_gt: (B, M) i32.

    Identical results to the jnp twin tpurpn.target.iou_matching.
    """
    N = anchors.shape[0]
    B, M, _ = gt_boxes.shape
    n_pad = _round_up(N, tile)
    m_pad = _round_up(M, 8)

    anchor_planes = jnp.zeros((8, n_pad), jnp.float32)
    anchor_planes = anchor_planes.at[:4, :N].set(anchors.T)
    gt_planes = jnp.zeros((B, 8, m_pad), jnp.float32)
    gt_planes = gt_planes.at[:, :4, :M].set(jnp.moveaxis(gt_boxes, -1, 1))

    kernel = functools.partial(
        _matching_kernel, n_pad=n_pad, m_pad=m_pad, tile=tile
    )
    merged, best_gt, col_arg = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((8, n_pad), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, m_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, n_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, m_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((m_pad, 1), jnp.float32),
            pltpu.VMEM((m_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(anchor_planes, gt_planes)
    return (
        merged[:, 0, :N],
        best_gt[:, 0, :N],
        col_arg[:, 0, :M],
    )
