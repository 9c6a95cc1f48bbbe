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

The pure-jnp twin is ``tpurpn.target.iou_matching``; thresholding, balanced
sampling and delta encoding stay in XLA where they fuse for free.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2**30  # plain int: a jnp constant would be captured as a traced value


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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
        merged_ref[0, 0:1, pl.ds(start, tile)] = merged
        best_gt_ref[0, 0:1, pl.ds(start, tile)] = first_max_gt

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
    col_arg_ref[0, 0:1, :] = jnp.transpose(col_arg_scr[...])


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
