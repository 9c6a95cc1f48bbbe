"""Sorted-greedy NMS as a Pallas TPU kernel.

The TPU-native replacement for ``tf.image.non_max_suppression``
(BASELINE.json:5 "reimplemented as a TPU-friendly sorted-top-k NMS Pallas
kernel"). Exact greedy semantics — identical selection to the jnp twin
``tpurpn.boxes._nms_keep_sorted_batched`` and therefore to TF.

Design (one grid step per image, everything resident in VMEM):

* inputs arrive as **planes** (B, 8, n): rows 0-3 are y1/x1/y2/x2, row 4 is
  the validity mask — lane-major over boxes, the VPU-native layout (a
  (n, 4) array would waste 124/128 lanes per tile);
* the keep mask lives in the output ref (1, 8, n) row 0 and doubles as the
  "previously kept" operand: suppression only flows forward, so kept boxes of
  earlier blocks are exactly the nonzero prefix of the keep row;
* per 128-box block, cross-block suppression is ONE wide (128, n) IoU sweep
  against the keep row (VPU elementwise + lane reduction — no O(n^2) total,
  the outer while early-exits once max_output boxes are kept);
* within-block greedy is resolved by fixpoint iteration of
  m[j] = alive[j] & !any_{i<j}(m[i] & iou[i,j] > thr), evaluated as an MXU
  (128x128)@(128x1) matvec per sweep — the greedy keep set is the unique
  fixpoint, and sweep t settles all suppression chains of depth <= t.
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


def _nms_kernel(
    planes_ref, out_ref, supp_scr, *, iou_threshold, max_output, block, n_pad, chunk
):
    """planes_ref: (1, 8, n_pad) f32 [y1,x1,y2,x2,valid,0,0,0]; out_ref same
    shape: row 0 = keep mask (1/0), row 1 = kept_count broadcast."""
    num_blocks = n_pad // block

    out_ref[...] = jnp.zeros_like(out_ref)

    # strictly-lower-triangular mask: lowtri[j, i] = i < j ("earlier i can
    # suppress later j"), used as the MXU matvec operand
    row_ids = lax.broadcasted_iota(jnp.int32, (block, block), 0)
    col_ids = lax.broadcasted_iota(jnp.int32, (block, block), 1)
    lowtri = (col_ids < row_ids).astype(jnp.float32)

    def body(state):
        i, kept_count = state
        start = pl.multiple_of(i * block, block)

        # block coordinates as columns (block, 1) — sliced from the ref
        # (Mosaic lowers pl.ds on refs; dynamic_slice on values is unsupported)
        y1c = jnp.transpose(planes_ref[0, 0:1, pl.ds(start, block)])
        x1c = jnp.transpose(planes_ref[0, 1:2, pl.ds(start, block)])
        y2c = jnp.transpose(planes_ref[0, 2:3, pl.ds(start, block)])
        x2c = jnp.transpose(planes_ref[0, 3:4, pl.ds(start, block)])
        valid_c = jnp.transpose(planes_ref[0, 4:5, pl.ds(start, block)]) > 0.5
        area_c = jnp.maximum(y2c - y1c, 0.0) * jnp.maximum(x2c - x1c, 0.0)

        # ---- cross suppression: block vs all previously-kept boxes --------
        # Only the processed prefix [0, start) can hold kept boxes, so sweep
        # ceil(start/chunk) lane chunks with a dynamic trip count instead of
        # all n_pad lanes — O(prefix) per block, O(processed^2 / 2) total.
        # (A chunk may extend past start; those lanes read a still-zero keep
        # row — the zero-init of out_ref above is what makes that safe.)
        # The first block sweeps zero chunks: nothing is kept before it.
        num_chunks = lax.div(start + (chunk - 1), chunk)
        supp_scr[...] = jnp.zeros((block, 1), jnp.float32)

        def chunk_body(c):
            cs = pl.multiple_of(c * chunk, chunk)
            y1r = planes_ref[0, 0:1, pl.ds(cs, chunk)]
            x1r = planes_ref[0, 1:2, pl.ds(cs, chunk)]
            y2r = planes_ref[0, 2:3, pl.ds(cs, chunk)]
            x2r = planes_ref[0, 3:4, pl.ds(cs, chunk)]
            area_r = jnp.maximum(y2r - y1r, 0.0) * jnp.maximum(x2r - x1r, 0.0)
            inter_h = jnp.maximum(jnp.minimum(y2c, y2r) - jnp.maximum(y1c, y1r), 0.0)
            inter_w = jnp.maximum(jnp.minimum(x2c, x2r) - jnp.maximum(x1c, x1r), 0.0)
            inter = inter_h * inter_w  # (block, chunk)
            union = jnp.maximum(area_c + area_r - inter, 1e-8)
            keep_row = out_ref[0, 0:1, pl.ds(cs, chunk)]
            hit = jnp.where(
                (inter / union > iou_threshold) & (keep_row > 0.5), 1.0, 0.0
            )
            # accumulate in VMEM scratch: Mosaic while loops carry scalars
            # only (vector scf.yield fails to legalize)
            supp_scr[...] = supp_scr[...] + jnp.sum(hit, axis=1, keepdims=True)
            return c + 1

        # while (not fori): Mosaic legalizes dynamic-trip-count while loops
        # but not dynamic-bound scf.for
        lax.while_loop(lambda c: c < num_chunks, chunk_body, jnp.int32(0))
        alive = valid_c & (supp_scr[...] == 0.0)  # (block, 1)

        # ---- within-block greedy via fixpoint + MXU matvec ----------------
        ih = jnp.maximum(
            jnp.minimum(y2c, jnp.transpose(y2c)) - jnp.maximum(y1c, jnp.transpose(y1c)),
            0.0,
        )
        iw = jnp.maximum(
            jnp.minimum(x2c, jnp.transpose(x2c)) - jnp.maximum(x1c, jnp.transpose(x1c)),
            0.0,
        )
        inter_b = ih * iw
        union_b = jnp.maximum(area_c + jnp.transpose(area_c) - inter_b, 1e-8)
        # over_low[j, i] = (iou(i, j) > thr) & (i < j)
        over_low = jnp.where(inter_b / union_b > iou_threshold, 1.0, 0.0) * lowtri

        alive_f = jnp.where(alive, 1.0, 0.0)  # (block, 1)

        def fix_cond(c):
            return c[1]

        def fix_body(c):
            m, _ = c
            sup = (
                jnp.dot(over_low, m, preferred_element_type=jnp.float32) > 0.0
            )  # (block, 1)
            m_new = alive_f * jnp.where(sup, 0.0, 1.0)
            return m_new, jnp.any(m_new != m)

        m, _ = lax.while_loop(fix_cond, fix_body, (alive_f, True))

        # commit this block's keeps and count them
        out_ref[0, 0:1, pl.ds(start, block)] = jnp.transpose(m)
        kept_count = kept_count + jnp.sum(m)
        return i + 1, kept_count

    def cond(state):
        i, kept_count = state
        return (i < num_blocks) & (kept_count < max_output)

    _, kept_count = lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(0.0)))
    out_ref[0, 1:2, :] = jnp.full((1, n_pad), kept_count, jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("iou_threshold", "max_output", "block", "chunk", "interpret"),
)
def nms_pallas_keep_planes(
    box_planes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_output: int,
    block: int = 256,
    chunk: int = 1024,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plane-layout variant: box_planes is (B, 4, n) [y1;x1;y2;x2 rows].

    The lane-major layout the kernel uses natively — callers that already
    hold planes (the optimized predict path, where gathers run along lanes)
    skip a (B, n, 4) round-trip entirely.
    """
    B, _, n = box_planes.shape
    assert block % 128 == 0, "block must be a multiple of 128 (TPU lanes)"
    # the kernel requires chunk % block == 0; round the requested chunk up
    # rather than reject documented-valid blocks (e.g. block=384 with the
    # default chunk=1024 -> chunk=1152)
    chunk = _round_up(chunk, block)
    n_pad = _round_up(max(n, block), chunk)
    if n_pad > n:
        box_planes = jnp.pad(box_planes, ((0, 0), (0, 0), (0, n_pad - n)))
        valid = jnp.pad(valid, ((0, 0), (0, n_pad - n)))

    planes = jnp.concatenate(
        [
            box_planes.astype(jnp.float32),
            valid[:, None, :].astype(jnp.float32),
            jnp.zeros((B, 3, n_pad), jnp.float32),
        ],
        axis=1,
    )  # (B, 8, n_pad)

    kernel = functools.partial(
        _nms_kernel,
        iou_threshold=float(iou_threshold),
        max_output=max_output,
        block=block,
        n_pad=n_pad,
        chunk=chunk,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 8, n_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 8, n_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 8, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block, 1), jnp.float32)],
        interpret=interpret,
    )(planes)
    keep = out[:, 0, :n] > 0.5
    kept_count = out[:, 1, 0].astype(jnp.int32)
    return keep, kept_count


def nms_pallas_keep(
    boxes_sorted: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_output: int,
    block: int = 128,
    chunk: int = 1024,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy-NMS keep mask over batched score-sorted boxes (Pallas kernel).

    Args:
      boxes_sorted: (B, n, 4) [y1,x1,y2,x2], descending score order.
      valid: (B, n) bool.
      iou_threshold / max_output: greedy-NMS parameters (TF semantics).
      block: box block size (multiple of 128).
      interpret: run in the Pallas interpreter (CPU testing).

    Returns:
      keep: (B, n) bool — same mask as tpurpn.boxes._nms_keep_sorted_batched.
      kept_count: (B,) int32 — kept boxes per image (may overshoot max_output
        within the final processed block, exactly like the jnp twin).
    """
    return nms_pallas_keep_planes(
        jnp.moveaxis(boxes_sorted, -1, 1),
        valid,
        iou_threshold,
        max_output,
        block=block,
        chunk=chunk,
        interpret=interpret,
    )
