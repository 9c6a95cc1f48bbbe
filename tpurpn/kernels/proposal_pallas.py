"""Fused proposal selection: block-lazy gather + greedy NMS + compaction.

The replacement for the post-forward tail of the predictor (reference:
rpn_predictor.py decode -> top-k -> tf.image.non_max_suppression -> selected
proposals, SURVEY.md §3.2). The round-1 pipeline spent ~6 ms/batch (B=128) on
a 5-operand ``lax.sort`` carrying box planes, the NMS keep kernel, and the
output gathers. This kernel exploits measured facts about this TPU
(benchmarks/exp_sort.py, benchmarks/breakdown.py):

* ``lax.top_k(scores, pre)`` is ~4x cheaper than the payload-carrying sort
  (0.97 vs 3.8 ms at B=128) — so sort **indices only**;
* XLA lane gathers on (B, 4, N) planes are hopeless (7.5 ms), and Mosaic has
  no dynamic lane gather — but a one-hot **MXU matmul is an exact gather**:
  ``onehot(idx) @ planes`` touches only MXU+VPU, and greedy NMS early-exits
  after ~max_output keeps, so only the few blocks actually processed are ever
  gathered (the sort moved ALL 5 operands for all N candidates);
* per-grid-step overhead is ~8 us on this TPU, so one grid step handles
  ``group`` images (predicated on each image's kept count) instead of one;
* the serial cost drivers at small shapes are lane<->sublane transposes and
  while_loop round-trips, so candidates live **column-major** ((block, 1)
  coordinate columns — zero transposes past the index load) and the greedy
  fixpoint runs **jointly over the whole image group** (one while_loop whose
  iteration count is the max chain depth over the group, not the sum: on
  decoded RPN grids this is ~4x fewer loop syncs).

Per grid step (``group`` images, everything VMEM-resident), while any image
in the group needs boxes and blocks remain:

  1. GATHER each image's next `block` candidates: a page-one-hot bf16 MXU
     matmul against the 3-way bf16-split planes (hi+mid+lo parts sum exactly
     to the f32 value — Mosaic supports only DEFAULT/HIGHEST dot precision,
     and HIGHEST costs 6 MXU passes) + a per-page lane mask-reduce. Exact f32,
     verified bit-for-bit on device.
  2. CROSS-SUPPRESS against the image's kept buffer — (block, buf) IoU sweep
     against at most max_output-1+block boxes.
  3. JOINT greedy fixpoint: one while_loop carries every image's keep mask;
     each iteration is `group` independent (block, block) MXU matvecs.
  4. COMPACT: scatter kept boxes to their rank slot in the kept buffer with a
     rank-one-hot VPU mask-reduce (ranks from a lower-triangular cumsum
     matvec). Images already at max_output keeps contribute dead lanes only.

Selection semantics are bit-identical to the pure-jnp twin — the
``tpurpn.predict.generate_proposals`` pipeline with ``use_pallas=False``
(top-k + ``tpurpn.boxes._nms_keep_sorted_batched``), what
tests/test_proposal_pallas.py A/Bs against — and therefore to the TF
reference pipeline: ``lax.top_k`` breaks score ties by lower index exactly
like the stable descending sort it replaces.
(``tpurpn.predict.generate_proposals_planes`` is this kernel's own
wrapper, not the oracle.)
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._util import round_up as _round_up


def _proposal_kernel(
    planes_t_ref,  # (G, pages, 3*640) bf16: 3-way bf16 split (hi/mid/lo sum
    #                exactly to the f32 value) of planes_t[p, a*128+l] =
    #                plane a of box p*128+l (a: y1,x1,y2,x2,score) — so a
    #                page one-hot gathers whole 128-lane pages on the MXU
    idx_ref,  # (G, 1, pre_pad) i32: top_k candidate indices, descending score
    out_ref,  # (G, 8, out_pad) f32: rows 0-3 boxes, 4 score, 5 valid,
    #           6 num_valid, 7 kept_count — compacted, sorted order
    kept_scr,  # (G * 8, buf) f32: kept boxes, plane rows, row 5 = occupied
    *,
    iou_threshold: float,
    max_output: int,
    block: int,
    pages: int,
    pre: int,
    pre_pad: int,
    buf: int,
    out_pad: int,
    group: int,
):
    num_blocks = pre_pad // block

    # kept_scr's zero-init is load-bearing (the rank scatter writes occupied
    # slots only); out_ref needs none — the final emit loop overwrites every
    # row and lane unconditionally
    kept_scr[...] = jnp.zeros((group * 8, buf), jnp.float32)

    # strictly-lower-triangular (j < i) mask: rank cumsum + greedy matvec
    row_ids = lax.broadcasted_iota(jnp.int32, (block, block), 0)
    col_ids = lax.broadcasted_iota(jnp.int32, (block, block), 1)
    lowtri = (col_ids < row_ids).astype(jnp.float32)

    page_iota = lax.broadcasted_iota(jnp.int32, (block, pages), 1)  # cols
    lane_iota = lax.bitwise_and(
        lax.broadcasted_iota(jnp.int32, (block, 640), 1), 127
    )  # lane within each 128-wide page group
    buf_iota = lax.broadcasted_iota(jnp.int32, (block, buf), 1).astype(jnp.float32)
    pos_iota = lax.broadcasted_iota(jnp.int32, (block, 1), 0)

    def gather_and_mask(g, start, kept_count):
        """Gather image g's candidates [start, start+block) as coordinate
        columns and compute the cross-suppressed alive mask.

        Returns (y1c, x1c, y2c, x2c, scorec, area_c, alive_f) — all (block, 1).
        """
        # ---- 1. two-level gather: page one-hot matmul + lane mask-reduce --
        idx_col = jnp.transpose(idx_ref[g, 0:1, pl.ds(start, block)])  # (blk,1)
        page_col = lax.shift_right_logical(idx_col, 7)  # idx // 128
        lane_col = lax.bitwise_and(idx_col, 127)  # idx % 128
        onehot = (page_iota == page_col).astype(jnp.bfloat16)  # (block, pages)
        # row j <- the whole 640-lane page row holding candidate j: ONE
        # single-pass bf16 matmul over the 3-way split; exactly one operand
        # row is selected per output row, accumulated in f32 -> exact gather
        split = jnp.dot(
            onehot, planes_t_ref[g], preferred_element_type=jnp.float32
        )  # (block, 1920)
        paged = (
            split[:, 0:640] + split[:, 640:1280] + split[:, 1280:1920]
        )  # (block, 640) — hi + mid + lo == the f32 value, exactly
        lanemask = (lane_iota == lane_col).astype(jnp.float32)  # (block, 640)
        picked = paged * lanemask
        # per-coordinate lane reduce: column j of plane a = the one nonzero
        # lane in picked[:, a*128:(a+1)*128] (VPU f32, exact)
        cols = [
            jnp.sum(picked[:, a * 128 : (a + 1) * 128], axis=1, keepdims=True)
            for a in range(5)
        ]
        y1c, x1c, y2c, x2c, scorec = cols
        area_c = jnp.maximum(y2c - y1c, 0.0) * jnp.maximum(x2c - x1c, 0.0)

        # dead lanes: candidates past the real top-k length, or the whole
        # block once this image already has max_output keeps (early exit)
        alive = ((start + pos_iota) < pre) & (kept_count < max_output)

        # ---- 2. cross suppression vs the kept buffer (single sweep) -------
        y1r = kept_scr[g * 8 + 0 : g * 8 + 1, :]  # (1, buf)
        x1r = kept_scr[g * 8 + 1 : g * 8 + 2, :]
        y2r = kept_scr[g * 8 + 2 : g * 8 + 3, :]
        x2r = kept_scr[g * 8 + 3 : g * 8 + 4, :]
        occ = kept_scr[g * 8 + 5 : g * 8 + 6, :]  # 1.0 where a kept box lives
        area_r = jnp.maximum(y2r - y1r, 0.0) * jnp.maximum(x2r - x1r, 0.0)
        ih = jnp.maximum(jnp.minimum(y2c, y2r) - jnp.maximum(y1c, y1r), 0.0)
        iw = jnp.maximum(jnp.minimum(x2c, x2r) - jnp.maximum(x1c, x1r), 0.0)
        inter = ih * iw  # (block, buf)
        union = jnp.maximum(area_c + area_r - inter, 1e-8)
        hit = jnp.where((inter / union > iou_threshold) & (occ > 0.5), 1.0, 0.0)
        alive = alive & (jnp.sum(hit, axis=1, keepdims=True) == 0.0)
        return y1c, x1c, y2c, x2c, scorec, area_c, jnp.where(alive, 1.0, 0.0)

    def over_matrix(y1c, x1c, y2c, x2c, area_c):
        """(block, block) strictly-lower-triangular overlap (IoU > thr)."""
        ih = jnp.maximum(
            jnp.minimum(y2c, jnp.transpose(y2c))
            - jnp.maximum(y1c, jnp.transpose(y1c)),
            0.0,
        )
        iw = jnp.maximum(
            jnp.minimum(x2c, jnp.transpose(x2c))
            - jnp.maximum(x1c, jnp.transpose(x1c)),
            0.0,
        )
        inter = ih * iw
        union = jnp.maximum(area_c + jnp.transpose(area_c) - inter, 1e-8)
        return jnp.where(inter / union > iou_threshold, 1.0, 0.0) * lowtri

    def body(state):
        b = state[0]
        start = pl.multiple_of(b * block, block)
        kept_counts = state[1:]

        boxes = []  # per image: (y1c, x1c, y2c, x2c, scorec)
        overs = []
        alives = []
        for g in range(group):
            y1c, x1c, y2c, x2c, scorec, area_c, alive_f = gather_and_mask(
                g, start, kept_counts[g]
            )
            boxes.append((y1c, x1c, y2c, x2c, scorec))
            overs.append(over_matrix(y1c, x1c, y2c, x2c, area_c))
            alives.append(alive_f)

        # ---- 3. JOINT within-block greedy fixpoint over the whole group ---
        # one while_loop for all `group` images: iterations = max suppression
        # chain depth over the group (not the sum); the `group` matvecs per
        # iteration are independent and pipeline on the MXU
        def fix_cond(c):
            return c[-1]

        def fix_body(c):
            ms = c[:-1]
            new = tuple(
                alives[g]
                * jnp.where(
                    jnp.dot(overs[g], ms[g], preferred_element_type=jnp.float32)
                    > 0.0,
                    0.0,
                    1.0,
                )
                for g in range(group)
            )
            changed = jnp.any(new[0] != ms[0])
            for g in range(1, group):
                changed = changed | jnp.any(new[g] != ms[g])
            return new + (changed,)

        fixed = lax.while_loop(fix_cond, fix_body, tuple(alives) + (True,))
        masks = fixed[:-1]

        # ---- 4. compact kept boxes into their rank slots -------------------
        new_counts = []
        for g in range(group):
            m = masks[g]  # (block, 1)
            kept_count = kept_counts[g]
            # rank within kept order = kept_count + exclusive cumsum of m
            rank = jnp.dot(lowtri, m, preferred_element_type=jnp.float32) + kept_count
            scatter = m * jnp.where(rank == buf_iota, 1.0, 0.0)  # (block, buf)
            cols = boxes[g] + (m,)  # rows y1..x2, score, occupied
            for a in range(6):
                # VPU mask-reduce scatter: exact f32 (a matmul here would need
                # >= 3 bf16 passes and K=block cycles per output tile)
                kept_scr[g * 8 + a : g * 8 + a + 1, :] = kept_scr[
                    g * 8 + a : g * 8 + a + 1, :
                ] + jnp.sum(scatter * cols[a], axis=0, keepdims=True)
            new_counts.append(kept_count + jnp.sum(m))
        return (b + 1,) + tuple(new_counts)

    def cond(state):
        b = state[0]
        need = state[1] < max_output
        for g in range(1, group):
            need = need | (state[1 + g] < max_output)
        return (b < num_blocks) & need

    init = (jnp.int32(0),) + tuple(jnp.float32(0.0) for _ in range(group))
    final = lax.while_loop(cond, body, init)

    # emit the first max_output kept boxes (sorted order), zero past num_valid
    lane = lax.broadcasted_iota(jnp.int32, (8, out_pad), 1).astype(jnp.float32)
    for g in range(group):
        kept_count = final[1 + g]
        num_valid = jnp.minimum(kept_count, jnp.float32(max_output))
        out_ref[g, :, :] = jnp.where(
            lane < num_valid, kept_scr[pl.ds(g * 8, 8), :out_pad], 0.0
        )
        out_ref[g, 6:7, :] = jnp.full((1, out_pad), num_valid, jnp.float32)
        out_ref[g, 7:8, :] = jnp.full((1, out_pad), kept_count, jnp.float32)


def split_bf16_3way(pt: jnp.ndarray) -> jnp.ndarray:
    """f32 (…, 640) -> bf16 (…, 1920): hi/mid/lo parts summing exactly to the
    f32 value (f32's 24-bit mantissa decomposes into three 8-bit bf16
    mantissas) — the kernel's exact-gather operand format.

    The parts are carved out by INTEGER bit-masking (bf16 = the top 16 bits of
    the f32 pattern), not by f32->bf16->f32 round-trips: inside a jitted
    program XLA's excess-precision optimization (on by default) elides such
    round-trips, which silently turns the "exact" split into plain bf16
    truncation of the boxes. Integer ops have no excess-precision semantics,
    so the decomposition survives any fusion.
    """
    bits = lax.bitcast_convert_type(pt, jnp.uint32)
    hi = lax.bitcast_convert_type(
        lax.bitwise_and(bits, jnp.uint32(0xFFFF0000)), jnp.float32
    )
    r1 = pt - hi  # exact: low 16 mantissa bits of pt
    r1b = lax.bitcast_convert_type(r1, jnp.uint32)
    mid = lax.bitcast_convert_type(
        lax.bitwise_and(r1b, jnp.uint32(0xFFFF0000)), jnp.float32
    )
    lo = r1 - mid  # exact: <= 8 significant bits remain
    # each part's value is bf16-representable (top-16-bit patterns), so these
    # casts are exact
    return jnp.concatenate(
        [p.astype(jnp.bfloat16) for p in (hi, mid, lo)], axis=-1
    )


def pack_planes(box_planes: jnp.ndarray, scores: jnp.ndarray, n_pad: int):
    """(B, 4, N) planes + (B, N) scores -> the kernel's page-major input.

    Returns (B, n_pad//128, 3*5*128) bf16 with the 3-way bf16 split
    (hi, mid, lo — summing exactly to the f32 value: f32's 24-bit mantissa
    decomposes into three 8-bit bf16 mantissas) of planes_t[p, a*128+l] =
    plane a of box p*128+l (a: y1,x1,y2,x2,score): the layout where gathering
    a candidate = one page-one-hot bf16 matmul row-select (over p) plus a
    lane mask-reduce (over l) — see _proposal_kernel.
    """
    B, _, N = box_planes.shape
    pages = n_pad // 128
    planes = jnp.zeros((B, 5, n_pad), jnp.float32)
    planes = planes.at[:, :4, :N].set(box_planes.astype(jnp.float32))
    planes = planes.at[:, 4, :N].set(scores.astype(jnp.float32))
    pt = (
        planes.reshape(B, 5, pages, 128)
        .transpose(0, 2, 1, 3)
        .reshape(B, pages, 5 * 128)
    )
    return split_bf16_3way(pt)  # (B, pages, 1920)


@functools.partial(
    jax.jit,
    static_argnames=(
        "pre", "iou_threshold", "max_output", "block", "group", "interpret",
    ),
)
def fused_proposals_packed(
    planes_t: jnp.ndarray,
    scores: jnp.ndarray,
    pre: int,
    iou_threshold: float,
    max_output: int,
    block: int = 128,
    group: int = 8,
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Kernel entry on pre-packed page-major planes (:func:`pack_planes`).

    The packed layout lets callers (decode) fuse the packing into upstream
    XLA ops instead of paying a separate ~0.8 ms materialization at B=128.
    """
    B, pages, rows = planes_t.shape
    N = scores.shape[1]
    assert rows == 1920 and pre <= N <= pages * 128, (rows, pre, N, pages)
    pre_pad = _round_up(pre, block)
    buf = _round_up(max_output - 1 + block, 128)
    out_pad = _round_up(max_output, 128)
    while B % group:
        group //= 2

    _, idx = lax.top_k(scores, pre)  # ties -> lower index, like stable sort
    idx_pad = jnp.zeros((B, 1, pre_pad), jnp.int32)
    idx_pad = idx_pad.at[:, 0, :pre].set(idx)

    kernel = functools.partial(
        _proposal_kernel,
        iou_threshold=float(iou_threshold),
        max_output=max_output,
        block=block,
        pages=pages,
        pre=pre,
        pre_pad=pre_pad,
        buf=buf,
        out_pad=out_pad,
        group=group,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B // group,),
        in_specs=[
            pl.BlockSpec(
                (group, pages, 1920), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (group, 1, pre_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (group, 8, out_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 8, out_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((group * 8, buf), jnp.float32),
        ],
        interpret=interpret,
    )(planes_t, idx_pad)

    return {
        "roi_boxes": jnp.moveaxis(out[:, :4, :max_output], 1, -1),
        "roi_scores": out[:, 4, :max_output],
        "num_valid": out[:, 6, 0].astype(jnp.int32),
    }


def fused_proposals_planes(
    box_planes: jnp.ndarray,
    scores: jnp.ndarray,
    pre: int,
    iou_threshold: float,
    max_output: int,
    block: int = 128,
    group: int = 8,
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Top-k -> greedy NMS -> compacted proposals, fused.

    Args:
      box_planes: (B, 4, N) decoded candidate boxes, plane layout.
      scores: (B, N) objectness scores.
      pre: pre-NMS candidate count (min(hp.pre_nms_topn, N)).
      iou_threshold / max_output: greedy-NMS parameters (TF semantics).

    Returns dict {roi_boxes (B, max_output, 4), roi_scores (B, max_output),
    num_valid (B,)} — bit-identical to generate_proposals_planes.
    """
    N = box_planes.shape[2]
    n_pad = _round_up(N, 1024)  # 1024 = 8 sublane-groups of 128-lane pages
    planes_t = pack_planes(box_planes, scores, n_pad)
    return fused_proposals_packed(
        planes_t, scores, pre=pre, iou_threshold=iou_threshold,
        max_output=max_output, block=block, group=group,
        interpret=interpret,
    )
