"""Proposal generation: decode head outputs -> top-k -> NMS.

TPU-native rebuild of the reference's predictor hot loop
(rpn_predictor.py, SURVEY.md §3.2): reshape head outputs to (B, N, 4)/(B, N),
scale deltas by variances, decode against the anchor grid, keep the
pre_nms_topn highest-scoring boxes, then greedy NMS down to test_nms_topn
(BASELINE.json:5 names the tf.image.non_max_suppression call this replaces).

Everything is a pure jitted function with static shapes: proposals come back
as fixed-size (B, topn, 4) plus a validity count per image — the XLA-friendly
equivalent of TF's ragged NMS output (SURVEY.md §7 "Dynamic shapes").
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .anchors import generate_anchors
from .boxes import batched_non_max_suppression, get_bboxes_from_deltas
from .config import HyperParams


def decode_outputs(
    anchors: jnp.ndarray,
    rpn_reg: jnp.ndarray,
    rpn_cls_logits: jnp.ndarray,
    hp: HyperParams,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Head outputs -> (boxes (B, N, 4), scores (B, N)).

    Deltas are multiplied by the variances before decoding and scores are
    sigmoid objectness — exactly the reference predictor's
    ``deltas *= variances; get_bboxes_from_deltas`` step.
    """
    B = rpn_reg.shape[0]
    deltas = rpn_reg.reshape(B, -1, 4) * jnp.asarray(hp.variances, jnp.float32)
    scores = jax.nn.sigmoid(rpn_cls_logits.reshape(B, -1))
    boxes = get_bboxes_from_deltas(anchors[None], deltas)
    return boxes, scores


@functools.partial(jax.jit, static_argnames=("hp", "topn", "nms_block"))
def generate_proposals(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    hp: HyperParams,
    topn: int | None = None,
    nms_block: int = 128,
) -> Dict[str, jnp.ndarray]:
    """Top-k + NMS proposal selection.

    Args:
      boxes: (B, N, 4) decoded candidate boxes.
      scores: (B, N) objectness scores.
      hp: hyper params (pre_nms_topn, nms_iou_threshold, test_nms_topn).
      topn: output size; defaults to hp.test_nms_topn (use hp.train_nms_topn
        for the training-time proposal path).

    Returns dict with:
      roi_boxes: (B, topn, 4); roi_scores: (B, topn) (0 past num_valid);
      num_valid: (B,) int32.
    """
    if topn is None:
        topn = hp.test_nms_topn
    N = boxes.shape[1]
    pre = min(hp.pre_nms_topn, N)
    top_scores, top_idx = lax.top_k(scores, pre)  # sorted desc, stable
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)

    sel, num_valid = batched_non_max_suppression(
        top_boxes,
        top_scores,
        max_output_size=topn,
        iou_threshold=hp.nms_iou_threshold,
        block=nms_block,
        presorted=True,  # lax.top_k output is already descending
    )
    valid = sel >= 0
    safe_sel = jnp.maximum(sel, 0)
    roi_boxes = jnp.take_along_axis(top_boxes, safe_sel[..., None], axis=1)
    roi_scores = jnp.take_along_axis(top_scores, safe_sel, axis=1)
    roi_boxes = jnp.where(valid[..., None], roi_boxes, 0.0)
    roi_scores = jnp.where(valid, roi_scores, 0.0)
    num_valid = jnp.minimum(num_valid, topn).astype(jnp.int32)
    return {"roi_boxes": roi_boxes, "roi_scores": roi_scores, "num_valid": num_valid}


def decode_outputs_planes(
    anchors: jnp.ndarray,
    rpn_reg: jnp.ndarray,
    rpn_cls_logits: jnp.ndarray,
    hp: HyperParams,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode head outputs into lane-major box planes: ((B, 4, N), (B, N)).

    Same math as :func:`decode_outputs`, but each coordinate is produced as a
    (B, N) plane — the layout where the subsequent top-k gather and the
    Pallas NMS kernel run along the 128-lane axis (a (B, N, 4) array wastes
    124/128 lanes per tile and makes the box gather ~5x slower on TPU).
    """
    B = rpn_reg.shape[0]
    deltas = rpn_reg.reshape(B, -1, 4) * jnp.asarray(hp.variances, jnp.float32)
    scores = jax.nn.sigmoid(rpn_cls_logits.reshape(B, -1))
    a_h = anchors[:, 2] - anchors[:, 0]
    a_w = anchors[:, 3] - anchors[:, 1]
    a_cy = anchors[:, 0] + 0.5 * a_h
    a_cx = anchors[:, 1] + 0.5 * a_w
    h = jnp.exp(deltas[..., 2]) * a_h
    w = jnp.exp(deltas[..., 3]) * a_w
    cy = deltas[..., 0] * a_h + a_cy
    cx = deltas[..., 1] * a_w + a_cx
    planes = jnp.stack(
        [cy - 0.5 * h, cx - 0.5 * w, cy + 0.5 * h, cx + 0.5 * w], axis=1
    )  # (B, 4, N)
    return planes, scores


def decode_outputs_packed(
    anchors: jnp.ndarray,
    rpn_reg: jnp.ndarray,
    rpn_cls_logits: jnp.ndarray,
    hp: HyperParams,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode head outputs straight into the NMS kernel's packed page-major
    layout: ((B, n_pad//128, 1920) bf16-split planes, (B, N) scores).

    Same math as :func:`decode_outputs_planes` + kernels.proposal_pallas.
    pack_planes, but builds the (B, pages, 640) layout with free reshapes and
    a lane concat instead of materializing (B, 4, N) and transposing it
    (~0.2 ms saved at B=128).
    """
    from .kernels.proposal_pallas import split_bf16_3way

    B = rpn_reg.shape[0]
    deltas = rpn_reg.reshape(B, -1, 4) * jnp.asarray(hp.variances, jnp.float32)
    scores = jax.nn.sigmoid(rpn_cls_logits.reshape(B, -1))
    N = scores.shape[1]
    n_pad = ((N + 1023) // 1024) * 1024
    pages = n_pad // 128
    a_h = anchors[:, 2] - anchors[:, 0]
    a_w = anchors[:, 3] - anchors[:, 1]
    a_cy = anchors[:, 0] + 0.5 * a_h
    a_cx = anchors[:, 1] + 0.5 * a_w
    h = jnp.exp(deltas[..., 2]) * a_h
    w = jnp.exp(deltas[..., 3]) * a_w
    cy = deltas[..., 0] * a_h + a_cy
    cx = deltas[..., 1] * a_w + a_cx
    coords = (cy - 0.5 * h, cx - 0.5 * w, cy + 0.5 * h, cx + 0.5 * w, scores)
    pad = n_pad - N
    # (B, N) -> (B, pages, 128) is a free row-major reshape; lane-concat the
    # five planes into the page rows
    pt = jnp.concatenate(
        [
            jnp.pad(c.astype(jnp.float32), ((0, 0), (0, pad))).reshape(
                B, pages, 128
            )
            for c in coords
        ],
        axis=2,
    )  # (B, pages, 640)
    return split_bf16_3way(pt), scores


def generate_proposals_packed(
    planes_t: jnp.ndarray,
    scores: jnp.ndarray,
    hp: HyperParams,
    topn: int,
    block: int = 128,
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Proposal selection on :func:`decode_outputs_packed` outputs."""
    from .kernels.proposal_pallas import fused_proposals_packed

    N = scores.shape[1]
    return fused_proposals_packed(
        planes_t, scores, pre=min(hp.pre_nms_topn, N),
        iou_threshold=float(hp.nms_iou_threshold), max_output=topn,
        block=block, interpret=interpret,
    )


def generate_proposals_planes(
    box_planes: jnp.ndarray,
    scores: jnp.ndarray,
    hp: HyperParams,
    topn: int,
    block: int = 128,
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """TPU fast path of :func:`generate_proposals` on plane-layout boxes.

    Identical selection semantics (bit-for-bit, tests/test_proposal_pallas.py),
    implemented by the fused top-k + lazy-gather + NMS + compaction kernel —
    round 1's 5-operand payload sort + keep-mask kernel + output gathers spent
    ~5.2 ms/batch at B=128 where the fused kernel spends ~3.1.
    """
    from .kernels.proposal_pallas import fused_proposals_planes

    N = box_planes.shape[2]
    return fused_proposals_planes(
        box_planes, scores, pre=min(hp.pre_nms_topn, N),
        iou_threshold=float(hp.nms_iou_threshold), max_output=topn,
        block=block, interpret=interpret,
    )


def make_predict_fn(model, hp: HyperParams, topn: int | None = None, mesh=None,
                    fast: bool = False, from_uint8: bool = False):
    """Build the full jitted inference step: images -> proposals.

    Mirrors the reference predictor's per-batch flow
    (model.predict_on_batch -> reshape -> decode -> NMS) as ONE compiled
    program — forward, decode, top-k and NMS all stay on device. On TPU the
    plane-layout fast path is used (same selection, faster gathers).

    With ``mesh`` (a 1-D 'data' mesh, train.make_data_mesh), the image batch
    is sharded over the mesh's devices and the variables replicated — every
    image's proposals are computed on its shard's device with no cross-device
    communication (proposal selection is per-image), so serving throughput
    scales linearly over the mesh.

    ``fast=True`` (TPU + folded-BN mobilenet_v2 only) swaps the backbone
    mid-stage for the fused inverted-residual Pallas kernel
    (tpurpn.inference) — the small-batch serving optimization; outputs agree
    with the flax forward at bf16 tolerance (tests/test_ir_stage.py).

    ``from_uint8=True`` accepts raw uint8 frames instead of preprocessed
    images: on-device uint8 -> [0,1] bf16 + bilinear resize to
    ``hp.img_size`` happens inside the compiled program (the serving e2e
    path, BASELINE config 2). Combined with ``fast=True`` on upsampled
    even-size inputs, the resize emits space-to-depth layout directly and
    Conv1 runs folded (tpurpn.inference.s2d_uint8_stem; parity in
    tests/test_inference_s2d.py).

    Serving batch size: prefer powers of two (128 or 256 on v5e). The
    measured throughput curve is non-monotone — 6180 img/s @128 and 6049
    @256 but only ~4600-5300 across 160-224 (XLA conv efficiency resonates
    with power-of-two batches; BASELINE.md config-2 analysis, r5 sweep) —
    so a dispatcher should pad/split request batches to those sizes.
    """
    anchors = generate_anchors(hp)
    out_topn = hp.test_nms_topn if topn is None else topn
    use_planes = jax.default_backend() == "tpu"
    if fast:
        assert hp.backbone == "mobilenet_v2" and getattr(
            model.module, "fold_bn", False
        ), "fast=True requires the folded-BN mobilenet_v2 model"
        # fail with a clear message instead of a deep Mosaic lowering error:
        # the fused IR-stage kernel compiles on TPU only (tests stubbing the
        # fast forwards set TPURPN_FAST_ON_CPU=1)
        assert jax.default_backend() == "tpu" or os.environ.get(
            "TPURPN_FAST_ON_CPU"
        ), ("fast=True runs the fused Pallas serving stage, which requires "
            f"a TPU backend (current: {jax.default_backend()!r}); use "
            "fast=False here")
        assert mesh is None, (
            "fast=True is the single-device small-batch serving path; the "
            "fused Pallas stage has no partitioning rule under a mesh — "
            "use fast=False with mesh, or shard batches across separate "
            "single-device predict fns"
        )

    def forward(variables, images):
        if from_uint8:
            raw = images
            # hard error, not assert: user-facing input validation must
            # survive ``python -O`` — a float frame slipping through would be
            # silently renormalized by /255 into near-black images (ADVICE r3)
            if raw.dtype != jnp.uint8:
                raise TypeError(
                    "from_uint8=True expects raw uint8 frames; got dtype "
                    f"{raw.dtype} — already-preprocessed float images would "
                    "be silently renormalized by /255 into near-black frames"
                )
            from .inference import s2d_stem_supported

            if fast and s2d_stem_supported(hp, raw.shape):
                from .inference import fast_uint8_forward

                return fast_uint8_forward(hp, variables, raw)
            from .data import preprocess_batch

            images, _ = preprocess_batch(
                raw, jnp.zeros((raw.shape[0], 1, 4), jnp.float32),
                hp.img_size, dtype=jnp.dtype(hp.compute_dtype),
            )
        if fast:
            from .inference import fast_mobilenet_forward

            return fast_mobilenet_forward(hp, variables, images)
        return model.module.apply(variables, images, train=False)

    def predict_fn(variables, images):
        rpn_reg, rpn_cls_logits = forward(variables, images)
        if use_planes:
            planes_t, scores = decode_outputs_packed(anchors, rpn_reg, rpn_cls_logits, hp)
            return generate_proposals_packed(planes_t, scores, hp, topn=out_topn)
        boxes, scores = decode_outputs(anchors, rpn_reg, rpn_cls_logits, hp)
        return generate_proposals(boxes, scores, hp, topn=out_topn)

    if mesh is None:
        return jax.jit(predict_fn)

    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))
    jitted = jax.jit(
        predict_fn,
        in_shardings=(replicated, batch_sharded),
        out_shardings=batch_sharded,
    )

    def wrapped(variables, images):
        with jax.set_mesh(mesh):
            return jitted(variables, images)

    return wrapped
