"""Fused proposal kernel (top-k + lazy gather + NMS + compaction) parity tests.

A/B against the reference-semantics jnp pipeline (generate_proposals), which
is itself oracle-tested against tf.image.non_max_suppression — so agreement
here is agreement with the TF reference (SURVEY.md §3.2).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from tpurpn import get_hyper_params
from tpurpn.kernels.proposal_pallas import fused_proposals_planes
from tpurpn.predict import generate_proposals

HP = get_hyper_params("vgg16", img_size=160, compute_dtype="float32")


def _random_candidates(rng, B, N):
    b = np.zeros((B, N, 4), np.float32)
    b[..., :2] = rng.uniform(0, 0.6, (B, N, 2))
    b[..., 2:] = b[..., :2] + rng.uniform(0.02, 0.4, (B, N, 2))
    scores = rng.uniform(0, 1, (B, N)).astype(np.float32)
    return b, scores


def _check(boxes, scores, hp, topn, pre=None, block=256):
    ref = generate_proposals(jnp.asarray(boxes), jnp.asarray(scores), hp, topn=topn)
    got = fused_proposals_planes(
        jnp.moveaxis(jnp.asarray(boxes), -1, 1),
        jnp.asarray(scores),
        pre=pre or min(hp.pre_nms_topn, boxes.shape[1]),
        iou_threshold=hp.nms_iou_threshold,
        max_output=topn,
        block=block,
        interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(ref["num_valid"]), np.asarray(got["num_valid"])
    )
    np.testing.assert_allclose(
        np.asarray(ref["roi_boxes"]), np.asarray(got["roi_boxes"]), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(ref["roi_scores"]), np.asarray(got["roi_scores"]), atol=0
    )
    return got


def test_random_parity(rng):
    boxes, scores = _random_candidates(rng, 3, 1500)
    _check(boxes, scores, HP, topn=50)


def test_early_exit_and_multiblock(rng):
    # enough well-separated boxes that several blocks must be processed
    boxes, scores = _random_candidates(rng, 2, 3000)
    _check(boxes, scores, HP, topn=300)


def test_duplicate_boxes_suppression(rng):
    # heavy suppression: few keeps, many blocks scanned (early exit never fires)
    base = np.array([0.2, 0.2, 0.5, 0.5], np.float32)
    other = np.array([0.6, 0.6, 0.9, 0.9], np.float32)
    boxes = np.tile(base, (1, 600, 1)).astype(np.float32)
    boxes[0, 599] = other
    scores = np.linspace(0.1, 0.9, 600, dtype=np.float32)[None]
    out = _check(boxes, scores, HP, topn=10)
    assert int(out["num_valid"][0]) == 2


def test_score_ties_break_by_index(rng):
    # many exactly-equal scores: top_k and the stable sort must agree
    boxes, _ = _random_candidates(rng, 2, 1024)
    scores = rng.integers(0, 7, (2, 1024)).astype(np.float32) / 7.0
    _check(boxes, scores, HP, topn=40)


def test_pre_smaller_than_n(rng):
    # pre-NMS crop smaller than N: candidates past pre must never appear
    boxes, scores = _random_candidates(rng, 2, 2048)
    hp = get_hyper_params(
        "vgg16", img_size=160, compute_dtype="float32", pre_nms_topn=512
    )
    _check(boxes, scores, hp, topn=100, pre=512)


def test_fewer_candidates_than_topn(rng):
    boxes, scores = _random_candidates(rng, 2, 160)
    ref = generate_proposals(jnp.asarray(boxes), jnp.asarray(scores), HP, topn=300)
    got = fused_proposals_planes(
        jnp.moveaxis(jnp.asarray(boxes), -1, 1), jnp.asarray(scores),
        pre=160, iou_threshold=HP.nms_iou_threshold, max_output=300,
        interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(ref["num_valid"]), np.asarray(got["num_valid"])
    )
    np.testing.assert_allclose(
        np.asarray(ref["roi_boxes"]), np.asarray(got["roi_boxes"]), atol=0
    )


def test_packed_decode_jitted_pipeline_exact(rng):
    """decode_outputs_packed + kernel inside ONE jit must stay bit-exact.

    Regression: XLA's excess-precision optimization elides f32->bf16->f32
    round-trips when the whole pipeline is fused into one program, which
    silently degraded the 3-way bf16 split to plain bf16 truncation of the
    box coordinates (caught on TPU; the split now uses integer bit-masking).
    """
    import jax

    from tpurpn.anchors import generate_anchors
    from tpurpn.predict import decode_outputs, decode_outputs_packed

    hp = HP
    anchors = generate_anchors(hp)
    N = hp.total_anchors
    reg = (rng.standard_normal((2, hp.feature_map_shape, hp.feature_map_shape,
                                4 * hp.anchor_count)) * 0.2).astype(np.float32)
    cls = rng.standard_normal(
        (2, hp.feature_map_shape, hp.feature_map_shape, hp.anchor_count)
    ).astype(np.float32)

    @jax.jit
    def fused(reg, cls):
        planes_t, scores = decode_outputs_packed(anchors, reg, cls, hp)
        from tpurpn.kernels.proposal_pallas import fused_proposals_packed

        return fused_proposals_packed(
            planes_t, scores, pre=min(hp.pre_nms_topn, N),
            iou_threshold=hp.nms_iou_threshold, max_output=100,
            interpret=True,
        )

    got = fused(jnp.asarray(reg), jnp.asarray(cls))
    boxes, scores = decode_outputs(anchors, jnp.asarray(reg), jnp.asarray(cls), hp)
    ref = generate_proposals(boxes, scores, hp, topn=100)
    np.testing.assert_array_equal(
        np.asarray(ref["num_valid"]), np.asarray(got["num_valid"])
    )
    # the two decode paths are separate XLA programs, so the f32 box math may
    # differ by 1 ulp (fma fusion); bf16 truncation (the regression) is ~1e-3
    np.testing.assert_allclose(
        np.asarray(ref["roi_boxes"]), np.asarray(got["roi_boxes"]), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(ref["roi_scores"]), np.asarray(got["roi_scores"]), atol=1e-7
    )


def test_split_bf16_3way_exact_inside_jit(rng):
    """hi+mid+lo must reconstruct the f32 value EXACTLY even when the split
    and the consumer fuse into one XLA program (the excess-precision trap)."""
    import jax

    from tpurpn.kernels.proposal_pallas import split_bf16_3way

    x = jnp.asarray(
        (rng.standard_normal((4, 640)) * rng.choice([1e-6, 1.0, 1e6], (4, 1)))
        .astype(np.float32)
    )

    @jax.jit
    def roundtrip(x):
        s = split_bf16_3way(x)
        return (
            s[..., :640].astype(jnp.float32)
            + s[..., 640:1280].astype(jnp.float32)
            + s[..., 1280:].astype(jnp.float32)
        )

    np.testing.assert_array_equal(np.asarray(roundtrip(x)), np.asarray(x))


@pytest.mark.tpu
def test_packed_decode_jitted_pipeline_exact_on_device(rng):
    """The same one-jit fused pipeline, non-interpreted on the real TPU."""
    import jax

    from tpurpn.anchors import generate_anchors
    from tpurpn.predict import (
        decode_outputs,
        decode_outputs_packed,
        generate_proposals_packed,
    )

    hp = HP
    anchors = generate_anchors(hp)
    reg = (rng.standard_normal((4, hp.feature_map_shape, hp.feature_map_shape,
                                4 * hp.anchor_count)) * 0.2).astype(np.float32)
    cls = rng.standard_normal(
        (4, hp.feature_map_shape, hp.feature_map_shape, hp.anchor_count)
    ).astype(np.float32)

    @jax.jit
    def fused(reg, cls):
        planes_t, scores = decode_outputs_packed(anchors, reg, cls, hp)
        return generate_proposals_packed(planes_t, scores, hp, topn=300)

    got = fused(jnp.asarray(reg), jnp.asarray(cls))
    boxes, scores = decode_outputs(anchors, jnp.asarray(reg), jnp.asarray(cls), hp)
    ref = generate_proposals(boxes, scores, hp, topn=300)
    np.testing.assert_array_equal(
        np.asarray(ref["num_valid"]), np.asarray(got["num_valid"])
    )
    np.testing.assert_allclose(
        np.asarray(ref["roi_boxes"]), np.asarray(got["roi_boxes"]), atol=0
    )


@pytest.mark.tpu
def test_random_parity_on_device(rng):
    """Non-interpreted kernel vs the jnp pipeline on the real TPU."""
    boxes, scores = _random_candidates(rng, 4, 8649)
    ref = generate_proposals(jnp.asarray(boxes), jnp.asarray(scores), HP, topn=300)
    got = fused_proposals_planes(
        jnp.moveaxis(jnp.asarray(boxes), -1, 1), jnp.asarray(scores),
        pre=min(HP.pre_nms_topn, 8649), iou_threshold=HP.nms_iou_threshold,
        max_output=300,
    )
    np.testing.assert_array_equal(
        np.asarray(ref["num_valid"]), np.asarray(got["num_valid"])
    )
    np.testing.assert_allclose(
        np.asarray(ref["roi_boxes"]), np.asarray(got["roi_boxes"]), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(ref["roi_scores"]), np.asarray(got["roi_scores"]), atol=0
    )
