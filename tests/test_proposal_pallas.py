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
