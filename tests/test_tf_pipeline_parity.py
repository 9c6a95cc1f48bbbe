"""End-to-end proposal parity vs the reference's TF pipeline.

BASELINE.json:5 requires "bit-matched proposal outputs". This test rebuilds
the reference predictor's post-network pipeline with REAL TensorFlow kernels
(reshape -> deltas * variances -> decode vs anchors -> top-k ->
tf.image.non_max_suppression — rpn_predictor.py, SURVEY.md §3.2) and checks
that tpurpn's jitted pipeline selects the *same boxes in the same order*
given identical head outputs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpurpn import get_hyper_params, generate_anchors
from tpurpn.predict import (
    decode_outputs,
    decode_outputs_planes,
    generate_proposals,
    generate_proposals_planes,
)

tf = pytest.importorskip("tensorflow")


def tf_decode(anchors, rpn_reg, rpn_cls_logits, hp):
    """The reference predictor's decode math in TF ops (oracle)."""
    B = rpn_reg.shape[0]
    deltas = tf.reshape(tf.constant(rpn_reg), (B, -1, 4)) * tf.constant(
        list(hp.variances), tf.float32
    )
    scores = tf.sigmoid(tf.reshape(tf.constant(rpn_cls_logits), (B, -1)))

    # decode (reference bbox_utils.get_bboxes_from_deltas semantics)
    a = tf.constant(np.asarray(anchors))
    a_h = a[:, 2] - a[:, 0]
    a_w = a[:, 3] - a[:, 1]
    a_cy = a[:, 0] + 0.5 * a_h
    a_cx = a[:, 1] + 0.5 * a_w
    h = tf.exp(deltas[..., 2]) * a_h
    w = tf.exp(deltas[..., 3]) * a_w
    cy = deltas[..., 0] * a_h + a_cy
    cx = deltas[..., 1] * a_w + a_cx
    boxes = tf.stack(
        [cy - 0.5 * h, cx - 0.5 * w, cy + 0.5 * h, cx + 0.5 * w], axis=-1
    )
    return boxes.numpy(), scores.numpy()


def tf_select(boxes, scores, hp, topn):
    """The reference predictor's selection (top-k -> tf NMS) on GIVEN
    candidate arrays — fed the IDENTICAL candidates as tpurpn's selection,
    per CLAUDE.md's 1-ulp NMS-sensitivity rule (decode parity is asserted
    separately with a numeric tolerance)."""
    B = boxes.shape[0]
    out_boxes, out_scores, out_valid = [], [], []
    for b in range(B):
        top_scores, top_idx = tf.math.top_k(
            tf.constant(scores[b]), k=min(hp.pre_nms_topn, scores.shape[1])
        )
        top_boxes = tf.gather(tf.constant(boxes[b]), top_idx)
        sel = tf.image.non_max_suppression(
            top_boxes, top_scores, topn, iou_threshold=hp.nms_iou_threshold
        )
        bb = tf.gather(top_boxes, sel).numpy()
        ss = tf.gather(top_scores, sel).numpy()
        nv = len(sel.numpy())
        pad = topn - nv
        out_boxes.append(np.pad(bb, ((0, pad), (0, 0))))
        out_scores.append(np.pad(ss, ((0, pad),)))
        out_valid.append(nv)
    return np.stack(out_boxes), np.stack(out_scores), np.array(out_valid)


@pytest.fixture(scope="module")
def setup(rng):
    hp = get_hyper_params("vgg16", img_size=160)
    anchors = generate_anchors(hp)
    fm, A = hp.feature_map_shape, hp.anchor_count
    B = 3
    rpn_reg = rng.normal(0, 0.4, (B, fm, fm, A * 4)).astype(np.float32)
    rpn_cls = rng.normal(0, 1.5, (B, fm, fm, A)).astype(np.float32)
    return hp, anchors, rpn_reg, rpn_cls


# module-scope fixture needs a module-scope rng
@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(12)


def test_reference_path_matches_tf(setup):
    hp, anchors, rpn_reg, rpn_cls = setup
    topn = 80
    boxes, scores = decode_outputs(anchors, jnp.asarray(rpn_reg), jnp.asarray(rpn_cls), hp)

    # (a) decode parity vs the TF decode, numeric tolerance
    tfb, tfs = tf_decode(anchors, rpn_reg, rpn_cls, hp)
    np.testing.assert_allclose(np.asarray(boxes), tfb, atol=2e-6)
    np.testing.assert_allclose(np.asarray(scores), tfs, atol=2e-7)

    # (b) selection parity on IDENTICAL candidates (CLAUDE.md 1-ulp rule)
    ref_b, ref_s, ref_nv = tf_select(
        np.asarray(boxes), np.asarray(scores), hp, topn
    )
    out = generate_proposals(boxes, scores, hp, topn=topn)

    np.testing.assert_array_equal(np.asarray(out["num_valid"]), ref_nv)
    np.testing.assert_allclose(np.asarray(out["roi_boxes"]), ref_b, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out["roi_scores"]), ref_s, atol=1e-7)


def test_plane_path_matches_tf(setup):
    hp, anchors, rpn_reg, rpn_cls = setup
    topn = 80
    planes, scores = decode_outputs_planes(
        anchors, jnp.asarray(rpn_reg), jnp.asarray(rpn_cls), hp
    )
    # identical candidates to both selections: TF NMS consumes the SAME
    # plane-decoded boxes the kernel consumes
    boxes = np.asarray(jnp.moveaxis(planes, 1, -1))
    ref_b, ref_s, ref_nv = tf_select(boxes, np.asarray(scores), hp, topn)

    out = generate_proposals_planes(planes, scores, hp, topn=topn, interpret=True)

    np.testing.assert_array_equal(np.asarray(out["num_valid"]), ref_nv)
    np.testing.assert_allclose(np.asarray(out["roi_boxes"]), ref_b, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out["roi_scores"]), ref_s, atol=1e-7)
