"""Box geometry vs oracles: numpy reference + installed TF kernels (SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpurpn import (
    get_hyper_params,
    generate_anchors,
    get_deltas_from_bboxes,
    get_bboxes_from_deltas,
    generate_iou_map,
    non_max_suppression,
    batched_non_max_suppression,
    normalize_bboxes,
    denormalize_bboxes,
)

tf = pytest.importorskip("tensorflow")


def random_boxes(rng, n, scale=1.0):
    yx = rng.uniform(0, 0.8, size=(n, 2))
    hw = rng.uniform(0.05, 0.2, size=(n, 2))
    return np.concatenate([yx, yx + hw], axis=-1).astype(np.float32) * scale


# ---------------------------------------------------------------------------
# encode / decode
# ---------------------------------------------------------------------------


def test_delta_roundtrip(rng):
    anchors = random_boxes(rng, 256)
    gt = random_boxes(rng, 256)
    deltas = get_deltas_from_bboxes(jnp.asarray(anchors), jnp.asarray(gt))
    recon = get_bboxes_from_deltas(jnp.asarray(anchors), deltas)
    np.testing.assert_allclose(np.asarray(recon), gt, atol=1e-5)


def test_delta_zero_gt_encodes_to_zero(rng):
    anchors = random_boxes(rng, 8)
    gt = np.zeros((8, 4), np.float32)  # padding rows
    deltas = np.asarray(get_deltas_from_bboxes(jnp.asarray(anchors), jnp.asarray(gt)))
    np.testing.assert_array_equal(deltas, 0.0)


def test_decode_zero_deltas_identity(rng):
    anchors = random_boxes(rng, 32)
    boxes = np.asarray(
        get_bboxes_from_deltas(jnp.asarray(anchors), jnp.zeros((32, 4), np.float32))
    )
    np.testing.assert_allclose(boxes, anchors, atol=1e-6)


def test_encode_numpy_golden():
    anchor = jnp.array([[0.2, 0.2, 0.4, 0.6]], jnp.float32)  # h=.2 w=.4 c=(.3,.4)
    gt = jnp.array([[0.3, 0.3, 0.5, 0.5]], jnp.float32)  # h=.2 w=.2 c=(.4,.4)
    d = np.asarray(get_deltas_from_bboxes(anchor, gt))[0]
    np.testing.assert_allclose(
        d, [0.1 / 0.2, 0.0, np.log(0.2 / 0.2), np.log(0.2 / 0.4)], rtol=1e-5, atol=1e-7
    )


# ---------------------------------------------------------------------------
# IoU
# ---------------------------------------------------------------------------


def _np_iou(a, b):
    y1 = np.maximum(a[:, None, 0], b[None, :, 0])
    x1 = np.maximum(a[:, None, 1], b[None, :, 1])
    y2 = np.minimum(a[:, None, 2], b[None, :, 2])
    x2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(y2 - y1, 0, None) * np.clip(x2 - x1, 0, None)
    area = lambda z: (z[:, 2] - z[:, 0]) * (z[:, 3] - z[:, 1])
    union = area(a)[:, None] + area(b)[None, :] - inter
    return inter / np.maximum(union, 1e-8)


def test_iou_map_vs_numpy(rng):
    a = random_boxes(rng, 100)
    b = random_boxes(rng, 17)
    got = np.asarray(generate_iou_map(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _np_iou(a, b), atol=1e-5)


def test_iou_map_batched(rng):
    a = np.stack([random_boxes(rng, 50) for _ in range(3)])
    b = np.stack([random_boxes(rng, 7) for _ in range(3)])
    got = np.asarray(generate_iou_map(jnp.asarray(a), jnp.asarray(b)))
    assert got.shape == (3, 50, 7)
    for i in range(3):
        np.testing.assert_allclose(got[i], _np_iou(a[i], b[i]), atol=1e-5)


def test_iou_zero_area_rows(rng):
    a = np.zeros((4, 4), np.float32)
    b = random_boxes(rng, 5)
    got = np.asarray(generate_iou_map(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got, 0.0)
    assert not np.any(np.isnan(got))


def test_anchor_gt_iou_against_tf_shape(rng):
    hp = get_hyper_params("vgg16")
    anchors = generate_anchors(hp)
    gt = jnp.asarray(random_boxes(rng, 6))
    iou = generate_iou_map(anchors, gt)
    assert iou.shape == (hp.total_anchors, 6)
    assert float(iou.max()) <= 1.0 + 1e-6


# ---------------------------------------------------------------------------
# NMS vs tf.image.non_max_suppression (the oracle named in BASELINE.json:5)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n,iou_thr", [(64, 0.7), (300, 0.5), (1000, 0.7)])
def test_nms_matches_tf(rng, n, iou_thr):
    boxes = random_boxes(rng, n)
    scores = rng.uniform(0, 1, size=(n,)).astype(np.float32)
    k = min(n, 100)
    tf_idx = tf.image.non_max_suppression(boxes, scores, k, iou_threshold=iou_thr)
    idx, num_valid = non_max_suppression(
        jnp.asarray(boxes), jnp.asarray(scores), k, iou_threshold=iou_thr
    )
    idx = np.asarray(idx)
    nv = int(num_valid)
    np.testing.assert_array_equal(idx[:nv], tf_idx.numpy())
    assert np.all(idx[nv:] == -1)


def test_nms_heavy_overlap_cluster(rng):
    # many near-duplicates of few true boxes — stresses suppression chains
    centers = random_boxes(rng, 8)
    reps = np.repeat(centers, 32, axis=0)
    jitter = rng.normal(0, 0.004, size=reps.shape).astype(np.float32)
    boxes = np.clip(reps + jitter, 0, 1)
    scores = rng.uniform(0, 1, size=(len(boxes),)).astype(np.float32)
    tf_idx = tf.image.non_max_suppression(boxes, scores, 50, iou_threshold=0.6)
    idx, nv = non_max_suppression(
        jnp.asarray(boxes), jnp.asarray(scores), 50, iou_threshold=0.6
    )
    np.testing.assert_array_equal(np.asarray(idx)[: int(nv)], tf_idx.numpy())


def test_nms_tie_scores(rng):
    boxes = random_boxes(rng, 100)
    scores = np.round(rng.uniform(0, 1, size=(100,)).astype(np.float32), 1)  # ties
    tf_idx = tf.image.non_max_suppression(boxes, scores, 40, iou_threshold=0.7)
    idx, nv = non_max_suppression(jnp.asarray(boxes), jnp.asarray(scores), 40)
    np.testing.assert_array_equal(np.asarray(idx)[: int(nv)], tf_idx.numpy())


def test_nms_score_threshold(rng):
    boxes = random_boxes(rng, 128)
    scores = rng.uniform(0, 1, size=(128,)).astype(np.float32)
    tf_idx = tf.image.non_max_suppression(
        boxes, scores, 64, iou_threshold=0.7, score_threshold=0.5
    )
    idx, nv = non_max_suppression(
        jnp.asarray(boxes), jnp.asarray(scores), 64, score_threshold=0.5
    )
    np.testing.assert_array_equal(np.asarray(idx)[: int(nv)], tf_idx.numpy())


def test_batched_nms(rng):
    B, n, k = 4, 256, 60
    boxes = np.stack([random_boxes(rng, n) for _ in range(B)])
    scores = rng.uniform(0, 1, size=(B, n)).astype(np.float32)
    idx, nv = batched_non_max_suppression(jnp.asarray(boxes), jnp.asarray(scores), k)
    assert idx.shape == (B, k) and nv.shape == (B,)
    for b in range(B):
        tf_idx = tf.image.non_max_suppression(boxes[b], scores[b], k, iou_threshold=0.7)
        np.testing.assert_array_equal(np.asarray(idx[b])[: int(nv[b])], tf_idx.numpy())


# ---------------------------------------------------------------------------
# normalize / denormalize
# ---------------------------------------------------------------------------


def test_normalize_roundtrip(rng):
    boxes = random_boxes(rng, 16, scale=500.0)
    norm = normalize_bboxes(jnp.asarray(boxes), 500, 500)
    denorm = denormalize_bboxes(norm, 500, 500)
    np.testing.assert_allclose(np.asarray(denorm), boxes, rtol=1e-5)


def test_nms_max_output_exceeds_candidates(rng):
    """k > padded candidate count (tiny anchor grids) must clamp, not crash."""
    boxes = random_boxes(rng, 40)
    scores = rng.uniform(0, 1, size=(40,)).astype(np.float32)
    idx, nv = non_max_suppression(jnp.asarray(boxes), jnp.asarray(scores), 300, 0.99)
    assert idx.shape == (300,)
    assert int(nv) <= 40
    assert np.all(np.asarray(idx)[int(nv):] == -1)
    tf_idx = tf.image.non_max_suppression(boxes, scores, 300, iou_threshold=0.99)
    np.testing.assert_array_equal(np.asarray(idx)[: int(nv)], tf_idx.numpy())
