"""Target assignment on hand-constructed GT layouts (SURVEY.md §3.4 / §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpurpn import get_hyper_params, generate_anchors, get_bboxes_from_deltas
from tpurpn.target import calculate_rpn_actual_outputs, random_select_mask


@pytest.fixture(scope="module")
def hp():
    return get_hyper_params("vgg16")


@pytest.fixture(scope="module")
def anchors(hp):
    return generate_anchors(hp)


def make_gt(hp, boxes_list, n_pad=8):
    """Build a padded (1, M, 4) gt + (1, M) labels batch from a python list."""
    m = len(boxes_list)
    boxes = np.zeros((1, n_pad, 4), np.float32)
    labels = np.full((1, n_pad), -1, np.int32)
    if m:
        boxes[0, :m] = boxes_list
        labels[0, :m] = 1
    return jnp.asarray(boxes), jnp.asarray(labels)


def test_every_gt_gets_a_positive(hp, anchors):
    # small awkward boxes that may have IoU < pos_threshold with every anchor
    gt, labels = make_gt(
        hp, [[0.01, 0.01, 0.06, 0.04], [0.5, 0.5, 0.52, 0.58], [0.2, 0.7, 0.45, 0.95]]
    )
    deltas, out_labels = calculate_rpn_actual_outputs(
        anchors, gt, labels, hp, jax.random.key(0)
    )
    flat_labels = np.asarray(out_labels).reshape(-1)
    pos_idx = np.where(flat_labels == 1)[0]
    assert len(pos_idx) >= 3  # at least one per GT (forced best-anchor-per-GT)
    # each GT's best anchor is positive
    from tpurpn.boxes import generate_iou_map

    iou = np.asarray(generate_iou_map(anchors, gt[0]))  # (N, M)
    for m in range(3):
        assert flat_labels[iou[:, m].argmax()] == 1


def test_label_values_and_counts(hp, anchors, rng):
    # many GTs spread around -> plenty of pos and neg candidates
    boxes = []
    for _ in range(6):
        y, x = rng.uniform(0.05, 0.6, 2)
        h, w = rng.uniform(0.2, 0.35, 2)
        boxes.append([y, x, min(y + h, 1), min(x + w, 1)])
    gt, labels = make_gt(hp, boxes)
    _, out_labels = calculate_rpn_actual_outputs(
        anchors, gt, labels, hp, jax.random.key(1)
    )
    flat = np.asarray(out_labels).reshape(-1)
    assert set(np.unique(flat)).issubset({-1.0, 0.0, 1.0})
    n_pos = int((flat == 1).sum())
    n_neg = int((flat == 0).sum())
    assert 1 <= n_pos <= hp.total_pos_bboxes
    # negatives fill the 256-anchor minibatch
    assert n_pos + n_neg == hp.total_pos_bboxes + hp.total_neg_bboxes


def test_padded_gt_rows_do_not_force_positives(hp, anchors):
    gt, labels = make_gt(hp, [])  # zero valid GTs, all padding
    deltas, out_labels = calculate_rpn_actual_outputs(
        anchors, gt, labels, hp, jax.random.key(2)
    )
    flat = np.asarray(out_labels).reshape(-1)
    assert (flat == 1).sum() == 0  # nothing forced positive by padding
    assert (flat == 0).sum() == hp.total_pos_bboxes + hp.total_neg_bboxes
    np.testing.assert_array_equal(np.asarray(deltas), 0.0)


def test_positive_deltas_decode_to_matched_gt(hp, anchors):
    gt_box = [0.3, 0.3, 0.62, 0.58]
    gt, labels = make_gt(hp, [gt_box])
    deltas, out_labels = calculate_rpn_actual_outputs(
        anchors, gt, labels, hp, jax.random.key(3)
    )
    flat_labels = np.asarray(out_labels).reshape(-1)
    flat_deltas = np.asarray(deltas).reshape(-1, 4) * np.asarray(hp.variances)
    pos = np.where(flat_labels == 1)[0]
    assert len(pos) > 0
    decoded = np.asarray(
        get_bboxes_from_deltas(anchors[pos], jnp.asarray(flat_deltas[pos]))
    )
    np.testing.assert_allclose(decoded, np.tile(gt_box, (len(pos), 1)), atol=1e-5)


def test_deltas_zero_outside_positives(hp, anchors):
    gt, labels = make_gt(hp, [[0.3, 0.3, 0.6, 0.6]])
    deltas, out_labels = calculate_rpn_actual_outputs(
        anchors, gt, labels, hp, jax.random.key(4)
    )
    flat_labels = np.asarray(out_labels).reshape(-1)
    flat_deltas = np.asarray(deltas).reshape(-1, 4)
    nonpos = flat_labels != 1
    np.testing.assert_array_equal(flat_deltas[nonpos], 0.0)


def test_deterministic_given_key(hp, anchors):
    gt, labels = make_gt(hp, [[0.2, 0.2, 0.5, 0.5], [0.6, 0.1, 0.9, 0.4]])
    a = calculate_rpn_actual_outputs(anchors, gt, labels, hp, jax.random.key(7))
    b = calculate_rpn_actual_outputs(anchors, gt, labels, hp, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_batched_independent(hp, anchors):
    gt1, l1 = make_gt(hp, [[0.2, 0.2, 0.5, 0.5]])
    gt2, l2 = make_gt(hp, [])
    gt = jnp.concatenate([gt1, gt2], 0)
    labels = jnp.concatenate([l1, l2], 0)
    deltas, out_labels = calculate_rpn_actual_outputs(
        anchors, gt, labels, hp, jax.random.key(5)
    )
    assert deltas.shape == (2, hp.feature_map_shape, hp.feature_map_shape, 36)
    assert out_labels.shape == (2, hp.feature_map_shape, hp.feature_map_shape, 9)
    flat2 = np.asarray(out_labels[1]).reshape(-1)
    assert (flat2 == 1).sum() == 0  # empty image has no positives


def test_random_select_mask_counts():
    key = jax.random.key(0)
    mask = jnp.asarray(np.arange(100) % 2 == 0)  # 50 candidates
    sel = random_select_mask(mask, 10, key)
    assert int(sel.sum()) == 10
    assert bool(jnp.all(mask | ~sel))  # selection subset of mask
    sel_all = random_select_mask(mask, 200, key)
    assert int(sel_all.sum()) == 50  # cap above candidate count keeps all


def test_random_select_mask_batched_counts():
    key = jax.random.key(1)
    mask = jnp.ones((3, 40), bool)
    counts = jnp.asarray([5, 40, 0])
    sel = random_select_mask(mask, counts, key)
    np.testing.assert_array_equal(np.asarray(sel.sum(axis=-1)), [5, 40, 0])


def test_random_select_mask_uniformity():
    # every candidate should be selected ~uniformly across keys
    mask = jnp.ones((64,), bool)
    hits = np.zeros(64)
    for s in range(200):
        hits += np.asarray(random_select_mask(mask, 8, jax.random.key(s)))
    # expectation 25 each; loose bound to avoid flakes
    assert hits.min() > 5 and hits.max() < 60


def test_threshold_values_pinned():
    """Pin the config's threshold/budget values: the band tests below and
    every backend-parity test share hp, so a silently changed VALUE would
    pass them all (reviewer finding). These are the framework's documented
    contract (config.py; SURVEY.md §5 config row)."""
    hp = get_hyper_params("vgg16")
    assert hp.pos_threshold == 0.7
    assert hp.neg_threshold == 0.3
    assert hp.total_pos_bboxes == 128
    assert hp.total_neg_bboxes == 128
    assert tuple(hp.variances) == (0.1, 0.1, 0.2, 0.2)


def test_ignore_band_semantics(rng):
    """SURVEY.md §3.4: neg_thr < IoU < pos_thr (and not forced) -> label -1.

    Property-checked against the real anchor grid: for every anchor, the
    label must be consistent with its measured best IoU — mid-band anchors
    that are not a GT's best anchor can NEVER be sampled as positives or
    negatives. A collapsed band (e.g. neg_threshold drifting up) fails this
    with high probability."""
    from tpurpn.boxes import generate_iou_map
    from tpurpn.target import iou_matching

    hp = get_hyper_params("vgg16", img_size=160)
    anchors = generate_anchors(hp)
    B, M = 2, 8
    boxes = np.zeros((B, M, 4), np.float32)
    labels_in = np.full((B, M), -1, np.int32)
    for b in range(B):
        for i in range(5):
            y, x = rng.uniform(0, 0.5, 2)
            h, w = rng.uniform(0.15, 0.45, 2)
            boxes[b, i] = (y, x, min(y + h, 1), min(x + w, 1))
            labels_in[b, i] = 1 + int(rng.integers(0, 20))
    gt = jnp.asarray(boxes)
    gl = jnp.asarray(labels_in)

    deltas, lab = calculate_rpn_actual_outputs(
        anchors, gt, gl, hp, jax.random.key(3), use_pallas=False
    )
    lab = np.asarray(lab).reshape(B, -1)

    merged, _, best_anchor = iou_matching(anchors, gt)
    merged = np.asarray(merged)
    forced = np.zeros_like(merged, bool)
    ba = np.asarray(best_anchor)
    for b in range(B):
        for m in range(M):
            if labels_in[b, m] != -1:
                forced[b, ba[b, m]] = True

    mid_band = (
        (merged >= hp.neg_threshold) & (merged <= hp.pos_threshold) & ~forced
    )
    # there must be enough mid-band anchors for the property to bite
    assert mid_band.sum() >= 20, mid_band.sum()
    np.testing.assert_array_equal(lab[mid_band], -1.0)
    # positives only above the band or forced; negatives only below it
    assert np.all(merged[lab == 1.0] > hp.pos_threshold) or np.all(
        forced[lab == 1.0] | (merged[lab == 1.0] > hp.pos_threshold)
    )
    assert np.all(merged[lab == 0.0] < hp.neg_threshold)


def test_select_by_keys_contract(rng):
    """Direct unit tests of THE production subsampling rule (select_by_keys)
    — counts at boundaries, subset-of-candidates, k_max equivalence, and
    rough uniformity (the migration mirror random_select_mask has its own
    tests but production does not use it)."""
    from tpurpn.target import select_by_keys, target_rand_bits

    N, B = 512, 4
    cand = np.zeros((B, N), bool)
    avail = [300, 128, 40, 0]
    for b, a in enumerate(avail):
        idx = rng.choice(N, size=a, replace=False)
        cand[b, idx] = True
    cand = jnp.asarray(cand)
    words = target_rand_bits(jax.random.key(5), B, N)[:, 0]

    budget = 128.0
    k_eff = jnp.minimum(budget, jnp.asarray([float(a) for a in avail]))
    sel = select_by_keys(cand, words, k_eff)
    sel_np = np.asarray(sel)
    # exact counts: min(budget, available), including 0
    np.testing.assert_array_equal(sel_np.sum(-1), [128, 128, 40, 0])
    # selected only from candidates
    assert not np.any(sel_np & ~np.asarray(cand))
    # k_max-bounded fast path selects the identical subset
    sel_k = select_by_keys(cand, words, k_eff, k_max=128)
    np.testing.assert_array_equal(sel_np, np.asarray(sel_k))

    # rough uniformity: over many independent word draws, each of the 300
    # candidates of row 0 should be picked ~128/300 of the time
    R = 200
    counts = np.zeros(N)
    for r in range(R):
        w = target_rand_bits(jax.random.key(100 + r), B, N)[:, 0]
        counts += np.asarray(
            select_by_keys(cand[:1], w[:1], jnp.asarray([128.0]))
        )[0]
    p = 128.0 / 300.0
    freq = counts[np.asarray(cand[0])] / R
    # binomial std ~ sqrt(p(1-p)/R) ~ 0.035; allow 5 sigma
    assert np.all(np.abs(freq - p) < 0.18), (freq.min(), freq.max())
    # and nothing outside the candidate set was ever selected
    assert counts[~np.asarray(cand[0])].sum() == 0
