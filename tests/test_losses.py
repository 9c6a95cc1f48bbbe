"""Loss parity vs the TF oracle (Keras Huber / BinaryCrossentropy masking)."""

import numpy as np
import pytest
import jax.numpy as jnp

from tpurpn.losses import huber, reg_loss, rpn_cls_loss, rpn_cls_loss_probs

tf = pytest.importorskip("tensorflow")


def _tf_reg_loss(y_true, y_pred):
    """The reference's reg_loss, executed with real TF kernels as oracle
    (reference: utils/train_utils.reg_loss — masked Keras Huber / #pos)."""
    y_true = tf.reshape(y_true, (tf.shape(y_true)[0], -1, 4))
    y_pred = tf.reshape(y_pred, (tf.shape(y_pred)[0], -1, 4))
    loss_fn = tf.keras.losses.Huber(reduction="none")
    loss_for_all = loss_fn(y_true, y_pred)
    pos_mask = tf.cast(tf.reduce_any(tf.not_equal(y_true, 0.0), axis=-1), tf.float32)
    total = tf.reduce_sum(pos_mask * loss_for_all)
    return total / tf.maximum(1.0, tf.reduce_sum(pos_mask))


def _tf_cls_loss(y_true, probs):
    """The reference's rpn_cls_loss oracle: Keras BCE over labels != -1."""
    indices = tf.where(tf.not_equal(y_true, -1.0))
    target = tf.gather_nd(y_true, indices)
    output = tf.gather_nd(probs, indices)
    return tf.keras.losses.BinaryCrossentropy()(target, output)


def _fake_targets(rng, B=2, fm=8, A=9, pos_frac=0.02):
    deltas = np.zeros((B, fm, fm, A * 4), np.float32)
    labels = -np.ones((B, fm, fm, A), np.float32)
    n = B * fm * fm * A
    flat_lab = labels.reshape(-1)
    flat_del = deltas.reshape(-1, 4)
    idx = rng.permutation(n)
    n_pos = max(1, int(n * pos_frac))
    n_neg = n_pos * 3
    flat_lab[idx[:n_pos]] = 1.0
    flat_lab[idx[n_pos : n_pos + n_neg]] = 0.0
    flat_del[idx[:n_pos]] = rng.normal(0, 1, (n_pos, 4))
    return deltas, labels


def test_huber_elementwise_matches_tf(rng):
    e = rng.normal(0, 2, size=(1000,)).astype(np.float32)
    ours = np.asarray(huber(jnp.asarray(e)))
    theirs = tf.keras.losses.Huber(reduction="none")(
        np.zeros((1000, 1), np.float32), e.reshape(-1, 1)
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_reg_loss_matches_tf_oracle(rng):
    deltas, _ = _fake_targets(rng)
    preds = rng.normal(0, 1, deltas.shape).astype(np.float32)
    ours = float(reg_loss(jnp.asarray(deltas), jnp.asarray(preds)))
    theirs = float(_tf_reg_loss(deltas, preds))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_reg_loss_no_positives_is_zero(rng):
    deltas = np.zeros((2, 4, 4, 36), np.float32)
    preds = rng.normal(0, 1, deltas.shape).astype(np.float32)
    assert float(reg_loss(jnp.asarray(deltas), jnp.asarray(preds))) == 0.0


def test_cls_loss_probs_matches_tf_oracle(rng):
    _, labels = _fake_targets(rng)
    probs = rng.uniform(0.01, 0.99, labels.shape).astype(np.float32)
    ours = float(rpn_cls_loss_probs(jnp.asarray(labels), jnp.asarray(probs)))
    theirs = float(_tf_cls_loss(labels, probs))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_cls_loss_logits_equals_probs_variant(rng):
    _, labels = _fake_targets(rng)
    logits = rng.normal(0, 2, labels.shape).astype(np.float32)
    probs = 1.0 / (1.0 + np.exp(-logits))
    a = float(rpn_cls_loss(jnp.asarray(labels), jnp.asarray(logits)))
    b = float(rpn_cls_loss_probs(jnp.asarray(labels), jnp.asarray(probs)))
    np.testing.assert_allclose(a, b, rtol=1e-4)


def test_cls_loss_ignores_minus_one(rng):
    labels = -np.ones((1, 4, 4, 9), np.float32)
    labels[0, 0, 0, 0] = 1.0
    logits = rng.normal(0, 1, labels.shape).astype(np.float32)
    ours = float(rpn_cls_loss(jnp.asarray(labels), jnp.asarray(logits)))
    # only one valid entry -> loss equals its own BCE
    x = logits[0, 0, 0, 0]
    expected = max(x, 0) - x * 1 + np.log1p(np.exp(-abs(x)))
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_losses_are_finite_at_extremes():
    labels = np.zeros((1, 2, 2, 9), np.float32)
    logits = np.full(labels.shape, 80.0, np.float32)  # saturated wrong side
    val = float(rpn_cls_loss(jnp.asarray(labels), jnp.asarray(logits)))
    assert np.isfinite(val) and val > 50  # ~= logit value for BCE
