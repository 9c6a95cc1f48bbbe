"""RPN losses: masked smooth-L1 (Huber) regression + masked BCE objectness.

TPU-native rebuild of the reference's ``utils/train_utils.reg_loss`` /
``rpn_cls_loss`` (SURVEY.md §2 row 6; BASELINE.json:5 "smooth-L1 reg + binary
cross-entropy objectness"). Masking semantics match the reference exactly:

* reg: Huber(delta=1) averaged over the 4 delta components per anchor (Keras
  ``tf.losses.Huber`` reduction), summed over anchors whose target row is
  nonzero (= the sampled positives), divided by max(1, #positives).
* cls: binary cross-entropy averaged over entries with label != -1 (the
  sampled positives + negatives; ignore band contributes nothing).

Unlike the reference (sigmoid probabilities out of the model -> clipped BCE),
the cls loss here takes **logits** — the numerically stable, fusion-friendly
form on TPU. ``rpn_cls_loss_probs`` provides the reference-identical
probability-input variant for parity testing.
"""

from __future__ import annotations

import jax.numpy as jnp


def huber(error: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    """Elementwise Huber: 0.5 e^2 for |e| <= delta else delta(|e| - 0.5 delta)."""
    abs_e = jnp.abs(error)
    quad = jnp.minimum(abs_e, delta)
    return 0.5 * quad * quad + delta * (abs_e - quad)


def reg_pos_count(y_true: jnp.ndarray) -> jnp.ndarray:
    """Number of positive anchors (nonzero target rows) — reg_loss's
    denominator. Exposed so gradient accumulation can normalize microbatch
    sums by the GLOBAL count (train.make_train_step grad_accum)."""
    t = y_true.reshape(y_true.shape[0], -1, 4)
    return jnp.sum(jnp.any(t != 0.0, axis=-1).astype(jnp.float32))


def reg_loss(
    y_true: jnp.ndarray, y_pred: jnp.ndarray, normalizer=None
) -> jnp.ndarray:
    """Masked smooth-L1 box-regression loss.

    Args:
      y_true: (B, fm, fm, A*4) target deltas (zero outside positives) — the
        output of target.calculate_rpn_actual_outputs.
      y_pred: (B, fm, fm, A*4) predicted deltas.
      normalizer: optional denominator override. Default is
        max(1, #positives in y_true); gradient accumulation passes the
        global count so microbatch losses sum EXACTLY to the full-batch loss.

    Positive anchors are identified by a nonzero target row, exactly like the
    reference (utils/train_utils.reg_loss).
    """
    B = y_true.shape[0]
    t = y_true.reshape(B, -1, 4)
    p = y_pred.reshape(B, -1, 4)
    per_anchor = jnp.mean(huber(t - p), axis=-1)  # Keras Huber: mean over last axis
    pos = jnp.any(t != 0.0, axis=-1).astype(jnp.float32)
    total = jnp.sum(per_anchor * pos)
    if normalizer is None:
        normalizer = jnp.maximum(1.0, jnp.sum(pos))
    return total / normalizer


def cls_valid_count(y_true: jnp.ndarray) -> jnp.ndarray:
    """Number of counted (label != -1) anchors — rpn_cls_loss's denominator."""
    return jnp.sum((y_true != -1.0).astype(jnp.float32))


def rpn_cls_loss(
    y_true: jnp.ndarray, logits: jnp.ndarray, normalizer=None
) -> jnp.ndarray:
    """Masked binary cross-entropy objectness loss, from logits.

    Args:
      y_true: (B, fm, fm, A) labels in {1, 0, -1}; -1 entries are ignored.
      logits: (B, fm, fm, A) raw objectness logits.
      normalizer: optional denominator override (see reg_loss).
    """
    valid = (y_true != -1.0).astype(jnp.float32)
    target = jnp.clip(y_true, 0.0, 1.0)
    # stable sigmoid BCE: max(x,0) - x*z + log(1 + exp(-|x|))
    x = logits
    bce = jnp.maximum(x, 0.0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if normalizer is None:
        normalizer = jnp.maximum(1.0, jnp.sum(valid))
    return jnp.sum(bce * valid) / normalizer


def rpn_cls_loss_probs(
    y_true: jnp.ndarray, probs: jnp.ndarray, eps: float = 1e-7
) -> jnp.ndarray:
    """Reference-identical cls loss from sigmoid probabilities.

    Matches Keras BinaryCrossentropy (probability clipping at eps) over
    entries with label != -1 — used for oracle parity tests.
    """
    valid = (y_true != -1.0).astype(jnp.float32)
    target = jnp.clip(y_true, 0.0, 1.0)
    p = jnp.clip(probs, eps, 1.0 - eps)
    bce = -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
    return jnp.sum(bce * valid) / jnp.maximum(1.0, jnp.sum(valid))
