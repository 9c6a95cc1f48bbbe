"""Pallas NMS kernel vs its jnp twin (interpret mode on CPU; SURVEY.md §7
build-order step 5: every Pallas kernel A/B-tested against its jnp twin)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpurpn.boxes import _nms_keep_sorted_batched, batched_non_max_suppression
from tpurpn.kernels.nms_pallas import nms_pallas_keep


def sorted_boxes(rng, B, N):
    b = np.zeros((B, N, 4), np.float32)
    b[..., :2] = rng.uniform(0, 0.7, (B, N, 2))
    b[..., 2:] = b[..., :2] + rng.uniform(0.05, 0.3, (B, N, 2))
    s = rng.uniform(0, 1, (B, N)).astype(np.float32)
    order = np.argsort(-s, axis=-1)
    bs = np.take_along_axis(b, order[..., None], 1)
    ss = np.take_along_axis(s, order, 1)
    return jnp.asarray(bs), jnp.asarray(ss)


@pytest.mark.parametrize("B,N,maxout,thr", [(2, 256, 50, 0.7), (4, 640, 100, 0.5)])
def test_pallas_keep_matches_twin(rng, B, N, maxout, thr):
    bs, ss = sorted_boxes(rng, B, N)
    valid = jnp.ones((B, N), bool)
    ref = np.asarray(_nms_keep_sorted_batched(bs, valid, thr, 128, maxout))
    got, cnt = nms_pallas_keep(bs, valid, thr, maxout, interpret=True)
    np.testing.assert_array_equal(ref, np.asarray(got))
    np.testing.assert_array_equal(ref.sum(-1), np.asarray(cnt))


def test_pallas_keep_respects_validity(rng):
    bs, ss = sorted_boxes(rng, 2, 256)
    valid = jnp.asarray(np.arange(256) < 100)[None].repeat(2, 0)
    ref = np.asarray(_nms_keep_sorted_batched(bs, valid, 0.7, 128, 300))
    got, _ = nms_pallas_keep(bs, valid, 0.7, 300, interpret=True)
    np.testing.assert_array_equal(ref, np.asarray(got))
    assert not np.asarray(got)[:, 100:].any()


def test_pallas_early_exit_heavy_overlap(rng):
    # one dominant cluster: kernel must stop early and keep counts must agree
    base = np.array([0.2, 0.2, 0.6, 0.6], np.float32)
    b = np.tile(base, (1, 512, 1)) + rng.normal(0, 0.001, (1, 512, 4)).astype(
        np.float32
    )
    bs = jnp.asarray(b)
    valid = jnp.ones((1, 512), bool)
    ref = np.asarray(_nms_keep_sorted_batched(bs, valid, 0.7, 128, 10))
    got, cnt = nms_pallas_keep(bs, valid, 0.7, 10, interpret=True)
    np.testing.assert_array_equal(ref, np.asarray(got))
    # the early-exit path must leave the keep-COUNT accumulator consistent
    # with the mask, not just the mask itself
    np.testing.assert_array_equal(ref.sum(-1), np.asarray(cnt))


def test_pallas_keep_block_not_dividing_chunk(rng):
    """block=384 (documented-valid: multiple of 128) must work — the kernel
    rounds the internal chunk up to a block multiple instead of asserting."""
    bs, ss = sorted_boxes(rng, 2, 768)
    valid = jnp.ones((2, 768), bool)
    # same block for the twin: the early-exit overshoot inside the final
    # processed block is a function of the block size
    ref = np.asarray(_nms_keep_sorted_batched(bs, valid, 0.7, 384, 80))
    got, cnt = nms_pallas_keep(bs, valid, 0.7, 80, block=384, interpret=True)
    np.testing.assert_array_equal(ref, np.asarray(got))
    np.testing.assert_array_equal(ref.sum(-1), np.asarray(cnt))


def test_batched_nms_pallas_flag_matches_xla(rng):
    """The PUBLIC API with use_pallas=True (the production default on TPU)
    must select identically to the XLA path and to TF — on CPU the same
    kernel runs through the Pallas interpreter, so the production glue
    (keep-mask -> sorted-index compaction -> num_valid) is what's tested."""
    bs, ss = sorted_boxes(rng, 2, 256)
    idx_a, nv_a = batched_non_max_suppression(
        bs, ss, 50, 0.6, presorted=True, use_pallas=False
    )
    idx_p, nv_p = batched_non_max_suppression(
        bs, ss, 50, 0.6, presorted=True, use_pallas=True
    )
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_p))
    np.testing.assert_array_equal(np.asarray(nv_a), np.asarray(nv_p))
    assert idx_a.shape == (2, 50)
    tf = pytest.importorskip("tensorflow")
    for b in range(2):
        tf_idx = tf.image.non_max_suppression(
            np.asarray(bs[b]), np.asarray(ss[b]), 50, iou_threshold=0.6
        )
        np.testing.assert_array_equal(
            np.asarray(idx_a[b])[: int(nv_a[b])], tf_idx.numpy()
        )

@pytest.mark.tpu
def test_pallas_keep_matches_twin_on_device(rng):
    """Non-interpreted kernel on the real TPU vs the jnp twin (VERDICT r1 #4)."""
    bs, ss = sorted_boxes(rng, 4, 2048)
    valid = jnp.ones((4, 2048), bool)
    ref = np.asarray(_nms_keep_sorted_batched(bs, valid, 0.7, 256, 300))
    got, cnt = nms_pallas_keep(bs, valid, 0.7, 300, block=256)
    np.testing.assert_array_equal(ref, np.asarray(got))
    np.testing.assert_array_equal(ref.sum(-1), np.asarray(cnt))
