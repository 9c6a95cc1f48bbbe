"""Train-step tests: loss decreases, mesh-sharded == single-device (SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpurpn import get_hyper_params
from tpurpn.data import SyntheticVOC, preprocess_batch
from tpurpn.model import get_model
from tpurpn.train import (
    TrainState,
    create_train_state,
    make_train_step,
    make_data_mesh,
    shard_batch,
    replicate,
)


def tiny_hp(backbone="vgg16"):
    return get_hyper_params(
        backbone,
        img_size=64,
        compute_dtype="float32",
        max_gt_boxes=8,
        total_pos_bboxes=16,
        total_neg_bboxes=16,
    )


def make_batch(hp, batch_size=8, seed=0):
    ds = SyntheticVOC(num_samples=batch_size, raw_h=72, raw_w=96, seed=seed)
    imgs, boxes, labels = next(ds.batches(batch_size))
    return jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(labels)


def test_train_step_runs_and_loss_decreases():
    import optax

    hp = tiny_hp()
    state = create_train_state(hp, jax.random.key(0), tx=optax.adam(1e-3))
    step = make_train_step(hp, augment=False)
    imgs, boxes, labels = make_batch(hp)
    losses = []
    for i in range(20):
        state, metrics = step(state, imgs, boxes, labels, jax.random.key(42))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.8, losses
    assert int(state.step) == 20


def test_train_step_mobilenet_updates_batch_stats():
    hp = tiny_hp("mobilenet_v2")
    state = create_train_state(hp, jax.random.key(0))
    step = make_train_step(hp, augment=False)
    imgs, boxes, labels = make_batch(hp, batch_size=4)
    # materialize before the step: donate_argnums frees the old buffers
    old_stats = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.batch_stats)]
    state, metrics = step(state, imgs, boxes, labels, jax.random.key(0))
    new_stats = jax.tree_util.tree_leaves(state.batch_stats)
    assert len(old_stats) > 0
    assert any(
        not np.allclose(a, np.asarray(b)) for a, b in zip(old_stats, new_stats)
    )
    assert np.isfinite(float(metrics["loss"]))


def test_num_pos_bounded_by_minibatch():
    hp = tiny_hp()
    state = create_train_state(hp, jax.random.key(0))
    step = make_train_step(hp, augment=False)
    imgs, boxes, labels = make_batch(hp)
    _, metrics = step(state, imgs, boxes, labels, jax.random.key(1))
    assert 0 < int(metrics["num_pos"]) <= hp.total_pos_bboxes * imgs.shape[0]


def test_mesh_train_step_matches_single_device():
    """Data-parallel jit over 8 virtual devices == single-device math."""
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    hp = tiny_hp()
    imgs, boxes, labels = make_batch(hp, batch_size=8)
    key = jax.random.key(7)

    state_a = create_train_state(hp, jax.random.key(0))
    step_a = make_train_step(hp, augment=False)
    state_a, m_a = step_a(state_a, imgs, boxes, labels, key)

    mesh = make_data_mesh(8)
    state_b = replicate(mesh, create_train_state(hp, jax.random.key(0)))
    step_b = make_train_step(hp, mesh=mesh, augment=False)
    sh_imgs, sh_boxes, sh_labels = shard_batch(mesh, imgs, boxes, labels)
    state_b, m_b = step_b(state_b, sh_imgs, sh_boxes, sh_labels, key)

    np.testing.assert_allclose(
        float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5
    )
    # params identical after one step
    flat_a = jax.tree_util.tree_leaves(state_a.params)
    flat_b = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_mesh_eval_loss_matches_single_device():
    """Sharded validation pass (VERDICT r3 weak #6) == single-device math."""
    from tpurpn.train import make_eval_loss_fn

    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    hp = tiny_hp()
    imgs, boxes, labels = make_batch(hp, batch_size=8)
    key = jax.random.key(3)
    state = create_train_state(hp, jax.random.key(0))

    loss_a = float(make_eval_loss_fn(hp)(state, imgs, boxes, labels, key))

    mesh = make_data_mesh(8)
    state_b = replicate(mesh, state)
    eval_b = make_eval_loss_fn(hp, mesh=mesh)
    sh = shard_batch(mesh, imgs, boxes, labels)
    loss_b = float(eval_b(state_b, *sh, key))

    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-5)


def test_mesh_train_step_multiple_steps_finite():
    mesh = make_data_mesh(8)
    hp = tiny_hp()
    state = replicate(mesh, create_train_state(hp, jax.random.key(0)))
    step = make_train_step(hp, mesh=mesh, augment=True)
    imgs, boxes, labels = make_batch(hp, batch_size=16)
    sh = shard_batch(mesh, imgs, boxes, labels)
    for i in range(3):
        state, metrics = step(state, *sh, jax.random.key(i))
        assert np.isfinite(float(metrics["loss"]))


def test_grad_accum_step_matches_full_batch():
    """grad_accum=2 must produce the SAME post-step params as the plain
    full-batch step: targets are shared (same key derivation), micro losses
    are normalized by global counts, gradients are summed — exact up to
    float reduction order, not just in expectation."""
    hp = tiny_hp()  # VGG16: no BatchNorm, so the equivalence is exact
    imgs, boxes, labels = make_batch(hp, batch_size=8)
    key = jax.random.key(5)

    state_a = create_train_state(hp, jax.random.key(0))
    step_a = make_train_step(hp, augment=False)
    state_a, m_a = step_a(state_a, imgs, boxes, labels, key)

    state_b = create_train_state(hp, jax.random.key(0))
    step_b = make_train_step(hp, augment=False, grad_accum=2)
    state_b, m_b = step_b(state_b, imgs, boxes, labels, key)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-6)
    assert int(m_a["num_pos"]) == int(m_b["num_pos"])
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_grad_accum_step_mobilenet_finite_and_stats_update():
    """BN path: microbatch stats chain through the scan; loss finite,
    stats move."""
    hp = tiny_hp("mobilenet_v2")
    state = create_train_state(hp, jax.random.key(0))
    step = make_train_step(hp, augment=False, grad_accum=4)
    imgs, boxes, labels = make_batch(hp, batch_size=8)
    old_stats = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.batch_stats)]
    state, metrics = step(state, imgs, boxes, labels, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    new_stats = jax.tree_util.tree_leaves(state.batch_stats)
    assert any(
        not np.allclose(a, np.asarray(b)) for a, b in zip(old_stats, new_stats)
    )


def test_grad_accum_rejects_bad_config():
    import pytest as _pytest

    hp = tiny_hp()
    with _pytest.raises(ValueError, match="grad_accum"):
        make_train_step(hp, grad_accum=0)
    with _pytest.raises(NotImplementedError, match="mesh"):
        make_train_step(hp, mesh=make_data_mesh(2), grad_accum=2)
    step = make_train_step(hp, augment=False, grad_accum=3)
    imgs, boxes, labels = make_batch(hp, batch_size=8)  # 8 % 3 != 0
    with _pytest.raises(ValueError, match="divisible"):
        step(create_train_state(hp, jax.random.key(0)), imgs, boxes, labels,
             jax.random.key(0))


def test_scan_train_steps_matches_host_loop():
    """One scanned multi-step call == the host loop it replaces: same data
    walk ((s*B) % N slices vs batches(repeat=True)), same key chain (split
    per step), same step body. Augment ON so the per-step RNG path is
    exercised too. Equality is to float round-off, not bit-for-bit: the scan
    compiles the body inside a loop context, so XLA fuses it differently
    from the standalone jitted step (measured: 1-ulp loss differences). All
    integer/random state (sampling words, selection keys) is identical."""
    from tpurpn.train import make_scan_train_steps

    hp = tiny_hp()
    batch, n_samples, n_steps = 4, 8, 6  # 6 steps over 2 batches: wraps 3x
    ds = SyntheticVOC(num_samples=n_samples, raw_h=72, raw_w=96, seed=3)
    host_batches = []
    it = ds.batches(batch, repeat=True)
    for _ in range(n_steps):
        host_batches.append(next(it))

    # host loop (the recall_demo.py structure)
    state_a = create_train_state(hp, jax.random.key(0))
    step = make_train_step(hp, augment=True)
    key = jax.random.key(1)
    losses_a = []
    for imgs, boxes, labels in host_batches:
        key, sk = jax.random.split(key)
        state_a, m = step(state_a, jnp.asarray(imgs), jnp.asarray(boxes),
                          jnp.asarray(labels), sk)
        losses_a.append(float(m["loss"]))

    # one scanned call over the device-resident dataset
    imgs_all, boxes_all, labels_all = (
        jnp.asarray(x) for x in next(ds.batches(n_samples))
    )
    state_b = create_train_state(hp, jax.random.key(0))
    run = make_scan_train_steps(hp, augment=True, batch_size=batch,
                                num_steps=n_steps)
    state_b, _, metrics = run(state_b, jax.random.key(1), imgs_all, boxes_all,
                              labels_all)

    np.testing.assert_allclose(
        np.asarray(metrics["loss"]), np.asarray(losses_a, np.float32),
        rtol=3e-6, atol=0,
    )
    assert int(state_b.step) == n_steps
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-6, atol=1e-6
        )


def test_scan_train_steps_chunked_resume_continues_data_walk():
    """Two chunked calls (start_step continuing) == one longer call."""
    from tpurpn.train import make_scan_train_steps

    hp = tiny_hp()
    batch, n_samples = 4, 8
    ds = SyntheticVOC(num_samples=n_samples, raw_h=72, raw_w=96, seed=3)
    imgs_all, boxes_all, labels_all = (
        jnp.asarray(x) for x in next(ds.batches(n_samples))
    )

    run4 = make_scan_train_steps(hp, augment=False, batch_size=batch, num_steps=4)
    state_a = create_train_state(hp, jax.random.key(0))
    state_a, _, _ = run4(state_a, jax.random.key(1), imgs_all, boxes_all,
                         labels_all)

    run2 = make_scan_train_steps(hp, augment=False, batch_size=batch, num_steps=2)
    state_b = create_train_state(hp, jax.random.key(0))
    state_b, key_b, _ = run2(state_b, jax.random.key(1), imgs_all, boxes_all,
                             labels_all)
    state_b, _, _ = run2(state_b, key_b, imgs_all, boxes_all, labels_all)

    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_train_steps_sample_idx_matches_shuffled_host_loop():
    """sample_idx mode == the host loop over batches(shuffle=seed): the index
    walk is the shared batch_index_iter, so the scanned trainer replays the
    exact per-epoch shuffled order (crossing an epoch boundary here)."""
    from tpurpn.data import batch_index_iter
    from tpurpn.train import make_scan_train_steps

    hp = tiny_hp()
    batch, n_samples, n_steps, seed = 4, 8, 5, 7  # 2 steps/epoch: 3 epochs
    ds = SyntheticVOC(num_samples=n_samples, raw_h=72, raw_w=96, seed=3)

    state_a = create_train_state(hp, jax.random.key(0))
    step = make_train_step(hp, augment=True)
    key = jax.random.key(1)
    it = ds.batches(batch, repeat=True, shuffle=seed)
    losses_a = []
    for _ in range(n_steps):
        imgs, boxes, labels = next(it)
        key, sk = jax.random.split(key)
        state_a, m = step(state_a, jnp.asarray(imgs), jnp.asarray(boxes),
                          jnp.asarray(labels), sk)
        losses_a.append(float(m["loss"]))

    imgs_all, boxes_all, labels_all = (
        jnp.asarray(x) for x in next(ds.batches(n_samples))
    )
    idx_it = batch_index_iter(n_samples, batch, repeat=True, shuffle=seed)
    sample_idx = jnp.asarray(
        np.stack([next(idx_it) for _ in range(n_steps)]), jnp.int32
    )
    state_b = create_train_state(hp, jax.random.key(0))
    run = make_scan_train_steps(hp, augment=True, batch_size=batch,
                                num_steps=n_steps)
    state_b, _, metrics = run(state_b, jax.random.key(1), imgs_all, boxes_all,
                              labels_all, sample_idx)

    np.testing.assert_allclose(
        np.asarray(metrics["loss"]), np.asarray(losses_a, np.float32),
        rtol=3e-6, atol=0,
    )
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-6, atol=1e-6
        )


def test_scan_train_steps_start_step_overrides_state_step():
    """start_step pins the fixed-order walk origin explicitly (ADVICE r4:
    resuming under a different recipe makes state.step-positioning wrong);
    it must equal the same rows fed via explicit sample_idx."""
    from tpurpn.train import make_scan_train_steps

    hp = tiny_hp()
    batch, n_samples, n_steps, origin = 4, 8, 3, 5
    ds = SyntheticVOC(num_samples=n_samples, raw_h=72, raw_w=96, seed=3)
    imgs_all, boxes_all, labels_all = (
        jnp.asarray(x) for x in next(ds.batches(n_samples))
    )
    run = make_scan_train_steps(hp, augment=False, batch_size=batch,
                                num_steps=n_steps)

    state_a = create_train_state(hp, jax.random.key(0))
    state_a, _, m_a = run(state_a, jax.random.key(1), imgs_all, boxes_all,
                          labels_all, start_step=origin)

    rows = np.stack([
        ((origin + s) * batch) % n_samples + np.arange(batch)
        for s in range(n_steps)
    ]).astype(np.int32)
    state_b = create_train_state(hp, jax.random.key(0))
    state_b, _, m_b = run(state_b, jax.random.key(1), imgs_all, boxes_all,
                          labels_all, jnp.asarray(rows))

    np.testing.assert_allclose(
        np.asarray(m_a["loss"]), np.asarray(m_b["loss"]), rtol=3e-6, atol=0
    )
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-6, atol=1e-6
        )
    with pytest.raises(ValueError, match="mutually exclusive"):
        run(create_train_state(hp, jax.random.key(0)), jax.random.key(1),
            imgs_all, boxes_all, labels_all, jnp.asarray(rows),
            start_step=origin)


@pytest.mark.parametrize("shuffle", [None, 11])
def test_mesh_scan_train_steps_matches_sharded_host_loop(shuffle):
    """The mesh-sharded scanned trainer (config 5's device-resident variant,
    VERDICT r4 #3) == a feed-equivalent sharded host loop: same global
    batches (per-shard walk rows from sharded_batch_index_iter), same key
    chain, same step body — GSPMD global-batch semantics, so losses/params
    agree to float round-off exactly like the single-device scan proof."""
    from tpurpn.data import sharded_batch_index_iter
    from tpurpn.train import make_scan_train_steps

    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    mesh = make_data_mesh(8)
    hp = tiny_hp()
    batch, n_samples, n_steps = 8, 16, 5  # per-shard 2 rows: 2.5 epochs
    ds = SyntheticVOC(num_samples=n_samples, raw_h=72, raw_w=96, seed=3)
    imgs_all, boxes_all, labels_all = (
        jnp.asarray(x) for x in next(ds.batches(n_samples))
    )
    idx_it = sharded_batch_index_iter(
        n_samples, batch, 8, repeat=True, shuffle=shuffle
    )
    rows = np.stack([next(idx_it) for _ in range(n_steps)])

    # feed-equivalent mesh host loop over the same global rows
    state_a = replicate(mesh, create_train_state(hp, jax.random.key(0)))
    step = make_train_step(hp, mesh=mesh, augment=True)
    key = jax.random.key(1)
    losses_a = []
    for s in range(n_steps):
        sel = rows[s]
        sh = shard_batch(
            mesh, imgs_all[sel], boxes_all[sel], labels_all[sel]
        )
        key, sk = jax.random.split(key)
        state_a, m = step(state_a, *sh, sk)
        losses_a.append(float(m["loss"]))

    # one scanned mesh call over the shard-resident dataset
    state_b = replicate(mesh, create_train_state(hp, jax.random.key(0)))
    run = make_scan_train_steps(hp, augment=True, batch_size=batch,
                                num_steps=n_steps, mesh=mesh)
    sh_ds = shard_batch(mesh, imgs_all, boxes_all, labels_all)
    sample_idx = None if shuffle is None else jnp.asarray(rows, jnp.int32)
    state_b, _, metrics = run(state_b, jax.random.key(1), *sh_ds, sample_idx)

    np.testing.assert_allclose(
        np.asarray(metrics["loss"]), np.asarray(losses_a, np.float32),
        rtol=3e-6, atol=0,
    )
    assert int(jax.device_get(state_b.step)) == n_steps
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-6, atol=1e-6
        )


def test_mesh_scan_train_steps_validates_inputs():
    from tpurpn.train import make_scan_train_steps

    mesh = make_data_mesh(8)
    hp = tiny_hp()
    with pytest.raises(ValueError, match="devices"):
        make_scan_train_steps(hp, batch_size=12, num_steps=2, mesh=mesh)
    run = make_scan_train_steps(hp, augment=False, batch_size=8, num_steps=2,
                                mesh=mesh)
    ds = SyntheticVOC(num_samples=16, raw_h=72, raw_w=96, seed=3)
    imgs, boxes, labels = (jnp.asarray(x) for x in next(ds.batches(16)))
    state = replicate(mesh, create_train_state(hp, jax.random.key(0)))
    # a fixed-order walk (position block d reads shard d) violated: row 0
    # appears in block 1, whose shard is rows [2, 4)
    bad = jnp.asarray(np.zeros((2, 8), np.int32))
    with pytest.raises(ValueError, match="shard locality"):
        run(state, jax.random.key(1), imgs, boxes, labels, bad)


def test_sharded_batch_index_iter_contract():
    from tpurpn.data import sharded_batch_index_iter

    # locality: block d indexes shard d only; shuffled epochs repermute
    it = sharded_batch_index_iter(16, 8, 4, repeat=True, shuffle=5)
    n_local, b_local = 4, 2
    seen = []
    for _ in range(4):  # 2 epochs (2 batches/epoch)
        row = next(it)
        assert row.shape == (8,)
        for d in range(4):
            blk = row[d * b_local:(d + 1) * b_local]
            assert ((blk >= d * n_local) & (blk < (d + 1) * n_local)).all()
        seen.append(row)
    # each epoch covers every row exactly once
    epoch0 = np.sort(np.concatenate(seen[:2]))
    np.testing.assert_array_equal(epoch0, np.arange(16))
    with pytest.raises(ValueError, match="divide"):
        next(sharded_batch_index_iter(15, 8, 4))
    with pytest.raises(ValueError, match="remainder"):
        next(sharded_batch_index_iter(16, 12, 4))


def test_scan_train_steps_rejects_ragged_dataset():
    from tpurpn.train import make_scan_train_steps

    hp = tiny_hp()
    ds = SyntheticVOC(num_samples=6, raw_h=72, raw_w=96, seed=3)
    imgs, boxes, labels = (jnp.asarray(x) for x in next(ds.batches(6)))
    run = make_scan_train_steps(hp, augment=False, batch_size=4, num_steps=2)
    with pytest.raises(ValueError, match="divisible"):
        run(create_train_state(hp, jax.random.key(0)), jax.random.key(1),
            imgs, boxes, labels)
    with pytest.raises(ValueError, match="sample_idx shape"):
        run(create_train_state(hp, jax.random.key(0)), jax.random.key(1),
            imgs, boxes, labels, jnp.zeros((3, 4), jnp.int32))
    with pytest.raises(ValueError, match=">= 1"):
        make_scan_train_steps(hp, batch_size=0, num_steps=2)
    # explicit sample_idx lifts the divisibility requirement (6 % 4 != 0)
    state, _, metrics = run(
        create_train_state(hp, jax.random.key(0)), jax.random.key(1),
        imgs, boxes, labels,
        jnp.asarray([[0, 1, 2, 3], [4, 5, 0, 1]], jnp.int32),
    )
    assert int(state.step) == 2
    assert np.isfinite(np.asarray(metrics["loss"])).all()


def test_get_step_size():
    from tpurpn.train import get_step_size

    assert get_step_size(100, 8) == 13
    assert get_step_size(96, 8) == 12
    assert get_step_size(1, 8) == 1


def test_rpn_generator_parity_api():
    """The reference-compatible generator yields (img, (deltas, labels))."""
    from tpurpn.anchors import generate_anchors
    from tpurpn.data import SyntheticVOC
    from tpurpn.train import rpn_generator

    hp = tiny_hp()
    anchors = generate_anchors(hp)
    ds = SyntheticVOC(num_samples=8, raw_h=72, raw_w=96)
    gen = rpn_generator(ds, anchors, hp, jax.random.key(0), batch_size=4)
    images, (deltas, labels) = next(gen)
    fm, A = hp.feature_map_shape, hp.anchor_count
    assert images.shape == (4, hp.img_size, hp.img_size, 3)
    assert deltas.shape == (4, fm, fm, A * 4)
    assert labels.shape == (4, fm, fm, A)
    flat = np.asarray(labels).reshape(-1)
    assert set(np.unique(flat)).issubset({-1.0, 0.0, 1.0})
    # infinite generator: next batch also works
    images2, _ = next(gen)
    assert images2.shape == images.shape


def test_step_timer():
    """StepTimer must actually run step_fn iters times and report wall time
    per step — pinned with a step of known host-side duration (a dt >= 0
    assertion alone can never fail)."""
    import time as _time

    from tpurpn.profiling import StepTimer

    calls = []

    def step(c):
        calls.append(1)
        _time.sleep(0.01)
        return c + 1.0

    timer = StepTimer(step, jnp.float32(0.0))
    dt = timer.run(iters=5, warmup=1)
    assert len(calls) == 6  # 1 warmup + 5 timed
    # per-step time must reflect the 10 ms sleep (loose upper bound for a
    # loaded CI host)
    assert 0.009 <= dt < 1.0, dt
