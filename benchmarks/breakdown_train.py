"""Component breakdown of the VGG16 train step (BASELINE config 3).

Times nested pieces: preprocess | target-gen | fwd | fwd+bwd | full step.
Differences between rows give each stage's cost. Profiling tool, not a
BASELINE config.

    python benchmarks/breakdown_train.py [batch]
"""

import sys

sys.path.insert(0, ".")

from benchmarks.common import emit, enable_compile_cache, time_scan_chained


def main(batch=8, backbone="vgg16"):
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from tpurpn import get_hyper_params
    from tpurpn.anchors import generate_anchors
    from tpurpn.data import SyntheticVOC, preprocess_batch
    from tpurpn.losses import reg_loss, rpn_cls_loss
    from tpurpn.model import get_model
    from tpurpn.target import calculate_rpn_actual_outputs
    from tpurpn.train import create_train_state, make_train_step

    hp = get_hyper_params(backbone)
    model = get_model(hp)
    state = create_train_state(hp, jax.random.key(0), model=model)
    anchors = generate_anchors(hp)
    step = make_train_step(hp, model=model, augment=True)

    ds = SyntheticVOC(num_samples=batch)
    imgs, boxes, labels = next(ds.batches(batch))
    imgs, boxes, labels = jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(labels)

    def prep_only(imgs, boxes, labels, c):
        key = jax.random.fold_in(jax.random.key(0), c.astype(jnp.int32))
        x, b = preprocess_batch(imgs, boxes, hp.img_size, augment=True, key=key)
        return x.mean() + b.mean()

    def prep_target(imgs, boxes, labels, c):
        key = jax.random.fold_in(jax.random.key(0), c.astype(jnp.int32))
        k1, k2 = jax.random.split(key)
        x, b = preprocess_batch(imgs, boxes, hp.img_size, augment=True, key=k1)
        deltas, lab = calculate_rpn_actual_outputs(anchors, b, labels, hp, k2)
        return x.mean() + deltas.mean() + lab.mean()

    def fwd_loss(imgs, boxes, labels, c):
        key = jax.random.fold_in(jax.random.key(0), c.astype(jnp.int32))
        k1, k2 = jax.random.split(key)
        x, b = preprocess_batch(imgs, boxes, hp.img_size, augment=True, key=k1)
        deltas, lab = calculate_rpn_actual_outputs(anchors, b, labels, hp, k2)
        variables = {"params": state.params}
        has_bn = bool(jax.tree_util.tree_leaves(state.batch_stats))
        if has_bn:
            variables["batch_stats"] = state.batch_stats
            # train=True like the REAL step: the train step computes batch
            # statistics (train.py loss_fn), which train=False replaces with
            # cheaper running-stats application — timing the eval-mode
            # forward would under-measure this row and over-attribute the
            # difference to grads+update (moot for the default BN-free vgg16)
            (reg, cls), _ = model.module.apply(
                variables, x, train=True, mutable=["batch_stats"]
            )
        else:
            reg, cls = model.module.apply(variables, x, train=False)
        return reg_loss(deltas, reg) + rpn_cls_loss(lab, cls)

    rows = [
        ("preprocess", prep_only),
        ("prep+target_gen", prep_target),
        ("prep+target+fwd+loss", fwd_loss),
    ]
    prev = 0.0
    for name, fn in rows:
        dt = time_scan_chained(fn, imgs, boxes, labels, iters=20)
        emit(f"train_breakdown_{name}", dt * 1e3, "ms/batch",
             delta_ms=round((dt - prev) * 1e3, 2), img_per_s=round(batch / dt, 1))
        prev = dt

    # full step (grads + update) — scan-chained carrying (state, key), the
    # SAME methodology as the prefix rows, so delta_ms vs fwd_loss is pure
    # backward+optimizer compute (a dispatch-chained row would attribute
    # per-dispatch tunnel overhead to this stage). min-of-3 like the helper.
    import time

    iters = 20

    @jax.jit
    def many(state, imgs, boxes, labels, key):
        def body(carry, _):
            s, k = carry
            k, sk = jax.random.split(k)
            s, m = step(s, imgs, boxes, labels, sk)
            return (s, k), m["loss"]

        _, losses = jax.lax.scan(body, (state, key), None, length=iters)
        return losses[-1]

    key = jax.random.key(1)
    float(many(state, imgs, boxes, labels, key))  # compile + warm
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(state, imgs, boxes, labels, key))
        dt = min(dt, (time.perf_counter() - t0) / iters)
    emit("train_breakdown_full_step", dt * 1e3, "ms/batch",
         delta_ms=round((dt - prev) * 1e3, 2), img_per_s=round(batch / dt, 1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8,
         sys.argv[2] if len(sys.argv) > 2 else "vgg16")
