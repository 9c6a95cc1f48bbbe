"""Trained-accuracy demonstration: proposal recall@300 on synthetic VOC.

Trains an RPN from random init on the synthetic VOC fixture and reports
recall@300 (IoU >= 0.5) before and after — the north-star accuracy metric
(BASELINE.json:2; "proposal recall within 1% of the TF reference",
BASELINE.json:5). The reference trains on real VOC 2007 via tfds, which is
unavailable offline (SURVEY.md §7); the synthetic fixture demonstrates the
same training loop reaching high recall from scratch.

    python benchmarks/recall_demo.py [backbone] [steps] [batch] [ckpt_dir] [lr] [h5_out]

With ``h5_out``, the trained weights (params + BN stats) are also exported
as a legacy Keras .h5 — to a STEP-STAMPED path derived from ``h5_out``
(``foo.h5`` -> ``foo_step8000.h5``) with a sidecar ``..._step8000.json``
recording {steps, recall@300, final loss, recipe, date}. Promotion to a
canonical path (e.g. trained/rpn_mobilenet_v2_trained.h5, which bench.py
picks up) is a separate EXPLICIT step: benchmarks/promote_checkpoint.py.
Round-4 lesson (VERDICT r4 weak #1): chunked runs overwriting one shared
path silently desynchronized the committed artifact from the benched one.

Round-1 recipe (BASELINE.md): batch 16, adam 3e-4, bn_momentum 0.99; eval
with BN running stats. With ckpt_dir, the full train state is restored from
it when present and saved back at the end (long VGG16 runs continue across
invocations). Round 4: training runs via make_scan_train_steps — the whole
train set lives in HBM and steps chain on-device in 400-step dispatches
(bit-identical walk/keys to the former per-step host loop; see train.py).
"""

import sys

sys.path.insert(0, ".")

from benchmarks.common import emit, enable_compile_cache


def main(backbone="vgg16", steps=800, batch=16, ckpt_dir=None, lr=3e-4,
         h5_out=None):
    enable_compile_cache()
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from tpurpn import get_hyper_params
    from tpurpn.data import get_dataset, preprocess_batch
    from tpurpn.eval import proposal_recall
    from tpurpn.model import get_model
    from tpurpn.predict import make_predict_fn
    from tpurpn.train import create_train_state, make_scan_train_steps

    hp = get_hyper_params(backbone)
    model = get_model(hp)
    lr = float(lr)
    state = create_train_state(
        hp, jax.random.key(0), tx=optax.adam(lr), model=model
    )
    batch = int(batch)
    if ckpt_dir and os.path.isdir(ckpt_dir):
        from tpurpn.io_utils import load_checkpoint

        like = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "step": state.step}
        restored = load_checkpoint(ckpt_dir, like)
        state = state.replace(**restored)
        print(f"# resumed from {ckpt_dir} at step {int(state.step)}",
              file=sys.stderr)
    predict = make_predict_fn(model, hp)

    # 4096 train samples: the default 256-image fixture is memorizable by the
    # ~15M-param VGG16 (train loss 0.045 with val recall 0.77 — overfit);
    # the val split stays at the default 256
    train_ds = get_dataset(
        "synthetic", "train", max_boxes=hp.max_gt_boxes, num_samples=4096
    )
    val_ds = get_dataset("synthetic", "validation", max_boxes=hp.max_gt_boxes)

    def eval_recall(state):
        variables = {"params": state.params}
        if jax.tree_util.tree_leaves(state.batch_stats):
            variables["batch_stats"] = state.batch_stats
        rec, gt = 0, 0
        for imgs, boxes, labels in val_ds.batches(batch):
            x, b = preprocess_batch(jnp.asarray(imgs), jnp.asarray(boxes), hp.img_size)
            out = predict(variables, x)
            r = proposal_recall(out["roi_boxes"], out["num_valid"], b,
                                jnp.asarray(labels))
            rec += int(r["num_recalled"])
            gt += int(r["num_gt"])
        return rec / max(1, gt)

    r0 = eval_recall(state)
    emit(f"{backbone}_recall300_random_init", round(r0, 4), "recall")

    # Device-resident scanned training (round 4): upload the whole 4096-sample
    # train set ONCE (2.3 GB uint8, HBM-resident), then chain steps on-device
    # in chunks of a few hundred per dispatch (make_scan_train_steps — same
    # data walk/key chain as the former per-step host loop; floats agree to
    # round-off, pinned in tests). Through
    # the axon tunnel the old loop paid ~9 MB upload + a dispatch roundtrip
    # per step (~600 ms/step against a ~70 ms device step); the scanned path
    # pays one upload + one sync per chunk.
    steps = int(steps)
    loss = float("nan")
    if steps > 0:
        imgs_all, boxes_all, labels_all = (
            jnp.asarray(x) for x in next(train_ds.batches(len(train_ds)))
        )
        key = jax.random.key(1)
        chunk = min(400, steps)
        run = make_scan_train_steps(
            hp, model=model, augment=True, batch_size=batch, num_steps=chunk
        )
        done = 0
        while done < steps:
            if steps - done < chunk:  # short final chunk: its own program
                chunk = steps - done
                run = make_scan_train_steps(
                    hp, model=model, augment=True, batch_size=batch,
                    num_steps=chunk,
                )
            start = int(state.step)
            state, key, metrics = run(
                state, key, imgs_all, boxes_all, labels_all
            )
            done += chunk
            # one host sync per chunk (a per-step pull costs a ~25 ms tunnel
            # roundtrip each); check every step's loss while we're here
            losses = np.asarray(metrics["loss"])
            assert np.isfinite(losses).all(), (
                f"non-finite loss in steps {start}..{start + chunk}"
            )
            loss = float(losses[-1])
            print(f"# step {start + chunk - 1}: loss={loss:.4f}", file=sys.stderr)

    if ckpt_dir:
        from tpurpn.io_utils import save_checkpoint

        save_checkpoint(ckpt_dir, {"params": state.params,
                                   "batch_stats": state.batch_stats,
                                   "opt_state": state.opt_state,
                                   "step": state.step})
        print(f"# saved train state -> {ckpt_dir}", file=sys.stderr)

    r1 = eval_recall(state)

    if h5_out:
        import datetime
        import json

        from tpurpn.io_utils import save_keras_h5_weights

        stats = state.batch_stats if jax.tree_util.tree_leaves(
            state.batch_stats
        ) else None
        step_n = int(state.step)
        root, ext = os.path.splitext(h5_out)
        stamped = f"{root}_step{step_n}{ext}"
        save_keras_h5_weights(stamped, state.params, stats)
        sidecar = dict(
            steps=step_n, recall300=round(r1, 4), final_loss=round(loss, 4),
            backbone=backbone, batch=batch, lr=lr, optimizer=f"adam({lr:g})",
            bn_momentum=hp.bn_momentum, img_size=hp.img_size,
            train_set="SyntheticVOC train, 4096 samples, augment=True",
            command=(f"python benchmarks/recall_demo.py {backbone} {steps} "
                     f"{batch} {ckpt_dir or '-'} {lr:g} {h5_out}"),
            date=datetime.date.today().isoformat(),
        )
        with open(f"{root}_step{step_n}.json", "w") as f:
            json.dump(sidecar, f, indent=1)
            f.write("\n")
        print(f"# exported trained weights -> {stamped} (+ sidecar json); "
              f"promote explicitly via benchmarks/promote_checkpoint.py",
              file=sys.stderr)

    emit(
        f"{backbone}_recall300_at_step_{int(state.step)}", round(r1, 4), "recall",
        final_loss=round(loss, 4), batch=batch, optimizer=f"adam({lr:g})",
    )


if __name__ == "__main__":
    main(*sys.argv[1:])
