"""CLI entry points (installed as ``rpn-trainer`` / ``rpn-predictor``).

The repo-root scripts ``rpn_trainer.py`` / ``rpn_predictor.py`` mirror the
reference's invocation (``python rpn_trainer.py --backbone vgg16``,
SURVEY.md §2 rows 1-2) and delegate here; after ``pip install tpurpn`` the
same flows are available as console scripts.
"""


import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpurpn import get_hyper_params
from tpurpn.data import get_dataset, preprocess_batch
from tpurpn.eval import proposal_recall
from tpurpn.io_utils import (
    get_log_path,
    get_model_path,
    handle_args,
    load_checkpoint,
    save_checkpoint,
)
from tpurpn.model import get_model, init_model
from tpurpn.predict import make_predict_fn
from tpurpn.train import (
    create_train_state,
    default_optimizer,
    make_data_mesh,
    make_eval_loss_fn,
    make_train_step,
    replicate,
    shard_batch,
)


def trainer_main(argv=None):
    args = handle_args(argv)
    # flag-compatibility checks first, before any mesh/step/dataset work is
    # spent on a doomed invocation (ADVICE r4)
    if args.device_data and args.grad_accum > 1:
        raise SystemExit("--device-data is incompatible with --grad-accum")
    hp = get_hyper_params(args.backbone, img_size=args.img_size)
    if args.handle_gpu:  # reference parity: -handle-gpu
        from tpurpn.io_utils import handle_device_compatibility

        handle_device_compatibility()
    print(f"[tpurpn] devices: {jax.devices()}")
    print(f"[tpurpn] hyper_params: {hp}")

    train_ds = get_dataset(args.dataset, "train", max_boxes=hp.max_gt_boxes)
    val_source = args.val_dataset or args.dataset
    if args.val_dataset is None and args.dataset.endswith(".json"):
        # a COCO instances file has no split dimension: without a separate
        # --val-dataset, "val_loss" would silently track training data
        print("[tpurpn] WARNING: --dataset is a COCO .json and no "
              "--val-dataset was given; val_loss is measured on the "
              "TRAINING annotations and best-checkpoint selection is "
              "not meaningful")
    val_ds = get_dataset(val_source, "validation", max_boxes=hp.max_gt_boxes)

    model = get_model(hp)
    state = create_train_state(
        hp, jax.random.key(args.seed), tx=default_optimizer(args.learning_rate),
        model=model,
    )
    if args.weights:  # resume from a previous checkpoint
        if not os.path.exists(args.weights):
            raise FileNotFoundError(
                f"--weights {args.weights!r} does not exist — refusing to "
                "silently train from random init"
            )
        if args.weights.endswith(".h5"):
            from tpurpn.io_utils import load_keras_h5_weights

            params, stats, missing = load_keras_h5_weights(
                args.weights, state.params, state.batch_stats
            )
            state = state.replace(params=params, batch_stats=stats)
            print(f"[tpurpn] loaded Keras .h5 weights from {args.weights} "
                  f"(weights-only resume; {len(missing)} entries not in "
                  f"file)")
        elif os.path.isdir(args.weights):
            # full train-state resume (params + BN stats + optimizer + step);
            # falls back to weights-only for pre-round-2 checkpoints
            try:
                like = {"params": state.params, "batch_stats": state.batch_stats,
                        "opt_state": state.opt_state, "step": state.step}
                restored = load_checkpoint(args.weights, like)
                state = state.replace(
                    params=restored["params"],
                    batch_stats=restored["batch_stats"],
                    opt_state=restored["opt_state"],
                    step=restored["step"],
                )
                print(f"[tpurpn] resumed full train state from {args.weights} "
                      f"(step {int(state.step)})")
            except Exception as e:
                like = {"params": state.params, "batch_stats": state.batch_stats}
                restored = load_checkpoint(args.weights, like)
                state = state.replace(
                    params=restored["params"],
                    batch_stats=restored.get("batch_stats", state.batch_stats),
                )
                # say WHY the full restore failed: silently zeroed momentum /
                # reset step on a genuinely-full checkpoint would be invisible
                print(f"[tpurpn] resumed weights ONLY (optimizer state and "
                      f"step reset) from {args.weights} — full-state restore "
                      f"failed with {type(e).__name__}: {e}")
        else:
            raise ValueError(
                f"--weights {args.weights!r} is neither a checkpoint "
                "directory nor a .h5 file"
            )

    mesh = None
    if args.data_parallel:
        mesh = make_data_mesh()
        state = replicate(mesh, state)
        print(f"[tpurpn] data-parallel over {mesh.devices.size} devices")
    step_fn = make_train_step(hp, model=model, mesh=mesh,
                              augment=not args.no_augment,
                              grad_accum=args.grad_accum)

    eval_loss_fn = make_eval_loss_fn(hp, model=model, mesh=mesh)
    steps_per_epoch = args.steps_per_epoch or max(1, len(train_ds) // args.batch_size)
    ckpt_path = get_model_path(args.backbone, args.output_dir)
    log_path = get_log_path(args.backbone)
    best_val = float("inf")
    key = jax.random.key(args.seed + 1)

    writer = None
    if args.tensorboard:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(log_path)

    def validation_loss(state):
        # fixed key -> deterministic target sampling: epochs are comparable
        losses = []
        for imgs, boxes, labels in val_ds.batches(args.batch_size):
            imgs, boxes, labels = (
                jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(labels)
            )
            if mesh is not None:
                imgs, boxes, labels = shard_batch(mesh, imgs, boxes, labels)
            losses.append(float(eval_loss_fn(
                state, imgs, boxes, labels, jax.random.key(0),
            )))
        return float(np.mean(losses)) if losses else None

    predict_fn = None

    def validation_recall(state):
        # optional epoch hook (--eval-recall-every): recall@test_nms_topn is
        # the north-star accuracy metric (BASELINE.json:2) while val_loss is
        # only the reference-parity checkpoint monitor — long runs plateau in
        # recall well before the loss stops improving (BASELINE.md), so
        # expose it from the trainer instead of requiring a separate
        # recall_demo invocation
        nonlocal predict_fn
        if predict_fn is None:
            predict_fn = make_predict_fn(model, hp)
        variables = {"params": state.params}
        if jax.tree_util.tree_leaves(state.batch_stats):
            variables["batch_stats"] = state.batch_stats
        rec = gt = 0
        for imgs, boxes, labels in val_ds.batches(args.batch_size):
            x, b = preprocess_batch(
                jnp.asarray(imgs), jnp.asarray(boxes), hp.img_size
            )
            out = predict_fn(variables, x)
            r = proposal_recall(out["roi_boxes"], out["num_valid"], b,
                                jnp.asarray(labels))
            rec += int(r["num_recalled"])
            gt += int(r["num_gt"])
        return rec / max(1, gt)

    print(f"[tpurpn] training {args.epochs} epochs x {steps_per_epoch} steps, "
          f"batch {args.batch_size}; logs: {log_path}")
    from tpurpn.data import Prefetcher, batch_index_iter
    from tpurpn.train import make_scan_train_steps

    shuffle = None if args.no_shuffle else args.seed
    it = idx_it = None
    scan_runs = {}
    if args.device_data:
        # whole training set HBM-resident; steps chained on-device in
        # NAN_CHECK_EVERY-step lax.scan dispatches. Identical sample walk
        # (batch_index_iter is the iterator's own index logic) and key chain
        # (split per step) as the host loop below — only the per-step
        # host->device upload disappears. With --data-parallel the dataset
        # is sharded over the mesh's 'data' axis (N/D rows per device HBM)
        # and each device walks its own shard (sharded_batch_index_iter) —
        # config 5's combination: data-parallel training with no per-step
        # host feed (train.make_scan_train_steps(mesh=...)).
        try:
            dev_imgs, dev_boxes, dev_labels = (
                jnp.asarray(x) if mesh is None else x
                for x in next(train_ds.batches(len(train_ds)))
            )
        except ValueError as e:
            raise SystemExit(
                "--device-data needs every raw image the same size (the set "
                f"is stacked into one device array): {e}"
            ) from None
        if mesh is None:
            idx_it = batch_index_iter(
                len(train_ds), args.batch_size, repeat=True, shuffle=shuffle
            )
        else:
            from tpurpn.data import sharded_batch_index_iter

            n_dev = mesh.devices.size
            if len(train_ds) % n_dev or args.batch_size % n_dev:
                raise SystemExit(
                    f"--device-data --data-parallel needs the dataset size "
                    f"({len(train_ds)}) and --batch-size ({args.batch_size}) "
                    f"to divide by the {n_dev} mesh devices"
                )
            idx_it = sharded_batch_index_iter(
                len(train_ds), args.batch_size, n_dev, repeat=True,
                shuffle=shuffle,
            )
            dev_imgs, dev_boxes, dev_labels = shard_batch(
                mesh, dev_imgs, dev_boxes, dev_labels
            )
        print(f"[tpurpn] device-resident training data: {dev_imgs.shape} "
              f"uint8 ({dev_imgs.nbytes / 1e9:.2f} GB"
              + (f", sharded over {mesh.devices.size} devices)"
                 if mesh is not None else ")"))
    else:
        it = Prefetcher(
            train_ds.batches(args.batch_size, repeat=True, shuffle=shuffle),
            depth=2,
        )
    for epoch in range(args.epochs):
        t0 = time.time()
        # metrics stay ON DEVICE between syncs: a per-step host sync costs a
        # full dispatch round-trip (~25 ms through the axon tunnel —
        # CLAUDE.md gotchas) and would throttle training to a fraction of
        # the benched step rate. The finite-loss sanitizer (SURVEY.md §5)
        # still runs every NAN_CHECK_EVERY steps, bounding how long training
        # can run on NaN-poisoned parameters to that window rather than a
        # whole epoch, at ~1/NAN_CHECK_EVERY of the per-step sync tax.
        NAN_CHECK_EVERY = 100
        losses = []
        step_metrics = []
        checked = 0
        all_vals = []

        def check_finite(upto):
            nonlocal checked
            if upto == checked:
                return
            vals = np.asarray(jnp.stack(losses[checked:upto]))
            if not np.isfinite(vals).all():
                bad = checked + int(np.argmax(~np.isfinite(vals)))
                m = step_metrics[bad]
                detail = ", ".join(
                    f"{k}={float(v):.6g}" for k, v in sorted(m.items())
                )
                raise FloatingPointError(
                    f"non-finite training loss at epoch {epoch + 1} step "
                    f"{bad} ({detail}) — check learning rate / data; "
                    f"training state NOT saved"
                )
            all_vals.append(vals)
            checked = upto

        if args.device_data:
            done = 0
            while done < steps_per_epoch:
                nsteps = min(NAN_CHECK_EVERY, steps_per_epoch - done)
                run = scan_runs.get(nsteps)
                if run is None:
                    run = scan_runs[nsteps] = make_scan_train_steps(
                        hp, model=model, augment=not args.no_augment,
                        batch_size=args.batch_size, num_steps=nsteps,
                        mesh=mesh,
                    )
                sample_idx = jnp.asarray(
                    np.stack([next(idx_it) for _ in range(nsteps)]), jnp.int32
                )
                state, key, metrics = run(
                    state, key, dev_imgs, dev_boxes, dev_labels, sample_idx
                )
                vals = np.asarray(metrics["loss"])
                if not np.isfinite(vals).all():
                    bad = int(np.argmax(~np.isfinite(vals)))
                    detail = ", ".join(
                        f"{k}={float(v[bad]):.6g}"
                        for k, v in sorted(metrics.items())
                    )
                    raise FloatingPointError(
                        f"non-finite training loss at epoch {epoch + 1} step "
                        f"{done + bad} ({detail}) — check learning rate / "
                        f"data; training state NOT saved"
                    )
                all_vals.append(vals)
                done += nsteps
        else:
            for s in range(steps_per_epoch):
                imgs, boxes, labels = next(it)
                imgs, boxes, labels = jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(labels)
                if mesh is not None:
                    imgs, boxes, labels = shard_batch(mesh, imgs, boxes, labels)
                key, sk = jax.random.split(key)
                state, metrics = step_fn(state, imgs, boxes, labels, sk)
                losses.append(metrics["loss"])
                step_metrics.append(metrics)
                if len(losses) - checked >= NAN_CHECK_EVERY:
                    check_finite(len(losses))
            check_finite(len(losses))
        # zero-step epoch (train set < batch_size with drop_remainder, or
        # --steps-per-epoch 0): report nan rather than crash on concatenate([])
        mean_loss = (
            float(np.mean(np.concatenate(all_vals))) if all_vals else float("nan")
        )
        if not all_vals:
            print("[tpurpn] WARNING: epoch ran 0 training steps "
                  f"(steps_per_epoch={steps_per_epoch}) — train loss is nan")
        val_loss = validation_loss(state)
        # degrade loudly, never silently skip every checkpoint: an empty val
        # set (batch_size > len(val_ds) with drop_remainder) monitors the
        # train loss instead, and a non-finite val loss is called out
        if val_loss is None:
            print("[tpurpn] WARNING: validation produced no batches "
                  f"(batch_size {args.batch_size} > val set?) — monitoring "
                  "the TRAIN loss for best-checkpoint selection")
            monitored = mean_loss
        else:
            if not np.isfinite(val_loss):
                print(f"[tpurpn] WARNING: non-finite val_loss {val_loss} — "
                      "no checkpoint will be saved this epoch")
            monitored = val_loss
        val_recall = None
        if args.eval_recall_every and (epoch + 1) % args.eval_recall_every == 0:
            val_recall = validation_recall(state)
        dt = time.time() - t0
        ips = steps_per_epoch * args.batch_size / dt
        val_str = "n/a" if val_loss is None else f"{val_loss:.4f}"
        rec_str = "" if val_recall is None else (
            f" val_recall@{hp.test_nms_topn}={val_recall:.4f}"
        )
        print(f"[tpurpn] epoch {epoch + 1}/{args.epochs} loss={mean_loss:.4f} "
              f"val_loss={val_str}{rec_str} ({ips:.1f} img/s)")
        with open(f"{log_path}/metrics.jsonl", "a") as f:
            import json

            rec = {"epoch": epoch + 1, "loss": mean_loss,
                   "val_loss": val_loss, "images_per_sec": ips}
            if val_recall is not None:
                rec["val_recall"] = val_recall
            f.write(json.dumps(rec) + "\n")
        if writer is not None:
            writer.add_scalar("loss/train", mean_loss, epoch + 1)
            if val_loss is not None:
                writer.add_scalar("loss/val", val_loss, epoch + 1)
            if val_recall is not None:
                writer.add_scalar("recall/val", val_recall, epoch + 1)
            writer.add_scalar("images_per_sec", ips, epoch + 1)
        # reference parity: ModelCheckpoint(save_best_only=True, monitor val).
        # Full train state (SURVEY.md §5): resume continues the optimizer.
        if monitored < best_val:
            best_val = monitored
            save_checkpoint(ckpt_path, {"params": state.params,
                                        "batch_stats": state.batch_stats,
                                        "opt_state": state.opt_state,
                                        "step": state.step})
            print(f"[tpurpn] saved best checkpoint -> {ckpt_path}")
    if writer is not None:
        writer.close()



def predictor_main(argv=None):
    args = handle_args(argv)
    hp = get_hyper_params(args.backbone, img_size=args.img_size)
    if args.handle_gpu:  # reference parity: -handle-gpu
        from tpurpn.io_utils import handle_device_compatibility

        handle_device_compatibility()
    model = get_model(hp)
    variables = init_model(model, jax.random.key(args.seed))

    weights = args.weights or get_model_path(args.backbone, args.output_dir)
    if weights.endswith(".h5") and os.path.exists(weights):
        from tpurpn.io_utils import load_keras_h5_weights

        params, stats, missing = load_keras_h5_weights(
            weights, variables["params"], variables.get("batch_stats")
        )
        variables = {"params": params}
        if stats is not None:
            variables["batch_stats"] = stats
        print(f"[tpurpn] loaded .h5 weights ({len(missing)} params missing)")
    elif os.path.isdir(weights):
        # partial: train checkpoints also hold opt_state/step (SURVEY.md §5)
        like = {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {})}
        restored = load_checkpoint(weights, like, partial=True)
        variables = {k: v for k, v in restored.items() if v}
        print(f"[tpurpn] restored checkpoint from {weights}")
    else:
        print(f"[tpurpn] WARNING: no weights at {weights}; using random init")

    # fold BatchNorms into conv weights for inference (same math, faster)
    folded = False
    if "batch_stats" in variables and jax.tree_util.tree_leaves(
        variables.get("batch_stats", {})
    ):
        from tpurpn.model import fold_batch_norm

        model, variables = fold_batch_norm(hp, variables)
        folded = True
    # commit to device: .h5-loaded weights are host numpy, and host-resident
    # leaves are re-uploaded on every predict call (~10 ms/call through the
    # axon tunnel for VGG16's 56 MB; benchmarks/exp_trained_fwd.py)
    variables = jax.device_put(variables)
    fast = bool(getattr(args, "fast", False))
    if fast and not (
        args.backbone == "mobilenet_v2" and folded
        and jax.default_backend() == "tpu"
    ):
        print("[tpurpn] --fast needs TPU + folded-BN mobilenet_v2; ignoring")
        fast = False
    predict = make_predict_fn(model, hp, fast=fast)
    ds = get_dataset(args.dataset, "test", max_boxes=hp.max_gt_boxes)

    recalls, total_gt = [], 0
    first_batch = None
    for imgs, boxes, labels in ds.batches(args.batch_size):
        x, b = preprocess_batch(
            jnp.asarray(imgs), jnp.asarray(boxes), hp.img_size
        )
        out = predict(variables, x)
        r = proposal_recall(
            out["roi_boxes"], out["num_valid"], b, jnp.asarray(labels)
        )
        recalls.append((int(r["num_recalled"]), int(r["num_gt"])))
        total_gt += int(r["num_gt"])
        if first_batch is None:
            first_batch = (np.asarray(x), np.asarray(out["roi_boxes"]),
                           np.asarray(out["num_valid"]))

    rec = sum(r for r, _ in recalls) / max(1, sum(g for _, g in recalls))
    print(f"[tpurpn] proposal recall@{hp.test_nms_topn} (IoU>=0.5): {rec:.4f} "
          f"over {total_gt} GT boxes")

    if first_batch is not None:
        from tpurpn.drawing import draw_bboxes_to_file

        imgs, roi, nv = first_batch
        out_path = os.path.join(args.output_dir, f"proposals_{args.backbone}.png")
        os.makedirs(args.output_dir, exist_ok=True)
        draw_bboxes_to_file(imgs[0], roi[0][: min(50, nv[0])], out_path)
        print(f"[tpurpn] drew top proposals -> {out_path}")
