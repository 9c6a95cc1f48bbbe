"""Trainer CLI — mirrors the reference's ``rpn_trainer.py`` entry point.

    python rpn_trainer.py --backbone vgg16 [--dataset synthetic|/path/to/VOC2007]

Differences from the reference (SURVEY.md §2 row 1), all TPU-native:
* the whole step (preprocess -> targets -> fwd/bwd -> update) is ONE jitted
  program on device — no host-side generator;
* --data-parallel shards the batch over every visible device
  (jax.sharding 'data' mesh; XLA all-reduces gradients over ICI);
* checkpoints are orbax train-state saves (best validation loss), not .h5.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from tpurpn import get_hyper_params
from tpurpn.data import get_dataset
from tpurpn.io_utils import get_log_path, get_model_path, handle_args, save_checkpoint
from tpurpn.model import get_model
from tpurpn.train import (
    create_train_state,
    default_optimizer,
    make_data_mesh,
    make_eval_loss_fn,
    make_train_step,
    replicate,
    shard_batch,
)


def main(argv=None):
    args = handle_args(argv)
    hp = get_hyper_params(args.backbone, img_size=args.img_size)
    print(f"[tpurpn] devices: {jax.devices()}")
    print(f"[tpurpn] hyper_params: {hp}")

    train_ds = get_dataset(args.dataset, "train", max_boxes=hp.max_gt_boxes)
    val_ds = get_dataset(args.dataset, "validation", max_boxes=hp.max_gt_boxes)

    model = get_model(hp)
    state = create_train_state(
        hp, jax.random.key(args.seed), tx=default_optimizer(args.learning_rate),
        model=model,
    )
    if args.weights:  # resume from a previous checkpoint
        import os as _os

        from tpurpn.io_utils import load_checkpoint

        if _os.path.isdir(args.weights):
            like = {"params": state.params, "batch_stats": state.batch_stats}
            restored = load_checkpoint(args.weights, like)
            state = state.replace(
                params=restored["params"],
                batch_stats=restored.get("batch_stats", state.batch_stats),
            )
            print(f"[tpurpn] resumed weights from {args.weights}")

    mesh = None
    if args.data_parallel:
        mesh = make_data_mesh()
        state = replicate(mesh, state)
        print(f"[tpurpn] data-parallel over {mesh.devices.size} devices")
    step_fn = make_train_step(hp, model=model, mesh=mesh, augment=not args.no_augment)

    eval_loss_fn = make_eval_loss_fn(hp, model=model)
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
            losses.append(float(eval_loss_fn(
                state, jnp.asarray(imgs), jnp.asarray(boxes),
                jnp.asarray(labels), jax.random.key(0),
            )))
        return float(np.mean(losses)) if losses else float("inf")

    print(f"[tpurpn] training {args.epochs} epochs x {steps_per_epoch} steps, "
          f"batch {args.batch_size}; logs: {log_path}")
    from tpurpn.data import Prefetcher

    it = Prefetcher(train_ds.batches(args.batch_size, repeat=True), depth=2)
    for epoch in range(args.epochs):
        t0 = time.time()
        losses = []
        for s in range(steps_per_epoch):
            imgs, boxes, labels = next(it)
            imgs, boxes, labels = jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(labels)
            if mesh is not None:
                imgs, boxes, labels = shard_batch(mesh, imgs, boxes, labels)
            key, sk = jax.random.split(key)
            state, metrics = step_fn(state, imgs, boxes, labels, sk)
            losses.append(float(metrics["loss"]))
        mean_loss = float(np.mean(losses))
        val_loss = validation_loss(state)
        dt = time.time() - t0
        ips = steps_per_epoch * args.batch_size / dt
        print(f"[tpurpn] epoch {epoch + 1}/{args.epochs} loss={mean_loss:.4f} "
              f"val_loss={val_loss:.4f} ({ips:.1f} img/s)")
        with open(f"{log_path}/metrics.jsonl", "a") as f:
            import json

            f.write(json.dumps({"epoch": epoch + 1, "loss": mean_loss,
                                "val_loss": val_loss,
                                "images_per_sec": ips}) + "\n")
        if writer is not None:
            writer.add_scalar("loss/train", mean_loss, epoch + 1)
            writer.add_scalar("loss/val", val_loss, epoch + 1)
            writer.add_scalar("images_per_sec", ips, epoch + 1)
        # reference parity: ModelCheckpoint(save_best_only=True, monitor val)
        if val_loss < best_val:
            best_val = val_loss
            save_checkpoint(ckpt_path, {"params": state.params,
                                        "batch_stats": state.batch_stats})
            print(f"[tpurpn] saved best checkpoint -> {ckpt_path}")
    if writer is not None:
        writer.close()


if __name__ == "__main__":
    main()
