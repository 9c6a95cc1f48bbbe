"""Predictor CLI — mirrors the reference's ``rpn_predictor.py`` entry point.

    python rpn_predictor.py --backbone mobilenet_v2 [--weights trained/rpn_...]

Loads weights (orbax checkpoint dir or Keras .h5), runs the fused jitted
inference pipeline (forward -> decode -> top-k -> NMS, SURVEY.md §3.2) over
the test split, reports proposal recall@topn, and writes drawn proposals for
the first batch to PNG (the reference shows them interactively).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from tpurpn import get_hyper_params
from tpurpn.data import get_dataset, preprocess_batch
from tpurpn.eval import proposal_recall
from tpurpn.io_utils import get_model_path, handle_args, load_checkpoint
from tpurpn.model import get_model, init_model
from tpurpn.predict import make_predict_fn


def main(argv=None):
    args = handle_args(argv)
    hp = get_hyper_params(args.backbone, img_size=args.img_size)
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
        like = {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {})}
        restored = load_checkpoint(weights, like)
        variables = {k: v for k, v in restored.items() if v}
        print(f"[tpurpn] restored checkpoint from {weights}")
    else:
        print(f"[tpurpn] WARNING: no weights at {weights}; using random init")

    # fold BatchNorms into conv weights for inference (same math, faster)
    if "batch_stats" in variables and jax.tree_util.tree_leaves(
        variables.get("batch_stats", {})
    ):
        from tpurpn.model import fold_batch_norm

        model, variables = fold_batch_norm(hp, variables)
    predict = make_predict_fn(model, hp)
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


if __name__ == "__main__":
    main()
