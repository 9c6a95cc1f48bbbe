"""Recall@k by GT-box size: locates WHERE recall is lost.

Round-2's VGG16 plateau diagnosis (BASELINE.md): recall@300 saturates at
0.86-0.87 because small GTs rank below the top-300 objectness cut — a
selection-depth property of the model, not a pipeline defect (recall@1500
reaches 0.97, and the TF reference matches under identical training). This
script makes that analysis repeatable for any checkpoint: it buckets GT
boxes by sqrt(area) in pixels and reports recall@300 / @train_nms_topn per
bucket, by masking out-of-bucket GTs (labels -1) before proposal_recall.

    python benchmarks/recall_by_size.py [backbone] [h5_path] [batch] [img_size]

Defaults: mobilenet_v2, trained/rpn_mobilenet_v2_trained.h5, batch 16, 500.
"""

import sys

sys.path.insert(0, ".")

from benchmarks.common import emit, enable_compile_cache

BUCKETS = [(0, 75), (75, 150), (150, 10_000)]


def main(backbone="mobilenet_v2", h5_path="trained/rpn_mobilenet_v2_trained.h5",
         batch=16, img_size=500):
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpurpn import get_hyper_params
    from tpurpn.data import get_dataset, preprocess_batch
    from tpurpn.eval import proposal_recall
    from tpurpn.io_utils import load_keras_h5_weights
    from tpurpn.model import get_model, init_model
    from tpurpn.predict import make_predict_fn

    batch, img_size = int(batch), int(img_size)
    hp = get_hyper_params(backbone, img_size=img_size)
    model = get_model(hp)
    variables = init_model(model, jax.random.key(0))
    params, stats, _ = load_keras_h5_weights(
        h5_path, variables["params"], variables.get("batch_stats")
    )
    variables = {"params": params}
    if stats is not None and jax.tree_util.tree_leaves(stats):
        variables["batch_stats"] = stats

    # top-300 (test_nms_topn) and the deeper train_nms_topn selection
    predict300 = make_predict_fn(model, hp)
    hp_deep = get_hyper_params(
        backbone, img_size=img_size, test_nms_topn=hp.train_nms_topn
    )
    predict_deep = make_predict_fn(model, hp_deep)

    val_ds = get_dataset("synthetic", "validation", max_boxes=hp.max_gt_boxes)
    # accumulate (num_recalled, num_gt) per (depth, bucket), keyed by the
    # ACTUAL selection depth (test_nms_topn is overridable — ADVICE r4)
    depths = ((hp.test_nms_topn, predict300), (hp_deep.test_nms_topn, predict_deep))
    acc = {(d, lo): [0, 0] for d, _ in depths for lo, _ in BUCKETS}
    for imgs, boxes, labels in val_ds.batches(batch):
        x, b = preprocess_batch(
            jnp.asarray(imgs), jnp.asarray(boxes), hp.img_size
        )
        labels = jnp.asarray(labels)
        # sqrt of pixel area per GT (normalized coords x img_size)
        side = jnp.sqrt(
            jnp.clip(b[..., 2] - b[..., 0], 0) *
            jnp.clip(b[..., 3] - b[..., 1], 0)
        ) * hp.img_size
        for depth, predict in depths:
            out = predict(variables, x)
            for lo, hi in BUCKETS:
                in_bucket = (side >= lo) & (side < hi)
                masked = jnp.where(in_bucket, labels, -1)
                r = proposal_recall(
                    out["roi_boxes"], out["num_valid"], b, masked
                )
                acc[(depth, lo)][0] += int(r["num_recalled"])
                acc[(depth, lo)][1] += int(r["num_gt"])

    for (depth, lo), (rec, gt) in sorted(acc.items()):
        hi = dict((l, h) for l, h in BUCKETS)[lo]
        span = f"{lo}_{hi}px" if hi < 10_000 else f"{lo}_up_px"
        emit(
            f"{backbone}_recall@{depth}_size_{span}",
            round(rec / max(1, gt), 4),
            "recall",
            num_gt=gt,
        )


if __name__ == "__main__":
    main(*sys.argv[1:])
