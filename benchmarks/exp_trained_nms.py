"""Proposal-kernel cost under a TRAINED score distribution (round 3).

bench.py's trained-checkpoint re-validation exposed a -31% e2e drop vs the
random-init headline: trained objectness concentrates the top-scoring
candidates around a few objects, so greedy NMS suppresses most of each
128-candidate block and walks many more blocks to fill 300 keeps. This
probe times the fused kernel on REAL trained-model candidates across
block/group settings, and reports keep statistics.

    python benchmarks/exp_trained_nms.py
"""

import sys

sys.path.insert(0, ".")

from benchmarks.common import emit, enable_compile_cache, time_scan_chained


def main():
    enable_compile_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tpurpn import get_hyper_params
    from tpurpn.anchors import generate_anchors
    from tpurpn.data import SyntheticVOC, preprocess_batch
    from tpurpn.io_utils import load_keras_h5_weights
    from tpurpn.kernels.proposal_pallas import fused_proposals_packed
    from tpurpn.model import fold_batch_norm, get_model, init_model
    from tpurpn.predict import decode_outputs_packed

    B = 128
    hp = get_hyper_params("mobilenet_v2")
    base = init_model(get_model(hp), jax.random.key(0))
    params, stats, _ = load_keras_h5_weights(
        "trained/rpn_mobilenet_v2_trained.h5", base["params"],
        base.get("batch_stats"),
    )
    model, variables = fold_batch_norm(hp, {"params": params, "batch_stats": stats})
    anchors = generate_anchors(hp)

    raw, _, _ = next(SyntheticVOC(seed=1, num_samples=B).batches(B))
    imgs, _ = preprocess_batch(
        jnp.asarray(raw), jnp.zeros((B, 1, 4)), hp.img_size, dtype=jnp.bfloat16
    )
    reg, cls = jax.jit(
        lambda v, x: model.module.apply(v, x, train=False)
    )(variables, imgs)
    planes_t, scores = decode_outputs_packed(anchors, reg, cls, hp)
    planes_t, scores = jax.device_put(planes_t), jax.device_put(scores)
    pre = min(hp.pre_nms_topn, scores.shape[1])

    # keep statistics: how deep does greedy NMS walk under this distribution?
    out = fused_proposals_packed(
        planes_t, scores, pre=pre, iou_threshold=float(hp.nms_iou_threshold),
        max_output=hp.test_nms_topn,
    )
    nv = np.asarray(out["num_valid"])
    emit("trained_num_valid", float(nv.mean()), "keeps/image",
         min=int(nv.min()), max=int(nv.max()))

    def tail(pt, sc, c, block, group):
        o = fused_proposals_packed(
            pt, sc + c * 1e-20, pre=pre,
            iou_threshold=float(hp.nms_iou_threshold),
            max_output=hp.test_nms_topn, block=block, group=group,
        )
        return o["roi_scores"].mean() * 1e-6

    import functools

    for block, group in ((128, 8), (256, 8), (512, 8), (256, 4), (128, 16)):
        try:
            dt = time_scan_chained(
                functools.partial(tail, block=block, group=group),
                planes_t, scores, iters=30,
            )
            emit(f"trained_tail_block{block}_group{group}", dt * 1e3,
                 "ms/batch128")
        except Exception as e:  # Mosaic limits at some shapes — record, move on
            emit(f"trained_tail_block{block}_group{group}", -1.0, "failed",
                 error=str(e)[:120])


if __name__ == "__main__":
    main()
