"""Headline batch-size sweep: is batch 128 actually the throughput peak?

The north-star metric is images/sec/chip (BASELINE.json:2) — batch size is
ours to choose. bench.py ships batch 128 (chosen in round 1 when the tail
dominated); the round-3 breakdown shows the forward at 0.146 ms/img at 128
vs 0.42 at 8, i.e. still improving with batch at the last measured point.
This sweeps the EXACT bench.py e2e step (bf16 inputs, folded BN, fused
IR-stage forward, packed decode + fused proposal kernel) across batch sizes
to find the peak; if >128 wins, bench.py's BATCH should move there.

    python benchmarks/exp_batch_sweep.py [batch ...]   (default 64 128 192 256)

Prints one JSON line per batch (benchmarks/common.emit).
"""

import sys

sys.path.insert(0, ".")

from benchmarks.common import (
    emit,
    enable_compile_cache,
    perturb_variables,
    time_scan_chained,
)


def main(batches):
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from tpurpn import get_hyper_params
    from tpurpn.anchors import generate_anchors
    from tpurpn.inference import fast_mobilenet_forward
    from tpurpn.model import fold_batch_norm, get_model, init_model
    from tpurpn.predict import decode_outputs_packed, generate_proposals_packed

    hp = get_hyper_params("mobilenet_v2")
    model, variables = fold_batch_norm(
        hp, init_model(get_model(hp), jax.random.key(0))
    )
    anchors = generate_anchors(hp)

    def e2e_step(variables, images, carry):
        rpn_reg, rpn_cls = fast_mobilenet_forward(
            hp, perturb_variables(variables, carry), images
        )
        planes_t, scores = decode_outputs_packed(anchors, rpn_reg, rpn_cls, hp)
        out = generate_proposals_packed(
            planes_t, scores, hp, topn=hp.test_nms_topn
        )
        return out["roi_scores"].mean() * 1e-6

    for batch in batches:
        images = jax.random.uniform(
            jax.random.key(1), (batch, hp.img_size, hp.img_size, 3), jnp.float32
        ).astype(jnp.bfloat16)
        try:
            sec = time_scan_chained(e2e_step, variables, images, iters=50)
        except Exception as e:  # OOM at large batch is a result, not a crash
            emit(f"e2e_batch{batch}", 0.0, "img/s/chip",
                 error=type(e).__name__, detail=str(e)[:200])
            continue
        emit(f"e2e_batch{batch}", batch / sec, "img/s/chip",
             ms_per_batch=round(sec * 1e3, 3))


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [64, 128, 192, 256])
