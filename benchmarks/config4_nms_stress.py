"""BASELINE config 4: batched NMS stress — top-2000 -> 300 at batch 32,
multi-scale anchors. BASELINE.json:10.

Scores here are synthetic uniforms BY SPEC (a stress config over random
decoded boxes). Per the CLAUDE.md gotcha, greedy-NMS cost depends on the
score distribution, so these numbers characterize the stress shape, not the
shipping pipeline — benchmarks/exp_trained_nms.py measures the kernels
under a TRAINED checkpoint's score distribution, and bench.py's
trained_ckpt_real_frames_e2e row covers the end-to-end effect.

    python benchmarks/config4_nms_stress.py
"""

import sys

sys.path.insert(0, ".")

from benchmarks.common import emit, enable_compile_cache

import time


def main():
    enable_compile_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpurpn import get_hyper_params
    from tpurpn.anchors import generate_anchors
    from tpurpn.boxes import batched_non_max_suppression, get_bboxes_from_deltas

    B, PRE, OUT = 32, 2000, 300
    hp = get_hyper_params("vgg16")
    anchors = generate_anchors(hp)  # multi-scale 128/256/512 anchor grid
    rng = np.random.default_rng(0)
    N = anchors.shape[0]
    deltas = jnp.asarray(rng.normal(0, 0.5, (B, N, 4)).astype(np.float32))
    scores = jnp.asarray(rng.uniform(0, 1, (B, N)).astype(np.float32))
    boxes = get_bboxes_from_deltas(anchors[None], deltas * jnp.asarray(hp.variances))

    @jax.jit
    def step(boxes, scores, carry):
        s = scores + carry  # chain dispatches
        ts, ti = lax.top_k(s, PRE)
        tb = jnp.take_along_axis(boxes, ti[..., None], axis=1)
        idx, nv = batched_non_max_suppression(
            tb, ts, OUT, hp.nms_iou_threshold, presorted=True
        )
        return jnp.sum(nv).astype(jnp.float32) * 1e-9

    carry = step(boxes, scores, jnp.float32(0.0))
    float(carry)
    iters = 20
    dt = float("inf")  # min-of-3: ~5% run-to-run tunnel spread (CLAUDE.md)
    for _ in range(3):
        carry = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = step(boxes, scores, carry)
        float(carry)
        dt = min(dt, (time.perf_counter() - t0) / iters)
    emit(
        "config4_nms_stress_top2000_to_300_batch32",
        B / dt,
        "images/sec/chip",
        ms_per_batch=round(dt * 1e3, 2),
    )

    # the fused proposal kernel serving the same top-2000 -> 300 selection
    # (top-k + lazy gather + NMS + compaction in one kernel)
    from tpurpn.kernels.proposal_pallas import fused_proposals_planes

    planes = jnp.moveaxis(boxes, -1, 1)  # (B, 4, N)

    @jax.jit
    def step_fused(planes, scores, carry):
        out = fused_proposals_planes(
            planes, scores + carry, pre=PRE,
            iou_threshold=float(hp.nms_iou_threshold), max_output=OUT,
        )
        return jnp.sum(out["num_valid"]).astype(jnp.float32) * 1e-9

    carry = step_fused(planes, scores, jnp.float32(0.0))
    float(carry)
    dt = float("inf")
    for _ in range(3):
        carry = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = step_fused(planes, scores, carry)
        float(carry)
        dt = min(dt, (time.perf_counter() - t0) / iters)
    emit(
        "config4_nms_stress_fused_kernel_batch32",
        B / dt,
        "images/sec/chip",
        ms_per_batch=round(dt * 1e3, 2),
    )


if __name__ == "__main__":
    main()
