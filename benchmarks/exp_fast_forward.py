"""Fused-stage serving forward vs the flax forward, batch 8 and 128.

    python benchmarks/exp_fast_forward.py
"""

import sys

sys.path.insert(0, ".")

from benchmarks.common import (emit, enable_compile_cache, perturb_variables
                               as perturb, time_scan_chained)


def main():
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

    def fwd_flax(variables, images, c):
        reg, cls = model.module.apply(perturb(variables, c), images, train=False)
        return (reg.astype(jnp.float32).mean() + cls.astype(jnp.float32).mean()) * 1e-6

    def fwd_fast(variables, images, c):
        reg, cls = fast_mobilenet_forward(hp, perturb(variables, c), images)
        return (reg.astype(jnp.float32).mean() + cls.astype(jnp.float32).mean()) * 1e-6

    def e2e_fast(variables, images, c):
        reg, cls = fast_mobilenet_forward(hp, perturb(variables, c), images)
        planes_t, s = decode_outputs_packed(anchors, reg, cls, hp)
        out = generate_proposals_packed(planes_t, s, hp, topn=hp.test_nms_topn)
        return out["roi_scores"].mean() * 1e-6

    for B in (8, 32, 128):
        images = jax.random.uniform(
            jax.random.key(1), (B, hp.img_size, hp.img_size, 3), jnp.float32
        ).astype(jnp.bfloat16)
        dt_flax = time_scan_chained(fwd_flax, variables, images, iters=30)
        dt_fast = time_scan_chained(fwd_fast, variables, images, iters=30)
        dt_e2e = time_scan_chained(e2e_fast, variables, images, iters=30)
        emit(f"fwd_flax_b{B}", dt_flax * 1e3, "ms/batch",
             img_per_s=round(B / dt_flax, 1))
        emit(f"fwd_fast_b{B}", dt_fast * 1e3, "ms/batch",
             img_per_s=round(B / dt_fast, 1),
             speedup=round(dt_flax / dt_fast, 3))
        emit(f"e2e_fast_b{B}", dt_e2e * 1e3, "ms/batch",
             img_per_s=round(B / dt_e2e, 1))


if __name__ == "__main__":
    main()
