"""Small-batch forward scaling probe (config 2 diagnosis, round 3).

The batch-8 breakdown shows the MobileNetV2 forward at 2624 img/s vs 7020 at
batch 128 — the fused proposal tail is only ~0.2 ms. This experiment maps
where the per-image efficiency goes: forward time vs batch, backbone-only
time, and the uint8 preprocess cost vs batch.

Every scanned step body MUST be data-dependent on the carry (bias nudge /
input add) or XLA hoists the loop-invariant body and the timing measures
one iteration (CLAUDE.md gotcha — the first version of this probe reported
an impossible 86k img/s exactly this way).

    python benchmarks/exp_smallbatch.py
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
    from tpurpn.data import preprocess_batch
    from tpurpn.model import fold_batch_norm, get_model, init_model

    hp = get_hyper_params("mobilenet_v2")
    model, variables = fold_batch_norm(
        hp, init_model(get_model(hp), jax.random.key(0))
    )

    def fwd(variables, images, c):
        reg, cls = model.module.apply(perturb(variables, c), images, train=False)
        return (reg.astype(jnp.float32).mean() + cls.astype(jnp.float32).mean()) * 1e-6

    for B in (8, 16, 32, 64, 128):
        images = jax.random.uniform(
            jax.random.key(1), (B, hp.img_size, hp.img_size, 3), jnp.float32
        ).astype(jnp.bfloat16)
        dt = time_scan_chained(fwd, variables, images, iters=30)
        emit(f"fwd_b{B}", dt * 1e3, "ms/batch", img_per_s=round(B / dt, 1),
             ms_per_img=round(dt * 1e3 / B, 3))

    # preprocess-only scaling (uint8 -> bf16 resize); carry enters the raw
    # input (uint8 add wraps — irrelevant to timing, defeats hoisting)
    def prep(raw, c):
        imgs, _ = preprocess_batch(
            raw + c.astype(jnp.uint8), jnp.zeros((raw.shape[0], 1, 4)),
            hp.img_size, dtype=jnp.bfloat16,
        )
        return imgs.astype(jnp.float32).mean() * 1e-6

    for B in (8, 32, 128):
        raw = (
            jax.random.uniform(jax.random.key(2), (B, 375, 500, 3)) * 255
        ).astype(jnp.uint8)
        dt = time_scan_chained(prep, raw, iters=30)
        emit(f"prep_b{B}", dt * 1e3, "ms/batch", ms_per_img=round(dt * 1e3 / B, 4))

    # backbone vs head split at batch 8 vs 128: which part degrades?
    from tpurpn.backbones.mobilenet_v2 import MobileNetV2Backbone

    bb = MobileNetV2Backbone(fold_bn=True)
    bb_vars = {"params": variables["params"]["backbone"]}

    def backbone_only(bbv, images, c):
        feat = bb.apply(perturb(bbv, c), images, train=False)
        return feat.astype(jnp.float32).mean() * 1e-6

    for B in (8, 128):
        images = jax.random.uniform(
            jax.random.key(1), (B, hp.img_size, hp.img_size, 3), jnp.float32
        ).astype(jnp.bfloat16)
        dt = time_scan_chained(backbone_only, bb_vars, images, iters=30)
        emit(f"backbone_b{B}", dt * 1e3, "ms/batch", ms_per_img=round(dt * 1e3 / B, 3))


if __name__ == "__main__":
    main()
