"""Forward stage budget at batch 128: where do the 17.8 ms go?

Times the folded-BN MobileNetV2 forward truncated at increasing depths
(stop_after_block) to attribute time to the stride-2 spine vs the stride-1
stages, sizing the prize for extending the fused IR-stage kernel.

    python benchmarks/exp_stage_budget.py [batch]
"""

import sys

sys.path.insert(0, ".")

from benchmarks.common import (emit, enable_compile_cache, perturb_variables
                               as perturb, time_scan_chained)


def main(batch=128):
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from tpurpn import get_hyper_params
    from tpurpn.backbones.mobilenet_v2 import MobileNetV2Backbone
    from tpurpn.model import fold_batch_norm, get_model, init_model

    hp = get_hyper_params("mobilenet_v2")
    model, variables = fold_batch_norm(
        hp, init_model(get_model(hp), jax.random.key(0))
    )
    bb = variables["params"]["backbone"]

    images = jax.random.uniform(
        jax.random.key(1), (batch, hp.img_size, hp.img_size, 3), jnp.float32
    ).astype(jnp.bfloat16)

    mods_by_stop = {
        1: ("Conv1", "expanded_conv", "block_1"),
        2: ("Conv1", "expanded_conv", "block_1", "block_2"),
        3: ("Conv1", "expanded_conv", "block_1", "block_2", "block_3"),
        5: ("Conv1", "expanded_conv", "block_1", "block_2", "block_3",
            "block_4", "block_5"),
        6: ("Conv1", "expanded_conv", "block_1", "block_2", "block_3",
            "block_4", "block_5", "block_6"),
    }

    prev = 0.0
    for stop, mods in mods_by_stop.items():
        net = MobileNetV2Backbone(
            dtype=jnp.bfloat16, param_dtype=jnp.float32, fold_bn=True,
            stop_after_block=stop,
        )
        p = {k: bb[k] for k in mods}

        def f(pp, x, c):
            y = net.apply({"params": perturb({"p": pp}, c)["p"]}, x, train=False)
            return y.astype(jnp.float32).mean() * 1e-6

        dt = time_scan_chained(f, p, images, iters=30) * 1e3
        emit(f"prefix_to_block_{stop}", dt, f"ms/batch{batch}",
             delta_ms=round(dt - prev, 2))
        prev = dt


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
