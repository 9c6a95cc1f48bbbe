"""Collage probe: amortize small-batch conv ramp by tiling images spatially.

At batch 8 the early convs are ramp/latency-bound, nearly batch-independent
(exp_stage_budget.py: prefix deltas flat; exp_s2d_conv1.py: Conv1 1.7 ms at
b8 vs 1.9 at b128). A conv over one 2x4 collage of zero-gapped images does
8 images' work in ONE kernel at 8x the spatial extent — the regime XLA
handles well. With a gap of >= k-1 zeros, SAME zero-padding semantics make
the per-image outputs EXACT (valid windows only ever read true zeros).

This probe checks exactness + timing for Conv1 alone at batch 8.

    python benchmarks/exp_collage.py
"""

import sys

sys.path.insert(0, ".")

from benchmarks.common import emit, enable_compile_cache, time_scan_chained


def main():
    enable_compile_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 32)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((32,)) * 0.1, jnp.float32)

    B, S = 8, 500
    T = 504          # per-image tile (4 zero rows/cols of gap; SAME pad(0,1))
    GR, GC = 2, 4    # collage grid
    OT, OS = T // 2, 250

    def conv(x, bias, strides=(2, 2)):
        return lax.conv_general_dilated(
            x, w, strides, "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + bias

    def plain(x, c):
        return conv(x, b + c * 1e-20).mean() * 1e-6

    def collage(x, c):
        xt = jnp.zeros((1, GR * T, GC * T, 3), x.dtype)
        for i in range(B):
            r, q = divmod(i, GC)
            xt = xt.at[0, r * T : r * T + S, q * T : q * T + S].set(x[i])
        y = conv(xt, b + c * 1e-20)
        outs = [
            y[0, (i // GC) * OT : (i // GC) * OT + OS,
              (i % GC) * OT : (i % GC) * OT + OS]
            for i in range(B)
        ]
        return jnp.stack(outs).mean() * 1e-6

    x = jax.random.uniform(
        jax.random.key(1), (B, S, S, 3), jnp.float32
    ).astype(jnp.bfloat16)

    # exactness: collage outputs == plain outputs
    y_plain = conv(x, b)
    xt = jnp.zeros((1, GR * T, GC * T, 3), x.dtype)
    for i in range(B):
        r, q = divmod(i, GC)
        xt = xt.at[0, r * T : r * T + S, q * T : q * T + S].set(x[i])
    yt = conv(xt, b)
    y_coll = jnp.stack([
        yt[0, (i // GC) * OT : (i // GC) * OT + OS,
           (i % GC) * OT : (i % GC) * OT + OS]
        for i in range(B)
    ])
    err = float(jnp.max(jnp.abs(y_plain - y_coll)))
    emit("collage_conv1_max_abs_err", err, "f32")

    dt_p = time_scan_chained(plain, x, iters=30) * 1e3
    dt_c = time_scan_chained(collage, x, iters=30) * 1e3
    emit("conv1_plain_b8", dt_p, "ms/batch")
    emit("conv1_collage_b8", dt_c, "ms/batch", speedup=round(dt_p / dt_c, 3))


if __name__ == "__main__":
    main()
