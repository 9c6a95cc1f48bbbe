"""Conv1 variant sweep: what is XLA's 3x3/s2 C_in=3 conv sensitive to?

Conv1 times ~1.7 ms at batch 8 and ~1.9 ms at batch 128 (16x the pixels!)
— nearly invocation-bound. This sweeps algorithmic/layout variants at both
batches to find the lever.

    python benchmarks/exp_conv1_variants.py
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

    def base(x, bias):
        return lax.conv_general_dilated(
            x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + bias

    def out_bf16(x, bias):
        return lax.conv_general_dilated(
            x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(jnp.bfloat16)

    wt = jnp.transpose(w, (3, 2, 0, 1))  # OIHW

    def nchw(x, bias):
        xc = jnp.transpose(x, (0, 3, 1, 2))
        y = lax.conv_general_dilated(
            xc, wt, (2, 2), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        )
        return y + bias[None, :, None, None]

    # manual im2col: 9 strided taps -> (B,250,250,27) -> 1x1 conv (matmul)
    w27 = w.reshape(27, 32)  # (ky,kx,c) row-major matches concat order below

    def im2col(x, bias):
        B = x.shape[0]
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))  # SAME (0,1)
        taps = [
            lax.slice(xp, (0, ky, kx, 0), (B, ky + 499, kx + 499, 3), (1, 2, 2, 1))
            for ky in range(3) for kx in range(3)
        ]
        t = jnp.concatenate(taps, axis=-1)  # (B,250,250,27)
        return jnp.dot(t, w27, preferred_element_type=jnp.float32) + bias

    variants = {"base": base, "out_bf16": out_bf16, "nchw": nchw,
                "im2col": im2col}

    # exactness vs base
    xs = jax.random.uniform(jax.random.key(3), (2, 500, 500, 3)).astype(jnp.bfloat16)
    yb = base(xs, b)
    for name, fn in variants.items():
        y = fn(xs, b)
        if name == "nchw":
            y = jnp.transpose(y, (0, 2, 3, 1))
        err = float(jnp.max(jnp.abs(yb - y.astype(jnp.float32))))
        emit(f"err_{name}", err, "f32")

    for B in (8, 128):
        x = jax.random.uniform(
            jax.random.key(1), (B, 500, 500, 3), jnp.float32
        ).astype(jnp.bfloat16)
        for name, fn in variants.items():
            def f(xx, c, fn=fn):
                return fn(xx, b + c * 1e-20).astype(jnp.float32).mean() * 1e-6

            try:
                dt = time_scan_chained(f, x, iters=30) * 1e3
                emit(f"conv1_{name}_b{B}", dt, "ms/batch")
            except Exception as e:
                emit(f"conv1_{name}_b{B}", -1.0, "failed", error=str(e)[:100])


if __name__ == "__main__":
    main()
