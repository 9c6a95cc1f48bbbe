"""Space-to-depth Conv1 probe (MLPerf ResNet trick, adapted).

MobileNetV2's Conv1 is 3x3 stride-2 over C_in=3 — only 3 of the MXU's 128
lanes carry data in the K dimension (im2col K=27). Rewriting the input with
a 2x2 space-to-depth ((B,500,500,3) -> (B,250,250,12)) turns Conv1 into a
2x2 stride-1 conv with K=48: identical arithmetic (the 3x3/s2 taps are a
subset of the 4x4 block footprint; extra taps multiply zero weights),
denser lane packing. Standalone A/B at batch 128 and 8 — remember the
in-context rule (CLAUDE.md): a standalone win must be re-measured in the
shipping pipeline before adoption.

    python benchmarks/exp_s2d_conv1.py
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
    # Conv1 weights (3,3,3,32) f32 -> bf16 as in the folded model
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 32)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((32,)) * 0.1, jnp.float32)

    # embed the 3x3/s2 kernel into a 4x4 footprint, then fold 2x2 blocks
    # into channels: SAME padding for 500->250 s2 puts the 3x3 window at
    # rows/cols [2i-1+ky, ky in 0..2] (pad 1 top/left per tf SAME (k=3,s=2,
    # even input: pad_total=1 -> pad_beg=0? see check below vs lax.conv)
    def s2d(x):  # (B, H, W, C) -> (B, H/2, W/2, 4C), blocks row-major
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(B, H // 2, W // 2, 4 * C)

    def conv_ref(x, bias=None):
        return lax.conv_general_dilated(
            x, w, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + (b if bias is None else bias)

    # build the folded 2x2-over-12ch kernel numerically. TF/JAX SAME with
    # k=3, s=2, in=500 pads (0, 1): output i's tap ky reads input row
    # 2i + ky = 2*(i + ky//2) + (ky % 2) -> block row offset du = ky//2 in
    # {0, 1}, within-block offset u = ky % 2. So Conv1 becomes a 2x2
    # stride-1 conv over the 12-channel block grid, padded (0, 1) at the
    # bottom/right (the last output row's du=1 block is the zero pad).
    w4 = np.zeros((2, 2, 12, 32), np.float32)
    for ky in range(3):
        du, u = divmod(ky, 2)
        for kx in range(3):
            dv, v = divmod(kx, 2)
            for c in range(3):
                # s2d channel layout: (u, v, c) row-major
                ch = (u * 2 + v) * 3 + c
                w4[du, dv, ch, :] = np.asarray(w[ky, kx, c, :], np.float32)
    w4 = jnp.asarray(w4, jnp.bfloat16)

    def conv_s2d(x12, bias=None):
        # taps at du,dv in {0,1}: pad 1 block on bottom/right
        return lax.conv_general_dilated(
            x12, w4, (1, 1), ((0, 1), (0, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + (b if bias is None else bias)

    # numeric check on CPU-ish small input
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.bfloat16)
    a = conv_ref(x)
    bq = conv_s2d(s2d(x))
    err = float(jnp.max(jnp.abs(a - bq)))
    emit("s2d_conv1_max_abs_err", err, "f32", shapes=str(a.shape))

    for B in (8, 128):
        x = jax.random.uniform(
            jax.random.key(1), (B, 500, 500, 3), jnp.float32
        ).astype(jnp.bfloat16)
        x12 = s2d(x)

        # data-dependence through the BIAS (cheap), not the image tensor —
        # the conv consumes the carry, so the scan body can't be hoisted
        def f_ref(xx, c):
            return conv_ref(xx, b + c * 1e-20).mean() * 1e-6

        def f_s2d(xx, c):
            return conv_s2d(xx, b + c * 1e-20).mean() * 1e-6

        def f_s2d_incl(xx, c):  # including the s2d reshape itself
            return conv_s2d(s2d(xx), b + c * 1e-20).mean() * 1e-6

        dt_ref = time_scan_chained(f_ref, x, iters=30) * 1e3
        dt_s2d = time_scan_chained(f_s2d, x12, iters=30) * 1e3
        dt_s2di = time_scan_chained(f_s2d_incl, x, iters=30) * 1e3
        emit(f"conv1_ref_b{B}", dt_ref, "ms/batch")
        emit(f"conv1_s2d_b{B}", dt_s2d, "ms/batch",
             speedup=round(dt_ref / dt_s2d, 3))
        emit(f"conv1_s2d_incl_reshape_b{B}", dt_s2di, "ms/batch",
             speedup=round(dt_ref / dt_s2di, 3))


if __name__ == "__main__":
    main()
