"""Experiments: sort/top_k cost scaling + Pallas dynamic-gather capability.

Scratch experiments for the round-2 sort lever (not a BASELINE config).
"""

import sys

sys.path.insert(0, ".")

from benchmarks.common import enable_compile_cache, time_scan_chained


def main():
    enable_compile_cache()
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N = 128, 9216
    key = jax.random.key(0)
    scores = jax.random.uniform(key, (B, N), jnp.float32)
    planes = jax.random.uniform(jax.random.key(1), (B, 4, N), jnp.float32)
    iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))

    # --- capability: dynamic lane gather inside a Pallas TPU kernel ---------
    def gather_kernel(src_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(src_ref[...], idx_ref[...], axis=1)

    try:
        src = jnp.arange(8 * 512, dtype=jnp.float32).reshape(8, 512)
        idx = jnp.flip(jnp.broadcast_to(jnp.arange(512, dtype=jnp.int32), (8, 512)), 1)
        out = pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
        )(src, idx)
        import numpy as np

        expect = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
        ok = bool((np.asarray(out) == expect).all())
        print(f"PALLAS_LANE_GATHER: compiles, correct={ok}")
    except Exception as e:
        print(f"PALLAS_LANE_GATHER: FAILED — {type(e).__name__}: {str(e)[:200]}")

    # --- cost scaling -------------------------------------------------------
    def sort5(s, p, c):
        ops = lax.sort((s + c, p[:, 0], p[:, 1], p[:, 2], p[:, 3]),
                       dimension=1, num_keys=1)
        return sum(o[:, :1].sum() for o in ops) * 1e-6

    def sort2(s, p, c):
        ops = lax.sort((s + c, iota), dimension=1, num_keys=1)
        return (ops[0][:, :1].sum() + ops[1][:, :1].sum().astype(jnp.float32)) * 1e-6

    def topk2048(s, p, c):
        v, i = lax.top_k(s + c, 2048)
        return (v[:, :1].sum() + i[:, :1].sum().astype(jnp.float32)) * 1e-6

    def topk6000(s, p, c):
        v, i = lax.top_k(s + c, 6000)
        return (v[:, :1].sum() + i[:, :1].sum().astype(jnp.float32)) * 1e-6

    def sort2_then_gather(s, p, c):
        ops = lax.sort((s + c, iota), dimension=1, num_keys=1)
        idx = ops[1][:, :6000]
        g = jnp.take_along_axis(p, idx[:, None, :], axis=2)  # (B,4,6000)
        return (ops[0][:, :1].sum() + g[:, :, :1].sum()) * 1e-6

    for name, fn in [("sort5_9216", sort5), ("sort2_9216", sort2),
                     ("topk2048", topk2048), ("topk6000", topk6000),
                     ("sort2+gather4x6000", sort2_then_gather)]:
        dt = time_scan_chained(fn, scores, planes, iters=30)
        print(f"{name}: {dt*1e3:.2f} ms/batch")


if __name__ == "__main__":
    main()
