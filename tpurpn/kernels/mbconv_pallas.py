"""Fused inverted-residual (MBConv) block as a Pallas TPU kernel.

The MobileNetV2 inference forward is HBM-bandwidth-bound: for every
stride-1 bottleneck, XLA writes the 6x-expanded activation to HBM after the
1x1 expand, reads it for the 3x3 depthwise, writes the depthwise output, and
reads it again for the 1x1 project — ~8.5 GB of avoidable traffic per
batch-128 forward at 500x500. This kernel fuses

    expand (1x1, MXU) -> ReLU6 -> depthwise 3x3 (VPU rolls) -> ReLU6
    -> project (1x1, MXU) [-> residual add]

entirely in VMEM, per image (grid over batch).

Layout: **channels on sublanes, flattened spatial on lanes** — (C, H*W).
1x1 convolutions become plain MXU matmuls (C_out, C_in) @ (C_in, H*W), and
the 3x3 depthwise becomes nine lane-rolls with boundary masks + FMA. In this
layout nothing is ever reshaped inside the kernel.

Inference-only (weights must be BN-folded — model.fold_batch_norm); training
keeps the flax/XLA path where BN statistics and the backward pass live.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mbconv_kernel(
    x_ref,  # (1, Cin, HWp) bf16 input planes
    w1_ref,  # (Cexp, Cin) bf16 expand weight (transposed)
    b1_ref,  # (Cexp, 1) f32 expand bias
    k_ref,  # (Cexp, 16) f32 depthwise taps, column = 3*(dy+1)+(dx+1)
    b2_ref,  # (Cexp, 1) f32 depthwise bias
    w2_ref,  # (Cout, Cexp) bf16 project weight (transposed)
    b3_ref,  # (Cout, 1) f32 project bias
    out_ref,  # (1, Cout, HWp) bf16
    *,
    H: int,
    W: int,
    residual: bool,
):
    hwp = x_ref.shape[-1]
    x = x_ref[0]  # (Cin, HWp)

    # expand + ReLU6 (f32 accumulation on the MXU)
    e = jnp.dot(w1_ref[...], x, preferred_element_type=jnp.float32)
    e = e + b1_ref[...]
    e = jnp.clip(e, 0.0, 6.0).astype(x.dtype)  # (Cexp, HWp)

    # depthwise 3x3 via lane rolls + boundary masks
    pos = lax.broadcasted_iota(jnp.int32, (1, hwp), 1)
    px = pos % W
    py = pos // W
    acc = jnp.zeros(e.shape, jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            shift = dy * W + dx
            tap = 3 * (dy + 1) + (dx + 1)
            # circular roll; negative shifts expressed modulo hwp
            rolled = pltpu.roll(e, (-shift) % hwp, axis=1) if shift else e
            mask = (
                (px + dx >= 0)
                & (px + dx < W)
                & (py + dy >= 0)
                & (py + dy < H)
            ).astype(jnp.float32)
            acc = acc + rolled.astype(jnp.float32) * mask * k_ref[:, tap : tap + 1]
    d = jnp.clip(acc + b2_ref[...], 0.0, 6.0).astype(x.dtype)

    # project (+ optional residual; linear bottleneck — no activation)
    o = jnp.dot(w2_ref[...], d, preferred_element_type=jnp.float32)
    o = o + b3_ref[...]
    if residual:
        o = o + x.astype(jnp.float32)
    out_ref[0] = o.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("H", "W", "residual", "dtype", "interpret")
)
def fused_mbconv_planes(
    x_planes: jnp.ndarray,  # (B, Cin, H*W) bf16
    w1: jnp.ndarray,  # (Cin, Cexp) — flax 1x1 kernel squeezed
    b1: jnp.ndarray,  # (Cexp,)
    dw_kernel: jnp.ndarray,  # (3, 3, Cexp) — flax depthwise kernel squeezed
    b2: jnp.ndarray,  # (Cexp,)
    w2: jnp.ndarray,  # (Cexp, Cout)
    b3: jnp.ndarray,  # (Cout,)
    H: int,
    W: int,
    residual: bool,
    dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run one fused stride-1 MBConv block over a batch of plane images.

    Returns (B, Cout, H*W) in `dtype`. Matches the unfused
    expand->dw->project composition (tests: test_mbconv_pallas.py).
    """
    B, Cin, HW = x_planes.shape
    assert HW >= H * W
    Cexp = w1.shape[1]
    Cout = w2.shape[1]
    hwp = _round_up(HW, 128)
    if hwp > HW:
        x_planes = jnp.pad(x_planes, ((0, 0), (0, 0), (0, hwp - HW)))

    w1_t = jnp.transpose(w1).astype(dtype)  # (Cexp, Cin)
    w2_t = jnp.transpose(w2).astype(dtype)  # (Cout, Cexp)
    taps = jnp.zeros((Cexp, 16), jnp.float32).at[:, :9].set(
        dw_kernel.reshape(9, Cexp).T.astype(jnp.float32)
    )
    b1c = b1.reshape(-1, 1).astype(jnp.float32)
    b2c = b2.reshape(-1, 1).astype(jnp.float32)
    b3c = b3.reshape(-1, 1).astype(jnp.float32)

    kernel = functools.partial(_mbconv_kernel, H=H, W=W, residual=residual)
    rep = lambda b: (0, 0)  # weights replicated across the batch grid
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Cin, hwp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cexp, Cin), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((Cexp, 1), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((Cexp, 16), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((Cexp, 1), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, Cexp), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), rep, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Cout, hwp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Cout, hwp), dtype),
        interpret=interpret,
    )(x_planes.astype(dtype), w1_t, b1c, taps, b2c, w2_t, b3c)
    return out[:, :, :HW]


def nhwc_to_planes(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, C, H*W)."""
    B, H, W, C = x.shape
    return jnp.transpose(x.reshape(B, H * W, C), (0, 2, 1))


def planes_to_nhwc(x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(B, C, H*W) -> (B, H, W, C)."""
    B, C, HW = x.shape
    return jnp.transpose(x, (0, 2, 1)).reshape(B, H, W, C)
