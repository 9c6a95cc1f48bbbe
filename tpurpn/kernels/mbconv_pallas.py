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


# lane-aligned halo padding either side of the expanded-activation scratch;
# must be a multiple of 128 and >= W+3 for every fused block (max W here is
# 125 -> Wp=127 -> halo 128)
_HALO_PAD = 256


def _mbconv_kernel(
    x_ref,  # (1, Cin, HWp) input planes, border-padded layout (see below)
    w1_ref,  # (Cexp, Cin) expand weight (transposed)
    b1_ref,  # (Cexp, 1) f32 expand bias
    k_ref,  # (Cexp, 16) f32 depthwise taps, column = 3*(dy+1)+(dx+1)
    b2_ref,  # (Cexp, 1) f32 depthwise bias
    w2_ref,  # (Cout, Cexp) project weight (transposed)
    b3_ref,  # (Cout, 1) f32 project bias
    out_ref,  # (1, Cout, HWp)
    e_scr,  # (Cexp, HWp) scratch: expanded activation (never leaves VMEM)
    *,
    Hp: int,  # padded height H+2
    Wp: int,  # padded width W+2
    residual: bool,
    chunk: int,
):
    """Spatial layout: images arrive with a one-pixel zero border baked into
    the flattened lane dim ((H+2) x (W+2) pixels). The depthwise taps then
    never wrap across rows into valid pixels — no per-tap masks; the only
    masking is zeroing E's border lanes once after the expand (conv pads the
    *expanded* activation with zeros, and expand(0)+bias is not zero)."""
    hwp = x_ref.shape[-1]
    n_valid = Hp * Wp
    num_chunks = hwp // chunk
    halo = Wp + 1
    assert halo <= _HALO_PAD
    # scratch layout: e_scr[:, _HALO_PAD + j] == expanded activation at lane j,
    # with zeroed _HALO_PAD strips either side so halo reads never go OOB

    # zero the halo strips once
    e_scr[:, 0:_HALO_PAD] = jnp.zeros((e_scr.shape[0], _HALO_PAD), e_scr.dtype)
    e_scr[:, _HALO_PAD + hwp :] = jnp.zeros(
        (e_scr.shape[0], e_scr.shape[1] - _HALO_PAD - hwp), e_scr.dtype
    )

    # expand + ReLU6 (f32 accumulation on the MXU) into scratch. fori_loop
    # (static bounds) keeps per-chunk temporaries out of one giant stack
    # frame — a python-unrolled loop makes Mosaic co-allocate every
    # iteration's temporaries (~60 MB).
    def expand_body(c, _):
        c0 = pl.multiple_of(c * chunk, chunk)
        pos = lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + c0
        px = pos % Wp
        py = pos // Wp
        interior = (
            (px >= 1) & (px <= Wp - 2) & (py >= 1) & (py <= Hp - 2)
            & (pos < n_valid)
        )
        e = jnp.dot(
            w1_ref[...], x_ref[0, :, pl.ds(c0, chunk)],
            preferred_element_type=jnp.float32,
        )
        e = jnp.clip(e + b1_ref[...], 0.0, 6.0)
        # zero the border lanes: the conv zero-pads the *expanded*
        # activation, and expand(0)+bias is not zero
        e_scr[:, pl.ds(c0 + _HALO_PAD, chunk)] = jnp.where(
            interior, e, 0.0
        ).astype(e_scr.dtype)
        return 0

    lax.fori_loop(0, num_chunks, expand_body, 0)

    # depthwise 3x3 + project per chunk: one aligned halo-wide slice
    # converted to f32 once, then 9 static-offset FMAs — no masks, no
    # per-tap converts.
    def dw_proj_body(c, _):
        c0 = pl.multiple_of(c * chunk, chunk)
        # covers scratch lanes [c0, c0 + chunk + 2*_HALO_PAD) — i.e. logical
        # e lanes [c0 - _HALO_PAD, c0 + chunk + _HALO_PAD)
        hbuf = e_scr[:, pl.ds(c0, chunk + 2 * _HALO_PAD)].astype(jnp.float32)
        acc = jnp.zeros((e_scr.shape[0], chunk), jnp.float32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                s = _HALO_PAD + dy * Wp + dx  # hbuf[:, s + j] == e[c0 + j + shift]
                tap = 3 * (dy + 1) + (dx + 1)
                acc = acc + hbuf[:, s : s + chunk] * k_ref[:, tap : tap + 1]
        d = jnp.clip(acc + b2_ref[...], 0.0, 6.0).astype(out_ref.dtype)

        # project (+ optional residual; linear bottleneck — no activation)
        o = jnp.dot(w2_ref[...], d, preferred_element_type=jnp.float32)
        o = o + b3_ref[...]
        if residual:
            o = o + x_ref[0, :, pl.ds(c0, chunk)].astype(jnp.float32)
        out_ref[0, :, pl.ds(c0, chunk)] = o.astype(out_ref.dtype)
        return 0

    lax.fori_loop(0, num_chunks, dw_proj_body, 0)


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
    """Run one fused stride-1 MBConv block over border-padded plane images.

    ``x_planes`` is (B, Cin, (H+2)*(W+2)) — the flattened spatial dim
    includes a one-pixel zero border (see nhwc_to_padded_planes). H and W are
    the *unpadded* spatial dims. Returns planes in the same padded layout
    (border lanes hold don't-care values — strip with
    padded_planes_to_nhwc). Matches the unfused expand->dw->project
    composition on the interior (tests: test_inference.py).
    """
    B, Cin, HW = x_planes.shape
    Hp, Wp = H + 2, W + 2
    assert HW >= Hp * Wp, (HW, Hp, Wp)
    Cexp = w1.shape[1]
    Cout = w2.shape[1]
    # chunk the lane (spatial) dim; sized so per-chunk f32 temporaries stay
    # a few MB even at Cexp=576
    chunk = min(2048, _round_up(HW, 128))
    hwp = _round_up(HW, chunk)
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

    kernel = functools.partial(
        _mbconv_kernel, Hp=Hp, Wp=Wp, residual=residual, chunk=chunk
    )
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
        scratch_shapes=[
            pltpu.VMEM((Cexp, hwp + 2 * _HALO_PAD), jnp.dtype(dtype))
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(x_planes.astype(dtype), w1_t, b1c, taps, b2c, w2_t, b3c)
    return out[:, :, :HW]


def _mbconv_flat_kernel(
    x_hbm,  # (Cin, 2*_HALO_PAD + Lp) in HBM/ANY — pre-padded storage
    w1_ref,  # (Cexp, Cin)
    b1_ref,  # (Cexp, 1) f32
    k_ref,  # (Cexp, 16) f32
    b2_ref,  # (Cexp, 1) f32
    w2_ref,  # (Cout, Cexp)
    b3_ref,  # (Cout, 1) f32
    out_ref,  # (Cout, chunk) VMEM lane tile
    xbuf,  # (Cin, chunk + 2*_HALO_PAD) VMEM scratch
    sem,  # DMA semaphore
    *,
    Hp: int,
    Wp: int,
    n_img: int,
    residual: bool,
    chunk: int,
):
    """Lane-grid variant: ALL images are flattened along lanes (one padded
    (Hp*Wp)-lane block per image, concatenated), and the Pallas grid tiles
    that axis — every grid step is a wide (Cexp x chunk) slab of work, so
    the MXU/VPU stay busy and grid steps pipeline with the halo DMA.

    Depthwise taps from interior pixels never escape their own image's
    padded block (max reach Wp+1 <= _HALO_PAD), so image boundaries need no
    special handling beyond the zeroed borders."""
    c = pl.program_id(0)
    c0 = pl.multiple_of(c * chunk, chunk)
    span = chunk + 2 * _HALO_PAD

    # halo'd input slab: storage lane c0 + j == logical lane c0 + j - _HALO_PAD
    dma = pltpu.make_async_copy(x_hbm.at[:, pl.ds(c0, span)], xbuf, sem)
    dma.start()
    dma.wait()

    # expand + ReLU6 over the slab, border/ghost lanes zeroed
    logical = lax.broadcasted_iota(jnp.int32, (1, span), 1) + (c0 - _HALO_PAD)
    local = jnp.mod(logical, Hp * Wp)
    px = local % Wp
    py = local // Wp
    interior = (
        (logical >= 0)
        & (logical < n_img * Hp * Wp)
        & (px >= 1) & (px <= Wp - 2) & (py >= 1) & (py <= Hp - 2)
    )
    e = jnp.dot(w1_ref[...], xbuf[...], preferred_element_type=jnp.float32)
    e = jnp.clip(e + b1_ref[...], 0.0, 6.0)
    e = jnp.where(interior, e, 0.0).astype(xbuf.dtype)  # (Cexp, span)

    # depthwise 3x3: nine static-offset FMAs into an f32 accumulator
    acc = jnp.zeros((e.shape[0], chunk), jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = _HALO_PAD + dy * Wp + dx
            tap = 3 * (dy + 1) + (dx + 1)
            acc = acc + e[:, s : s + chunk].astype(jnp.float32) * k_ref[
                :, tap : tap + 1
            ]
    d = jnp.clip(acc + b2_ref[...], 0.0, 6.0).astype(xbuf.dtype)

    o = jnp.dot(w2_ref[...], d, preferred_element_type=jnp.float32)
    o = o + b3_ref[...]
    if residual:
        o = o + xbuf[:, _HALO_PAD : _HALO_PAD + chunk].astype(jnp.float32)
    out_ref[...] = o.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("Hp", "Wp", "n_img", "residual", "dtype", "interpret"),
)
def fused_mbconv_flat(
    x_flat: jnp.ndarray,  # (Cin, L) with L = n_img * Hp * Wp
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    dw_kernel: jnp.ndarray,  # (3, 3, Cexp)
    b2: jnp.ndarray,
    w2: jnp.ndarray,
    b3: jnp.ndarray,
    Hp: int,
    Wp: int,
    n_img: int,
    residual: bool,
    dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole-batch fused MBConv on lane-flattened border-padded images.

    x_flat concatenates every image's (Hp*Wp)-lane padded block along the
    lane axis. Returns (Cout, L) in the same layout.
    """
    Cin, L = x_flat.shape
    assert L == n_img * Hp * Wp, (L, n_img, Hp, Wp)
    Cexp = w1.shape[1]
    Cout = w2.shape[1]
    chunk = 2048 if Cexp <= 256 else 1024
    lp = _round_up(L, chunk)
    storage = jnp.pad(
        x_flat.astype(dtype), ((0, 0), (_HALO_PAD, lp - L + _HALO_PAD))
    )

    w1_t = jnp.transpose(w1).astype(dtype)
    w2_t = jnp.transpose(w2).astype(dtype)
    taps = jnp.zeros((Cexp, 16), jnp.float32).at[:, :9].set(
        dw_kernel.reshape(9, Cexp).T.astype(jnp.float32)
    )
    b1c = b1.reshape(-1, 1).astype(jnp.float32)
    b2c = b2.reshape(-1, 1).astype(jnp.float32)
    b3c = b3.reshape(-1, 1).astype(jnp.float32)

    kernel = functools.partial(
        _mbconv_flat_kernel,
        Hp=Hp, Wp=Wp, n_img=n_img, residual=residual, chunk=chunk,
    )
    rep = lambda c: (0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(lp // chunk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM; DMA'd
            pl.BlockSpec((Cexp, Cin), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((Cexp, 1), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((Cexp, 16), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((Cexp, 1), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, Cexp), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), rep, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (Cout, chunk), lambda c: (0, c), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Cout, lp), dtype),
        scratch_shapes=[
            pltpu.VMEM((Cin, chunk + 2 * _HALO_PAD), jnp.dtype(dtype)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(storage, w1_t, b1c, taps, b2c, w2_t, b3c)
    return out[:, :L]


def nhwc_to_flat_padded(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (C, B*(H+2)*(W+2)) with per-image zero borders."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.transpose(xp.reshape(B * (H + 2) * (W + 2), C))


def flat_padded_to_nhwc(x: jnp.ndarray, B: int, H: int, W: int) -> jnp.ndarray:
    """Inverse of nhwc_to_flat_padded."""
    C = x.shape[0]
    full = jnp.transpose(x).reshape(B, H + 2, W + 2, C)
    return full[:, 1:-1, 1:-1, :]


def nhwc_to_planes(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, C, H*W)."""
    B, H, W, C = x.shape
    return jnp.transpose(x.reshape(B, H * W, C), (0, 2, 1))


def planes_to_nhwc(x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(B, C, H*W) -> (B, H, W, C)."""
    B, C, HW = x.shape
    return jnp.transpose(x[:, :, : H * W], (0, 2, 1)).reshape(B, H, W, C)


def nhwc_to_padded_planes(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, C, (H+2)*(W+2)) with a zero one-pixel border."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return nhwc_to_planes(x)


def padded_planes_to_nhwc(x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Inverse of nhwc_to_padded_planes: strip the border lanes."""
    full = planes_to_nhwc(x, H + 2, W + 2)
    return full[:, 1:-1, 1:-1, :]
