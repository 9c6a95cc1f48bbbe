"""Fused inverted-residual stage: N MobileNetV2 blocks in ONE Pallas kernel.

Small-batch serving optimization (BASELINE config 2). The XLA forward is
efficient at batch 128 but loses ~3x per image at batch 8
(benchmarks/exp_smallbatch.py: 0.42 vs 0.146 ms/img) — the ~70 separate conv
kernels each pay pipeline ramp that large batches amortize. This kernel runs
a whole stride-1 stage — [1x1 expand -> relu6 -> 3x3 depthwise -> relu6 ->
1x1 project -> +residual] x N blocks (+ optionally the final 1x1 expand tap)
— per image in VMEM: ~22 XLA kernels become one Pallas program whose 1x1
convs are back-to-back MXU matmuls over (S*S, C) activation matrices and
whose depthwise is 9 masked sublane-shifted multiply-adds on the VPU.

Numerics mirror the folded-BN flax path (model.fold_batch_norm): bf16
matmul operands with f32 accumulation, bias + relu6 in f32, activations
carried bf16 between blocks — the same rounding structure XLA uses, so
outputs agree to bf16 tolerance (tests/test_ir_stage.py).

Rebuilds (performance path only) part of the reference's
``keras.applications.MobileNetV2`` forward (models/rpn_mobilenet_v2.py,
SURVEY.md §2 row 4); the flax backbone remains the semantic source of truth.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._util import round_up as _round_up


# Static description of one fused block:
#   (c_in, c_exp, c_out, residual)  — a full inverted residual, or
#   (c_in, c_exp, None, False)      — expand-only tail (block_13_expand).
BlockSpec = Tuple[int, int, int | None, bool]


def _ir_stage_kernel(
    *refs,
    S: int,
    M: int,
    m_pad: int,
    blocks: Sequence[BlockSpec],
    dw_input_bf16: bool = False,
    c_exp_split: int = 1,
):
    if c_exp_split > 1:
        # trailing scratch refs (h + partial-y + dw accumulator) force
        # serial buffer reuse: with pure values Mosaic's scheduler hoists
        # independent work and keeps every intermediate live on the
        # scoped-vmem stack — splitting 2x/4x INCREASED the stack from
        # 19.7M to 22.9M at S=63, and even with h/y scratched the 9
        # unrolled depthwise shifted copies alone hold ~13M. Routing the
        # tap accumulation through acc_scr caps live shifted copies at one.
        x_ref, *wrefs, out_ref, h_scr, y_scr, acc_scr = refs
    else:
        x_ref, *wrefs, out_ref = refs
        h_scr = y_scr = acc_scr = None

    r = lax.broadcasted_iota(jnp.int32, (m_pad, 1), 0)
    h_idx = r // S
    w_idx = r % S
    row_valid = r < M

    def relu6(v):
        return jnp.clip(v, 0.0, 6.0)

    def shifted_rows(a, s):
        """out[r] = a[r+s] (rows shifted toward 0 for s>0), zero-filled."""
        if s == 0:
            return a
        z = jnp.zeros((abs(s), a.shape[1]), a.dtype)
        if s > 0:
            return jnp.concatenate([a[s:, :], z], axis=0)
        return jnp.concatenate([z, a[: m_pad + s, :]], axis=0)

    x = x_ref[0]  # (m_pad, c_in0) bf16
    wi = 0

    # 3x3 stride-1 SAME depthwise: 9 masked sublane-shifted mul-adds.
    # mask: the sampled (h+dy, w+dx) must be inside the S x S grid, and
    # the row itself real — padded rows never contribute.
    def dw_project(h_part, kdw_part, bdw_part, wp_part):
        acc = jnp.zeros((m_pad, h_part.shape[1]), jnp.float32)
        if acc_scr is not None:
            acc_scr[...] = acc
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                s = dy * S + dx
                m = (
                    (h_idx + dy >= 0) & (h_idx + dy < S)
                    & (w_idx + dx >= 0) & (w_idx + dx < S)
                    & row_valid
                )
                mf = jnp.where(m, 1.0, 0.0).astype(h_part.dtype)
                tap = kdw_part[(dy + 1) * 3 + (dx + 1) : (dy + 1) * 3 + (dx + 2), :]
                # product in h's dtype (f32, or bf16 under dw_input_bf16
                # — the same rounding as a bf16 conv), f32 accumulation
                term = shifted_rows(h_part, s) * mf * tap.astype(h_part.dtype)
                if acc_scr is not None:
                    # ref round-trip serializes the taps (see unpack note)
                    acc_scr[...] = acc_scr[...] + term
                else:
                    acc = acc + term
        if acc_scr is not None:
            acc = acc_scr[...]
        h2 = relu6(acc + bdw_part).astype(jnp.bfloat16)
        return jnp.dot(h2, wp_part, preferred_element_type=jnp.float32)

    def expand(we, be):
        hh = relu6(jnp.dot(x, we, preferred_element_type=jnp.float32) + be)
        return hh.astype(jnp.bfloat16) if dw_input_bf16 else hh

    for c_in, c_exp, c_out, residual in blocks:
        if c_out is None:  # expand-only tail (never chunked)
            we = wrefs[wi][...]; be = wrefs[wi + 1][...]
            wi += 2
            h = relu6(jnp.dot(x, we, preferred_element_type=jnp.float32) + be)
            x = h.astype(jnp.bfloat16)
            continue

        # The expand channels arrive pre-chunked into c_exp_split weight
        # groups (fused_ir_stage slices them host-side — Mosaic rejects
        # non-lane-aligned in-kernel weight slices): expand -> depthwise ->
        # partial projection per chunk through the shared scratch buffers.
        # Exact for any split (the depthwise is per-channel; the projection
        # is a sum over channels, f32-accumulated).
        if c_exp_split == 1:
            we = wrefs[wi][...]; be = wrefs[wi + 1][...]
            kdw = wrefs[wi + 2][...]; bdw = wrefs[wi + 3][...]
            wp = wrefs[wi + 4][...]; bp = wrefs[wi + 5][...]
            wi += 6
            y = dw_project(expand(we, be), kdw, bdw, wp) + bp
        else:
            # full-ref scratch writes only (Mosaic rejects non-lane-aligned
            # ref slices); fused_ir_stage asserts uniform (c_exp, c_out)
            # across chunked blocks so the scratch shapes fit every block
            y_scr[...] = jnp.zeros((m_pad, c_out), jnp.float32)
            for _ in range(c_exp_split):
                we = wrefs[wi][...]; be = wrefs[wi + 1][...]
                kdw = wrefs[wi + 2][...]; bdw = wrefs[wi + 3][...]
                wp = wrefs[wi + 4][...]
                wi += 5
                h_scr[...] = expand(we, be)
                y_scr[...] = y_scr[...] + dw_project(
                    h_scr[...], kdw, bdw, wp
                )
            y = y_scr[...] + wrefs[wi][...]  # bp
            wi += 1
        y = y.astype(jnp.bfloat16)
        if residual:
            y = (x + y).astype(jnp.bfloat16)
        x = y

    out_ref[0] = x


@functools.partial(
    jax.jit,
    static_argnames=(
        "blocks", "interpret", "dw_input_bf16", "c_exp_split",
        "vmem_limit_mb",
    ),
)
def fused_ir_stage(
    x: jnp.ndarray,
    weights: Tuple[jnp.ndarray, ...],
    blocks: Tuple[BlockSpec, ...],
    interpret: bool = False,
    dw_input_bf16: bool = False,
    c_exp_split: int = 1,
    vmem_limit_mb: int | None = None,
) -> jnp.ndarray:
    """Run ``blocks`` fused over ``x``.

    Args:
      x: (B, S, S, c_in0) bf16 feature map (stride-1 stage input).
      weights: flat tuple from :func:`pack_stage_weights`.
      blocks: static per-block channel spec (see BlockSpec above).
      dw_input_bf16: carry the expanded activations into the depthwise in
        bf16 (the flax oracle's inter-conv dtype). Required at larger
        spatial sizes (S=63: an f32 working set exceeds the 16 MB
        scoped-vmem limit by ~4 MB); the 32x32 stage keeps the original
        f32 path by default.
      c_exp_split: process the expand channels in this many chunks
        (expand -> depthwise -> partial projection per chunk; exact —
        the depthwise is per-channel and the projection is a sum over
        channels, with f32 partial-y accumulation). Divides the peak
        working set by ~the split for large-S stages.
      vmem_limit_mb: raise Mosaic's scoped-vmem stack limit (default
        16 MB) for large-S stages whose unrolled working set exceeds it
        — v5e has 128 MB of VMEM, so the S=63 stage's ~20-24 MB stack
        compiles fine with the limit at 64.

    Returns (B, S, S, c_last) bf16.
    """
    B, S, S2, C0 = x.shape
    assert S == S2, (S, S2)
    M = S * S
    m_pad = _round_up(M, 8)
    _, last_exp, last_out, _ = blocks[-1]
    c_last = last_exp if last_out is None else last_out

    xr = jnp.zeros((B, m_pad, C0), jnp.bfloat16)
    xr = xr.at[:, :M].set(x.reshape(B, M, C0).astype(jnp.bfloat16))

    # pre-chunk the expand-group weights host-side (Mosaic rejects
    # non-lane-aligned in-kernel weight slices): per full block the kernel
    # consumes c_exp_split groups of (we, be, kdw, bdw, wp) plus one bp
    chunked = []
    wi = 0
    for c_in, c_exp, c_out, _res in blocks:
        we, be = weights[wi], weights[wi + 1]
        wi += 2
        if c_out is None:
            chunked += [we, be]
            continue
        kdw, bdw, wp, bp = weights[wi : wi + 4]
        wi += 4
        assert c_exp % c_exp_split == 0, (c_exp, c_exp_split)
        cw = c_exp // c_exp_split
        for ci in range(c_exp_split):
            sl = slice(ci * cw, (ci + 1) * cw)
            chunked += [we[:, sl], be[:, sl], kdw[:, sl], bdw[:, sl], wp[sl, :]]
        chunked.append(bp)
    weights = tuple(chunked)

    scratch_shapes = []
    if c_exp_split > 1:
        full = [b for b in blocks if b[2] is not None]
        cws = {ce // c_exp_split for _, ce, _, _ in full}
        couts = {co for _, _, co, _ in full}
        assert len(cws) == 1 and len(couts) == 1, (
            "c_exp_split>1 needs uniform (c_exp, c_out) across full blocks "
            f"(got c_exp chunks {cws}, c_out {couts}) — the scratch buffers "
            "are written full-ref"
        )
        h_dtype = jnp.bfloat16 if dw_input_bf16 else jnp.float32
        cw = cws.pop()
        scratch_shapes = [
            pltpu.VMEM((m_pad, cw), h_dtype),
            pltpu.VMEM((m_pad, couts.pop()), jnp.float32),
            pltpu.VMEM((m_pad, cw), jnp.float32),
        ]

    kernel = functools.partial(
        _ir_stage_kernel, S=S, M=M, m_pad=m_pad, blocks=blocks,
        dw_input_bf16=dw_input_bf16, c_exp_split=c_exp_split,
    )
    w_specs = [
        pl.BlockSpec(w.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
        for w in weights
    ]
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, m_pad, C0), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((1, m_pad, c_last), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, m_pad, c_last), jnp.bfloat16),
        scratch_shapes=scratch_shapes,
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)
            if vmem_limit_mb else None
        ),
        interpret=interpret,
    )(xr, *weights)
    return out[:, :M].reshape(B, S, S, c_last)


def pack_stage_weights(
    bb_params, block_names: Sequence[str], tail_expand: str | None = None
) -> Tuple[Tuple[jnp.ndarray, ...], Tuple[BlockSpec, ...]]:
    """Flatten folded-BN backbone params for ``block_names`` (+ optional
    expand-only tail layer) into the kernel's operand list.

    ``bb_params`` is variables["params"]["backbone"] AFTER model
    fold_batch_norm (convs carry biases, no BN entries).
    """
    weights: List[jnp.ndarray] = []
    blocks: List[BlockSpec] = []

    def as2d(kernel):  # (1,1,Cin,Cout) -> (Cin,Cout)
        return jnp.asarray(kernel).reshape(kernel.shape[-2], kernel.shape[-1])

    def bias_row(b):
        return jnp.asarray(b).reshape(1, -1)

    for name in block_names:
        blk = bb_params[name]
        we = as2d(blk[f"{name}_expand"]["kernel"])
        be = bias_row(blk[f"{name}_expand"]["bias"])
        kdw = jnp.asarray(blk[f"{name}_depthwise"]["kernel"]).reshape(9, -1)
        bdw = bias_row(blk[f"{name}_depthwise"]["bias"])
        wp = as2d(blk[f"{name}_project"]["kernel"])
        bp = bias_row(blk[f"{name}_project"]["bias"])
        c_in, c_exp = we.shape
        c_out = wp.shape[1]
        weights += [
            we.astype(jnp.bfloat16), be.astype(jnp.float32),
            kdw.astype(jnp.float32), bdw.astype(jnp.float32),
            wp.astype(jnp.bfloat16), bp.astype(jnp.float32),
        ]
        blocks.append((c_in, c_exp, c_out, c_in == c_out))
    if tail_expand is not None:
        te = bb_params[tail_expand]
        we = as2d(te["kernel"])
        weights += [we.astype(jnp.bfloat16),
                    bias_row(te["bias"]).astype(jnp.float32)]
        blocks.append((we.shape[0], we.shape[1], None, False))
    return tuple(weights), tuple(blocks)
