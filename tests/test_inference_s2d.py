"""Parity tests for the s2d-emitting-resize serving stem (tpurpn.inference).

The fused uint8 serving stem must compute exactly what the plain path
computes: data.preprocess_batch (uint8 -> [0,1], bilinear resize) followed
by the folded-BN Conv1 + ReLU6. Rebuilds the preprocessing semantics of the
reference's utils/data_utils.preprocessing + models Conv1 stem (SURVEY.md
§2 rows 4, 7) in a different factorization — so parity is the whole point.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurpn import get_hyper_params
from tpurpn.data import SyntheticVOC, preprocess_batch
from tpurpn.inference import (
    fast_uint8_forward,
    fold_conv1_s2d,
    s2d_resize,
    s2d_uint8_stem,
)
from tpurpn.model import fold_batch_norm, get_model, init_model


def _raw_batch(batch=2, h=375, w=500):
    imgs, _, _ = next(SyntheticVOC(num_samples=batch, raw_h=h, raw_w=w)
                      .batches(batch))
    return jnp.asarray(imgs)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_s2d_resize_matches_resize_then_slice(dtype):
    raw = _raw_batch()
    x = raw.astype(dtype) / jnp.asarray(255.0, dtype)
    out = 500
    full = jax.image.resize(x, (x.shape[0], out, out, 3), method="bilinear")
    ref = jnp.concatenate(
        [full[:, p::2, q::2, :] for p in (0, 1) for q in (0, 1)], axis=-1
    )
    got = s2d_resize(x, out)
    assert got.shape == (x.shape[0], out // 2, out // 2, 12)
    err = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - ref.astype(jnp.float32)
    )))
    # same sample coordinates, same 2-tap kernel; any difference is
    # accumulation-order rounding of the two lowerings
    tol = 4e-3 if dtype == jnp.bfloat16 else 2e-6
    assert err <= tol, err


def test_s2d_resize_rejects_downsampling():
    x = jnp.zeros((1, 600, 600, 3), jnp.float32)
    with pytest.raises(AssertionError):
        s2d_resize(x, 500)


def test_fold_conv1_s2d_exact_vs_strided_conv():
    from jax import lax

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 500, 500, 3)), jnp.float32)

    # reference: 3x3 stride-2 SAME (500 -> 250; SAME pads one trailing
    # row/col at this size)
    ref = lax.conv_general_dilated(
        x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    w4, b4 = fold_conv1_s2d({"kernel": w, "bias": b})
    xs2d = jnp.concatenate(
        [x[:, p::2, q::2, :] for p in (0, 1) for q in (0, 1)], axis=-1
    )
    got = lax.conv_general_dilated(
        xs2d, w4, (1, 1), ((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b4
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def _folded_mnv2(img_size=500):
    hp = get_hyper_params("mobilenet_v2", img_size=img_size)
    model, variables = fold_batch_norm(
        hp, init_model(get_model(hp), jax.random.key(0))
    )
    return hp, model, variables


def test_s2d_stem_matches_preprocess_plus_conv1():
    hp, model, variables = _folded_mnv2()
    raw = _raw_batch()
    got = s2d_uint8_stem(hp, variables, raw)

    imgs, _ = preprocess_batch(
        raw, jnp.zeros((raw.shape[0], 1, 4)), hp.img_size,
        dtype=jnp.dtype(hp.compute_dtype),
    )
    # reference stem: the flax module's Conv1 arithmetic (3x3/s2 SAME bf16
    # conv + bias + relu6), applied to the plain-preprocessed images
    from jax import lax
    from tpurpn.backbones.mobilenet_v2 import relu6

    bb = variables["params"]["backbone"]
    dtype = jnp.dtype(hp.compute_dtype)
    ref = relu6(lax.conv_general_dilated(
        imgs.astype(dtype), jnp.asarray(bb["Conv1"]["kernel"], dtype),
        (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(bb["Conv1"]["bias"], dtype))
    err = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - ref.astype(jnp.float32)
    )))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    assert err <= 0.05 * max(scale, 1.0), (err, scale)


def test_fast_uint8_forward_matches_plain_pipeline():
    # fused_stage=False isolates the s2d stem (the fused mid-stage kernel
    # has its own parity suite, tests/test_ir_stage.py); small image keeps
    # the CPU cost down
    hp, model, variables = _folded_mnv2(img_size=128)
    raw = _raw_batch(batch=2, h=96, w=120)

    reg_a, cls_a = model.module.apply(
        variables,
        preprocess_batch(
            raw, jnp.zeros((2, 1, 4)), hp.img_size,
            dtype=jnp.dtype(hp.compute_dtype),
        )[0],
        train=False,
    )
    reg_b, cls_b = fast_uint8_forward(hp, variables, raw, fused_stage=False)
    assert reg_b.shape == reg_a.shape and cls_b.shape == cls_a.shape
    # BOTH heads get a value oracle: a broken reg branch (wrong weights,
    # dropped bias) would collapse every served box while cls stayed green
    for a, b in ((cls_a, cls_b), (reg_a, reg_b)):
        scale = float(jnp.max(jnp.abs(a.astype(jnp.float32))))
        err = float(jnp.max(jnp.abs(
            b.astype(jnp.float32) - a.astype(jnp.float32)
        )))
        # bf16 path through ~20 conv layers: small relative drift only
        assert err <= 0.05 * max(scale, 1.0), (err, scale)


@pytest.mark.tpu
def test_fast_uint8_forward_on_device():
    """Full 500x500 serving forward (s2d stem + fused mid-stage, Mosaic
    non-interpreted) vs preprocess_batch + flax model, on the real chip."""
    hp, model, variables = _folded_mnv2()
    raw = _raw_batch(batch=8)
    imgs, _ = preprocess_batch(
        raw, jnp.zeros((8, 1, 4)), hp.img_size,
        dtype=jnp.dtype(hp.compute_dtype),
    )
    reg_a, cls_a = model.module.apply(variables, imgs, train=False)
    reg_b, cls_b = fast_uint8_forward(hp, variables, raw, fused_stage=True)
    for a, b in ((cls_a, cls_b), (reg_a, reg_b)):
        scale = float(jnp.max(jnp.abs(a.astype(jnp.float32))))
        err = float(jnp.max(jnp.abs(
            b.astype(jnp.float32) - a.astype(jnp.float32)
        )))
        assert err <= 0.05 * max(scale, 1.0), (err, scale)
