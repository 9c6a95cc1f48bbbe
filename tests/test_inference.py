"""Fused inference engine vs the folded flax model (interpret-mode kernels)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpurpn import get_hyper_params
from tpurpn.model import fold_batch_norm, get_model, init_model
from tpurpn.inference import mobilenet_v2_fused_forward
from tpurpn.kernels.mbconv_pallas import (
    fused_mbconv_planes,
    nhwc_to_padded_planes,
    nhwc_to_planes,
    padded_planes_to_nhwc,
    planes_to_nhwc,
)


def test_plane_roundtrip(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 5, 7, 3)).astype(np.float32))
    p = nhwc_to_planes(x)
    assert p.shape == (2, 3, 35)
    np.testing.assert_array_equal(np.asarray(planes_to_nhwc(p, 5, 7)), np.asarray(x))
    pp = nhwc_to_padded_planes(x)
    assert pp.shape == (2, 3, 7 * 9)
    np.testing.assert_array_equal(
        np.asarray(padded_planes_to_nhwc(pp, 5, 7)), np.asarray(x)
    )


def _ref_mbconv(x, w1, b1, k, b2, w2, b3, residual):
    """Unfused reference in plain lax (NHWC f32)."""
    from jax import lax

    h = jnp.clip(jnp.einsum("bhwc,ce->bhwe", x, w1) + b1, 0, 6)
    dw = lax.conv_general_dilated(
        h, k[:, :, None, :].transpose(0, 1, 2, 3), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=h.shape[-1],
    )
    dw = jnp.clip(dw + b2, 0, 6)
    o = jnp.einsum("bhwe,eo->bhwo", dw, w2) + b3
    if residual:
        o = o + x
    return o


@pytest.mark.parametrize("H,W,Cin,t,residual", [(8, 8, 16, 6, True), (5, 9, 8, 6, False)])
def test_fused_mbconv_matches_reference(rng, H, W, Cin, t, residual):
    Cexp = Cin * t
    Cout = Cin if residual else Cin + 8
    x = jnp.asarray(rng.normal(0, 1, (2, H, W, Cin)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(0, 0.3, (Cin, Cexp)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(0, 0.1, (Cexp,)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.3, (3, 3, Cexp)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(0, 0.1, (Cexp,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.3, (Cexp, Cout)).astype(np.float32))
    b3 = jnp.asarray(rng.normal(0, 0.1, (Cout,)).astype(np.float32))

    ref = _ref_mbconv(x, w1, b1, k, b2, w2, b3, residual)
    got = padded_planes_to_nhwc(
        fused_mbconv_planes(
            nhwc_to_padded_planes(x), w1, b1, k, b2, w2, b3, H=H, W=W,
            residual=residual, dtype=jnp.float32, interpret=True,
        ),
        H, W,
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-4)


def test_fused_forward_matches_folded_flax(rng):
    hp = get_hyper_params("mobilenet_v2", img_size=64, compute_dtype="float32")
    model = get_model(hp)
    variables = init_model(model, jax.random.key(0))
    imgs = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    _, updates = model.apply(variables, imgs, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": updates["batch_stats"]}

    folded_model, folded_vars = fold_batch_norm(hp, variables)
    ref_reg, ref_cls = folded_model.apply(folded_vars, imgs, train=False)
    got_reg, got_cls = mobilenet_v2_fused_forward(
        folded_vars, imgs, hp, interpret=True
    )
    assert got_reg.shape == ref_reg.shape and got_cls.shape == ref_cls.shape
    np.testing.assert_allclose(np.asarray(ref_reg), np.asarray(got_reg), atol=3e-4)
    np.testing.assert_allclose(np.asarray(ref_cls), np.asarray(got_cls), atol=3e-4)
