"""Fused inverted-residual stage kernel vs the folded flax forward.

A/B parity per the repo convention: interpret mode on CPU plus a
@pytest.mark.tpu lane on the real chip. Agreement is at bf16 tolerance —
the kernel reproduces the folded path's rounding structure (bf16 matmul
operands, f32 accumulation, bf16 activations) but not its exact op order.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpurpn import get_hyper_params
from tpurpn.backbones.mobilenet_v2 import MobileNetV2Backbone
from tpurpn.inference import fast_mobilenet_forward
from tpurpn.model import fold_batch_norm, get_model, init_model


def _folded(img_size):
    hp = get_hyper_params("mobilenet_v2", img_size=img_size)
    model = get_model(hp)
    variables = init_model(model, jax.random.key(0))
    fmodel, fvars = fold_batch_norm(hp, variables)
    return hp, fmodel, fvars


def _close(a, b, rel=0.02):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    scale = max(1.0, float(np.abs(b).max()))
    np.testing.assert_allclose(a, b, atol=rel * scale, rtol=rel)


@pytest.mark.slow
@pytest.mark.parametrize("img", [128, 160])  # S=8, and S=10 (padded rows)
def test_fused_stage_matches_flax_tap(rng, img):
    """Backbone tap output: prefix + fused stage == full folded backbone."""
    hp, fmodel, fvars = _folded(img)
    S = hp.feature_map_shape
    bb = fvars["params"]["backbone"]
    x = jnp.asarray(
        rng.uniform(0, 1, (2, img, img, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)

    full = MobileNetV2Backbone(fold_bn=True).apply(
        {"params": bb}, x, train=False
    )

    from tpurpn.inference import _FUSED_BLOCKS, _PREFIX_MODULES
    from tpurpn.kernels.ir_stage_pallas import (fused_ir_stage,
                                                pack_stage_weights)

    prefix = MobileNetV2Backbone(fold_bn=True, stop_after_block=6)
    feat6 = prefix.apply(
        {"params": {k: bb[k] for k in _PREFIX_MODULES}}, x, train=False
    )
    assert feat6.shape == (2, S, S, 64)
    weights, blocks = pack_stage_weights(
        bb, _FUSED_BLOCKS, tail_expand="block_13_expand"
    )
    fast = fused_ir_stage(feat6.astype(jnp.bfloat16), weights, blocks,
                          interpret=True)
    assert fast.shape == full.shape == (2, S, S, 576)
    _close(fast, full)


@pytest.mark.slow
@pytest.mark.parametrize("split,dw_bf16", [(2, False), (2, True), (4, False)])
def test_fused_stage_chunked_expand_parity(rng, split, dw_bf16):
    """c_exp_split chunks the expand channels (VMEM relief for large-S
    stages): expand -> depthwise -> partial projection per chunk must
    agree with split=1 at bf16 tolerance (the chunked f32 partial sums
    round differently at the final bf16 cast — measured 1-ulp)."""
    hp, fmodel, fvars = _folded(160)
    bb = fvars["params"]["backbone"]
    from tpurpn.kernels.ir_stage_pallas import (fused_ir_stage,
                                                pack_stage_weights)

    # blocks 4-5: the uniform (c_exp=192, c_out=32) stage the split targets
    w45, blocks45 = pack_stage_weights(bb, ("block_4", "block_5"))
    x = jnp.asarray(
        rng.uniform(-1, 1, (2, 9, 9, 32)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ref = fused_ir_stage(x, w45, blocks45, interpret=True)
    got = fused_ir_stage(x, w45, blocks45, interpret=True,
                         c_exp_split=split, dw_input_bf16=dw_bf16,
                         vmem_limit_mb=64)
    _close(got, ref)


@pytest.mark.slow
def test_fast_forward_matches_model(rng):
    """Full fast path (prefix + kernel + head) vs model.apply."""
    hp, fmodel, fvars = _folded(128)
    x = jnp.asarray(
        rng.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ref_reg, ref_cls = fmodel.module.apply(fvars, x, train=False)
    reg, cls = fast_mobilenet_forward(hp, fvars, x, interpret=True)
    assert reg.shape == ref_reg.shape and cls.shape == ref_cls.shape
    _close(reg, ref_reg)
    _close(cls, ref_cls)


@pytest.mark.tpu
def test_fast_forward_matches_model_on_device(rng):
    """Non-interpreted kernel on the real chip at the full 500x500 size."""
    hp, fmodel, fvars = _folded(500)
    x = jnp.asarray(
        rng.uniform(0, 1, (8, 500, 500, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ref_reg, ref_cls = fmodel.module.apply(fvars, x, train=False)
    reg, cls = fast_mobilenet_forward(hp, fvars, x)
    _close(reg, ref_reg)
    _close(cls, ref_cls)
