"""Model construction and forward-shape tests (CPU-runnable, SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpurpn import get_hyper_params
from tpurpn.model import get_model, init_model


@pytest.mark.parametrize(
    "backbone,img,fm,feat_ch",
    [("vgg16", 160, 10, 512), ("mobilenet_v2", 160, 10, 576)],
)
def test_forward_shapes_small(backbone, img, fm, feat_ch):
    hp = get_hyper_params(backbone, img_size=img, compute_dtype="float32")
    assert hp.feature_map_shape == fm
    model = get_model(hp)
    variables = init_model(model, jax.random.key(0))
    imgs = jnp.zeros((2, img, img, 3), jnp.float32)
    reg, cls = model.apply(variables, imgs)
    assert reg.shape == (2, fm, fm, 36)
    assert cls.shape == (2, fm, fm, 9)
    assert reg.dtype == jnp.float32 and cls.dtype == jnp.float32


def test_vgg16_500_gives_31():
    hp = get_hyper_params("vgg16", compute_dtype="float32")
    model = get_model(hp)
    # shape-only check via eval_shape (no FLOPs — full 500x500 VGG16 on CPU is slow)
    variables = jax.eval_shape(
        lambda k: model.module.init(k, jnp.zeros((1, 500, 500, 3), jnp.float32)),
        jax.random.key(0),
    )
    out = jax.eval_shape(
        lambda v: model.module.apply(v, jnp.zeros((1, 500, 500, 3), jnp.float32)),
        variables,
    )
    assert out[0].shape == (1, 31, 31, 36)
    assert out[1].shape == (1, 31, 31, 9)


def test_mobilenet_v2_500_gives_32():
    hp = get_hyper_params("mobilenet_v2", compute_dtype="float32")
    model = get_model(hp)
    variables = jax.eval_shape(
        lambda k: model.module.init(k, jnp.zeros((1, 500, 500, 3), jnp.float32)),
        jax.random.key(0),
    )
    out = jax.eval_shape(
        lambda v: model.module.apply(v, jnp.zeros((1, 500, 500, 3), jnp.float32)),
        variables,
    )
    assert out[0].shape == (1, 32, 32, 36)
    assert out[1].shape == (1, 32, 32, 9)


def test_mobilenet_has_batch_stats_and_updates():
    hp = get_hyper_params("mobilenet_v2", img_size=64, compute_dtype="float32")
    model = get_model(hp)
    variables = init_model(model, jax.random.key(0))
    assert "batch_stats" in variables
    imgs = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    (reg, cls), updates = model.apply(
        variables, imgs, train=True, mutable=["batch_stats"]
    )
    # running stats must actually move
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_vgg16_param_structure():
    hp = get_hyper_params("vgg16", img_size=64, compute_dtype="float32")
    variables = init_model(get_model(hp), jax.random.key(0))
    params = variables["params"]
    bb = params["backbone"]
    # Keras-compatible naming for weight import
    assert "block1_conv1" in bb and "block5_conv3" in bb
    assert "rpn_conv" in params and "rpn_cls" in params and "rpn_reg" in params
    assert params["rpn_cls"]["kernel"].shape == (1, 1, 512, 9)
    assert params["rpn_reg"]["kernel"].shape == (1, 1, 512, 36)
    assert bb["block5_conv3"]["kernel"].shape == (3, 3, 512, 512)
    # params stay fp32 even with bf16 compute
    hp_bf16 = get_hyper_params("vgg16", img_size=64)
    v2 = init_model(get_model(hp_bf16), jax.random.key(0))
    assert v2["params"]["rpn_conv"]["kernel"].dtype == jnp.float32


def test_mobilenet_param_structure():
    hp = get_hyper_params("mobilenet_v2", img_size=64, compute_dtype="float32")
    variables = init_model(get_model(hp), jax.random.key(0))
    bb = variables["params"]["backbone"]
    for name in ("Conv1", "expanded_conv", "block_1", "block_12", "block_13_expand"):
        assert name in bb, name
    # depthwise conv: feature_group_count -> kernel in-channel dim is 1
    dw = bb["block_1"]["block_1_depthwise"]["kernel"]
    assert dw.shape == (3, 3, 1, 96)  # 16 * 6 = 96 expanded channels
    assert bb["block_13_expand"]["kernel"].shape == (1, 1, 96, 576)


def test_forward_is_deterministic():
    hp = get_hyper_params("vgg16", img_size=64, compute_dtype="float32")
    model = get_model(hp)
    variables = init_model(model, jax.random.key(0))
    imgs = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3))
    a = model.apply(variables, imgs)
    b = model.apply(variables, imgs)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_fold_batch_norm_inference_equivalence():
    from tpurpn.model import fold_batch_norm

    hp = get_hyper_params("mobilenet_v2", img_size=64, compute_dtype="float32")
    model = get_model(hp)
    variables = init_model(model, jax.random.key(0))
    # make BN stats non-trivial (fresh init has mean 0 / var 1)
    imgs = jax.random.uniform(jax.random.key(1), (4, 64, 64, 3))
    _, updates = model.apply(variables, imgs, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": updates["batch_stats"]}

    ref_reg, ref_cls = model.apply(variables, imgs, train=False)
    folded_model, folded_vars = fold_batch_norm(hp, variables)
    got_reg, got_cls = folded_model.apply(folded_vars, imgs, train=False)
    np.testing.assert_allclose(np.asarray(ref_reg), np.asarray(got_reg), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ref_cls), np.asarray(got_cls), atol=2e-4)


def test_fold_batch_norm_vgg_passthrough():
    from tpurpn.model import fold_batch_norm

    hp = get_hyper_params("vgg16", img_size=64, compute_dtype="float32")
    model = get_model(hp)
    variables = init_model(model, jax.random.key(0))
    folded_model, folded_vars = fold_batch_norm(hp, variables)
    imgs = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    a = model.apply(variables, imgs)
    b = folded_model.apply(folded_vars, imgs)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_fold_batch_norm_commits_to_device():
    """Weights loaded from .h5 arrive as host numpy; leaves that skip the
    fold math (the BN-less head convs) must not stay host-resident or they
    are re-uploaded on every inference dispatch (~10 ms/call through the
    axon tunnel — benchmarks/exp_trained_fwd.py)."""
    from tpurpn.model import fold_batch_norm

    hp = get_hyper_params("mobilenet_v2", img_size=64, compute_dtype="float32")
    variables = init_model(get_model(hp), jax.random.key(0))
    # simulate the .h5 load: whole tree as host numpy
    host_vars = jax.tree_util.tree_map(np.asarray, variables)
    _, folded = fold_batch_norm(hp, host_vars)
    assert not any(
        isinstance(v, np.ndarray) for v in jax.tree_util.tree_leaves(folded)
    )
