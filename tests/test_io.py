"""I/O tests: orbax checkpoint roundtrip + legacy Keras .h5 weight import."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpurpn import get_hyper_params
from tpurpn.model import get_model, init_model
from tpurpn.io_utils import (
    get_model_path,
    is_valid_backbone,
    load_checkpoint,
    load_keras_h5_weights,
    save_checkpoint,
)


def test_is_valid_backbone():
    assert is_valid_backbone("vgg16") and is_valid_backbone("mobilenet_v2")
    assert not is_valid_backbone("resnet50")


def test_model_path(tmp_path):
    p = get_model_path("vgg16", str(tmp_path / "out"))
    assert p.endswith("rpn_vgg16")
    assert os.path.isdir(str(tmp_path / "out"))


def test_checkpoint_roundtrip(tmp_path):
    hp = get_hyper_params("vgg16", img_size=64, compute_dtype="float32")
    variables = init_model(get_model(hp), jax.random.key(0))
    payload = {"params": variables["params"]}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, payload)
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, payload)
    restored = load_checkpoint(path, zeroed)
    a = jax.tree_util.tree_leaves(payload)
    b = jax.tree_util.tree_leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _write_legacy_h5(path, layers):
    """Write a Keras-2-style weights file: model_weights/<l>/<l>/<param>:0."""
    import h5py

    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")
        for name, params in layers.items():
            lg = g.create_group(name).create_group(name)
            for pname, arr in params.items():
                lg.create_dataset(pname + ":0", data=arr)


def test_h5_import_conv_and_head(tmp_path, rng):
    hp = get_hyper_params("vgg16", img_size=64, compute_dtype="float32")
    variables = init_model(get_model(hp), jax.random.key(0))
    params = variables["params"]

    k = rng.normal(0, 1, (3, 3, 3, 64)).astype(np.float32)
    b = rng.normal(0, 1, (64,)).astype(np.float32)
    k_cls = rng.normal(0, 1, (1, 1, 512, 9)).astype(np.float32)
    path = str(tmp_path / "w.h5")
    _write_legacy_h5(
        path,
        {
            "block1_conv1": {"kernel": k, "bias": b},
            "rpn_cls": {"kernel": k_cls, "bias": np.zeros((9,), np.float32)},
        },
    )
    new_params, _, missing = load_keras_h5_weights(path, params)
    np.testing.assert_array_equal(
        np.asarray(new_params["backbone"]["block1_conv1"]["kernel"]), k
    )
    np.testing.assert_array_equal(
        np.asarray(new_params["backbone"]["block1_conv1"]["bias"]), b
    )
    np.testing.assert_array_equal(np.asarray(new_params["rpn_cls"]["kernel"]), k_cls)
    # untouched layer keeps its random init and is reported missing
    np.testing.assert_array_equal(
        np.asarray(new_params["rpn_reg"]["kernel"]),
        np.asarray(params["rpn_reg"]["kernel"]),
    )
    assert any("rpn_reg" in m for m in missing)


def test_h5_import_bn_and_depthwise(tmp_path, rng):
    hp = get_hyper_params("mobilenet_v2", img_size=64, compute_dtype="float32")
    variables = init_model(get_model(hp), jax.random.key(0))
    params, stats = variables["params"], variables["batch_stats"]

    gamma = rng.normal(1, 0.1, (32,)).astype(np.float32)
    beta = rng.normal(0, 0.1, (32,)).astype(np.float32)
    mean = rng.normal(0, 1, (32,)).astype(np.float32)
    var = rng.uniform(0.5, 2, (32,)).astype(np.float32)
    dw = rng.normal(0, 1, (3, 3, 32, 1)).astype(np.float32)  # Keras depthwise
    path = str(tmp_path / "w.h5")
    _write_legacy_h5(
        path,
        {
            "bn_Conv1": {
                "gamma": gamma, "beta": beta,
                "moving_mean": mean, "moving_variance": var,
            },
            "expanded_conv_depthwise": {"depthwise_kernel": dw},
        },
    )
    new_params, new_stats, _ = load_keras_h5_weights(path, params, stats)
    bn = new_params["backbone"]["bn_Conv1"]
    np.testing.assert_array_equal(np.asarray(bn["scale"]), gamma)
    np.testing.assert_array_equal(np.asarray(bn["bias"]), beta)
    sbn = new_stats["backbone"]["bn_Conv1"]
    np.testing.assert_array_equal(np.asarray(sbn["mean"]), mean)
    np.testing.assert_array_equal(np.asarray(sbn["var"]), var)
    got_dw = np.asarray(
        new_params["backbone"]["expanded_conv"]["expanded_conv_depthwise"]["kernel"]
    )
    np.testing.assert_array_equal(got_dw, dw.transpose(0, 1, 3, 2))


def test_keras_h5_export_import_roundtrip(tmp_path):
    """save_keras_h5_weights -> load_keras_h5_weights reproduces every leaf
    (incl. MobileNetV2 depthwise kernels and BN stats) with nothing missing —
    the both-ways weight bridge to the TF reference."""
    import jax
    import numpy as np

    from tpurpn import get_hyper_params
    from tpurpn.io_utils import load_keras_h5_weights, save_keras_h5_weights
    from tpurpn.model import get_model, init_model

    hp = get_hyper_params("mobilenet_v2", img_size=96, compute_dtype="float32")
    model = get_model(hp)
    variables = init_model(model, jax.random.key(0))
    path = str(tmp_path / "weights.h5")
    save_keras_h5_weights(path, variables["params"], variables.get("batch_stats"))

    fresh = init_model(model, jax.random.key(1))
    params, stats, missing = load_keras_h5_weights(
        path, fresh["params"], fresh.get("batch_stats")
    )
    assert missing == []
    for a, b in zip(
        jax.tree_util.tree_leaves(variables["params"]),
        jax.tree_util.tree_leaves(params),
    ):
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(variables["batch_stats"]),
        jax.tree_util.tree_leaves(stats),
    ):
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b))


def test_handle_args_reference_mirror_and_grad_accum():
    """The argparse surface mirrors the reference flags (SURVEY.md §2 row 8:
    --backbone, -handle-gpu) plus tpurpn extensions (--grad-accum)."""
    from tpurpn.io_utils import handle_args

    a = handle_args(["--backbone", "mobilenet_v2", "-handle-gpu",
                     "--grad-accum", "4", "--batch-size", "32"])
    assert a.backbone == "mobilenet_v2"
    assert a.handle_gpu is True
    assert a.grad_accum == 4
    assert a.batch_size == 32
    # defaults
    d = handle_args([])
    assert d.backbone == "vgg16" and d.grad_accum == 1 and d.handle_gpu is False
