"""I/O, args, paths, checkpointing, and Keras .h5 weight import.

TPU-native rebuild of the reference's ``utils/io_utils`` (SURVEY.md §2 row 8)
plus the checkpoint/resume subsystem (SURVEY.md §5): the reference saves Keras
``.h5`` weights via ModelCheckpoint; here train state is saved with
orbax-checkpoint, and ``load_keras_h5_weights`` imports reference-trained
(or ImageNet-pretrained) ``.h5`` files into the flax parameter tree for
bit-match parity testing (BASELINE.json:5 "bit-matched proposal outputs").
"""

from __future__ import annotations

import argparse
import datetime
import os
from typing import Any, Dict, Optional

import numpy as np
import jax

from .config import VALID_BACKBONES


# ---------------------------------------------------------------------------
# args / paths (reference: io_utils.handle_args / get_model_path / get_log_path)
# ---------------------------------------------------------------------------


def handle_args(argv=None) -> argparse.Namespace:
    """CLI flags mirroring the reference trainer/predictor."""
    p = argparse.ArgumentParser(description="tpurpn — TPU-native RPN")
    p.add_argument("--backbone", default="vgg16", choices=list(VALID_BACKBONES))
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--img-size", type=int, default=500)
    p.add_argument(
        "--dataset",
        default="synthetic",
        help="'synthetic', a path to a VOCdevkit VOC20xx directory, "
             "'voc/2007' (tfds), or a COCO instances .json",
    )
    p.add_argument(
        "--val-dataset",
        default=None,
        help="separate validation data source (same forms as --dataset); "
             "required for meaningful best-checkpoint selection with a COCO "
             ".json --dataset, whose split is implied by the file",
    )
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the batch over all visible devices")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="split each batch into N microbatches and accumulate "
                        "gradients (exact — equals the full-batch gradient): "
                        "trains at batch sizes whose activations OOM "
                        "monolithically, e.g. VGG16 @ 500 px batch 64 on one "
                        "v5e. Incompatible with --data-parallel")
    p.add_argument("--device-data", action="store_true",
                   help="keep the WHOLE training set resident in device "
                        "memory and chain steps on-device in ~100-step "
                        "dispatches (make_scan_train_steps): removes the "
                        "per-step host->device batch upload that dominates "
                        "wall time on high-latency device links. Same sample "
                        "walk/shuffle and RNG as the default host loop. "
                        "Requires a uniform-raw-size dataset that fits in "
                        "HBM; composes with --data-parallel (the set shards "
                        "over the mesh); incompatible with --grad-accum")
    p.add_argument("--eval-recall-every", type=int, default=0, metavar="N",
                   help="trainer: every N epochs, also evaluate proposal "
                        "recall@test_nms_topn on the validation set (the "
                        "north-star accuracy metric) and log it alongside "
                        "val_loss; 0 (default) disables")
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--no-shuffle", action="store_true",
                   help="disable per-epoch training-data shuffling")
    p.add_argument("--fast", action="store_true",
                   help="predictor: fused inverted-residual-stage forward "
                        "(TPU + folded-BN mobilenet_v2 only)")
    p.add_argument("--tensorboard", action="store_true",
                   help="write TensorBoard scalars (reference parity)")
    p.add_argument(
        "-handle-gpu", "--handle-gpu", dest="handle_gpu", action="store_true",
        help="reference parity for -handle-gpu: log/verify the device setup "
             "(the reference sets CUDA memory growth; TPU needs no equivalent)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output-dir", default="trained")
    p.add_argument("--weights", default=None, help="checkpoint dir or .h5 file to load")
    return p.parse_args(argv)


def is_valid_backbone(backbone: str) -> bool:
    return backbone in VALID_BACKBONES


def handle_device_compatibility() -> None:
    """Parity shim for the reference's ``handle_gpu_compatibility()``.

    The reference sets CUDA memory growth so TF doesn't grab all GPU memory;
    JAX on TPU manages device memory in the runtime, so the equivalent is a
    sanity log of the device set (and keeps any CUDA-side TF oracle from
    claiming accelerator memory).
    """
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")  # TF oracle stays off GPU
    print(f"[tpurpn] backend={jax.default_backend()} devices: {jax.devices()}")


def get_model_path(backbone: str, output_dir: str = "trained") -> str:
    """Checkpoint directory path (reference: trained/rpn_<backbone>_model_weights.h5)."""
    os.makedirs(output_dir, exist_ok=True)
    return os.path.abspath(os.path.join(output_dir, f"rpn_{backbone}"))


def get_log_path(backbone: str, log_dir: str = "logs") -> str:
    now = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    path = os.path.join(log_dir, backbone, now)
    os.makedirs(path, exist_ok=True)
    return path


# ---------------------------------------------------------------------------
# orbax checkpointing (reference: Keras ModelCheckpoint — SURVEY.md §5)
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, state) -> None:
    """Save a train state pytree (or bare params) with orbax."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state, force=True)


def load_checkpoint(path: str, like, partial: bool = False):
    """Restore a pytree saved by :func:`save_checkpoint` (shaped like ``like``).

    ``partial=True`` restores only the entries present in ``like`` — e.g. the
    predictor pulls {params, batch_stats} out of a full train-state checkpoint
    (which also holds opt_state and step).
    """
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if partial:
            # this orbax version has no partial_restore: restore the full
            # saved tree untyped, then subset to the requested top-level keys
            full = ckptr.restore(os.path.abspath(path))
            return {k: full[k] for k in like if k in full}
        return ckptr.restore(os.path.abspath(path), like)


# ---------------------------------------------------------------------------
# Keras .h5 weight import
# ---------------------------------------------------------------------------


def _h5_layer_weights(h5file) -> Dict[str, Dict[str, np.ndarray]]:
    """Collect {layer_name: {param_name: array}} from a legacy Keras .h5 file.

    Legacy (Keras 2 / TF2-era, what the reference's ModelCheckpoint wrote)
    weight files store datasets at ``model_weights/<layer>/<layer>/kernel:0``
    etc.; param names are kernel / bias / gamma / beta / moving_mean /
    moving_variance / depthwise_kernel.
    """
    import h5py

    out: Dict[str, Dict[str, np.ndarray]] = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            parts = [p for p in name.split("/") if p]
            pname = parts[-1].split(":")[0]
            layer = None
            for p in reversed(parts[:-1]):
                if p not in ("model_weights", "vars"):
                    layer = p
                    break
            if layer is not None:
                out.setdefault(layer, {})[pname] = np.asarray(obj)

    h5file.visititems(visit)
    return out


# flax param leaf name -> candidate names in a Keras layer dict
_PARAM_CANDIDATES = {
    "kernel": ("kernel", "depthwise_kernel"),
    "bias": ("bias",),  # conv bias; BN beta handled below
    "scale": ("gamma",),
    "mean": ("moving_mean",),
    "var": ("moving_variance",),
}


def load_keras_h5_weights(path: str, params: Any, batch_stats: Any = None):
    """Map a legacy Keras .h5 weight file onto the flax parameter tree.

    The flax modules are named after their Keras counterparts
    (block1_conv1 ... rpn_cls; Conv1/block_N_expand... for MobileNetV2), and
    conv kernels share the HWIO layout, so mapping is name-based with no
    transposition. Flax depthwise kernels (H, W, 1, C) are reshaped from
    Keras depthwise layout (H, W, C, 1). Entries present in the tree but
    absent from the file are left at their current values and returned in
    ``missing``.

    Returns (new_params, new_batch_stats, missing_entries).
    """
    import h5py
    from flax import traverse_util

    with h5py.File(path, "r") as f:
        layers = _h5_layer_weights(f)

    def lookup(layer_name: str, leaf: str, want_shape, is_bn_layer: bool):
        layer = layers.get(layer_name)
        if layer is None:
            return None
        if leaf == "bias" and is_bn_layer:
            cands = ("beta",)
        else:
            cands = _PARAM_CANDIDATES.get(leaf, (leaf,))
        for c in cands:
            if c in layer:
                arr = layer[c]
                if arr.shape == tuple(want_shape):
                    return arr
                # Keras depthwise (H, W, C, 1) -> flax grouped conv (H, W, 1, C)
                if (
                    c == "depthwise_kernel"
                    and arr.ndim == 4
                    and arr.shape[-1] == 1
                    and arr.transpose(0, 1, 3, 2).shape == tuple(want_shape)
                ):
                    return arr.transpose(0, 1, 3, 2)
        return None

    def apply_tree(tree):
        flat = dict(
            traverse_util.flatten_dict(jax.tree_util.tree_map(np.asarray, tree))
        )
        missing = []
        for key in list(flat):
            layer_name, leaf = key[-2], key[-1]
            is_bn = layer_name in layers and "gamma" in layers.get(layer_name, {})
            arr = lookup(layer_name, leaf, flat[key].shape, is_bn)
            if arr is None:
                missing.append("/".join(key))
            else:
                flat[key] = arr.astype(flat[key].dtype)
        return traverse_util.unflatten_dict(flat), missing

    new_params, missing = apply_tree(params)
    new_stats = batch_stats
    if batch_stats is not None and jax.tree_util.tree_leaves(batch_stats):
        new_stats, missing_stats = apply_tree(batch_stats)
        missing += missing_stats
    return new_params, new_stats, missing


def save_keras_h5_weights(path: str, params: Any, batch_stats: Any = None) -> None:
    """Write flax parameters as a legacy Keras .h5 weight file.

    The inverse of :func:`load_keras_h5_weights`: weights land at
    ``model_weights/<layer>/<layer>/<name>:0`` with Keras names (kernel /
    bias / gamma / beta / moving_mean / moving_variance / depthwise_kernel),
    plus the legacy ``layer_names`` / ``weight_names`` HDF5 attributes, so a
    model trained here genuinely drops into the TF reference via
    ``keras_model.load_weights(path, by_name=True)`` (verified against Keras 3
    in tests/test_keras_parity.py). Depthwise kernels are transposed back to
    Keras (H, W, C, 1) layout; BN biases are written as ``beta``.
    """
    import h5py
    from flax import traverse_util

    # figure out which layers are BatchNorms (have a 'scale'/'mean' leaf) so
    # their 'bias' exports as 'beta' rather than a conv bias
    def flat_of(tree):
        if tree is None or not jax.tree_util.tree_leaves(tree):
            return {}
        return dict(
            traverse_util.flatten_dict(jax.tree_util.tree_map(np.asarray, tree))
        )

    p_flat = flat_of(params)
    s_flat = flat_of(batch_stats)
    bn_layers = {key[-2] for key in list(p_flat) if key[-1] == "scale"}
    bn_layers |= {key[-2] for key in list(s_flat)}

    # h5 groups are keyed by the bare Keras layer name (key[-2]) — valid only
    # while layer names are globally unique, as they are in Keras models. A
    # future model with two modules sharing a final layer name would silently
    # merge/corrupt groups, so fail loudly instead (ADVICE r2).
    owners: Dict[str, tuple] = {}
    for key in list(p_flat) + list(s_flat):
        prefix, layer = key[:-1][:-1], key[-2]
        if owners.setdefault(layer, prefix) != prefix:
            raise ValueError(
                f"duplicate Keras layer name {layer!r} at module paths "
                f"{'/'.join(owners[layer])} and {'/'.join(prefix)}: the .h5 "
                "export keys groups by bare layer name and cannot represent "
                "both — rename one module"
            )

    _EXPORT_NAMES = {"scale": "gamma", "mean": "moving_mean", "var": "moving_variance"}
    # Keras `layer.weights` order (what the legacy by-name loader zips
    # against): conv [*kernel, bias]; BN [gamma, beta, moving_mean,
    # moving_variance]
    _WEIGHT_ORDER = ("kernel", "depthwise_kernel", "gamma", "beta", "bias",
                     "moving_mean", "moving_variance")

    layers: Dict[str, Dict[str, np.ndarray]] = {}
    for key, arr in list(p_flat.items()) + list(s_flat.items()):
        layer, leaf = key[-2], key[-1]
        if leaf == "bias" and layer in bn_layers:
            name = "beta"
        elif leaf == "kernel" and "depthwise" in layer:
            # flax grouped-conv depthwise (H, W, 1, C) -> Keras (H, W, C, 1).
            # Classified by the layer NAME (Keras convention: *_depthwise),
            # not by shape[2] == 1 — an ordinary conv over a single-channel
            # input has the same shape and must NOT be transposed
            assert arr.ndim == 4 and arr.shape[2] == 1, (layer, arr.shape)
            name = "depthwise_kernel"
            arr = arr.transpose(0, 1, 3, 2)
        else:
            name = _EXPORT_NAMES.get(leaf, leaf)
        layers.setdefault(layer, {})[name] = np.asarray(arr, np.float32)

    with h5py.File(path, "w") as f:
        grp = f.create_group("model_weights")
        grp.attrs["backend"] = np.bytes_(b"tensorflow")
        grp.attrs["keras_version"] = np.bytes_(b"2.15.0")
        # no fixed-width dtype: numpy silently TRUNCATES names longer than
        # an explicit SNN width, which would corrupt the by-name mapping
        # without any error; bare np.array sizes to the longest name
        grp.attrs["layer_names"] = np.array(
            [layer.encode() for layer in layers]
        )
        for layer, weights in layers.items():
            g = grp.create_group(layer)
            inner = g.create_group(layer)
            names = sorted(weights, key=_WEIGHT_ORDER.index)
            g.attrs["weight_names"] = np.array(
                [f"{layer}/{n}:0".encode() for n in names]
            )
            for n in names:
                inner.create_dataset(f"{n}:0", data=weights[n])
