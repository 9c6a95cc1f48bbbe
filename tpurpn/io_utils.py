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
        help="'synthetic' or a path to a VOCdevkit VOC20xx directory",
    )
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the batch over all visible devices")
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output-dir", default="trained")
    p.add_argument("--weights", default=None, help="checkpoint dir or .h5 file to load")
    return p.parse_args(argv)


def is_valid_backbone(backbone: str) -> bool:
    return backbone in VALID_BACKBONES


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


def load_checkpoint(path: str, like):
    """Restore a pytree saved by :func:`save_checkpoint` (shaped like ``like``)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), like)


# ---------------------------------------------------------------------------
# Keras .h5 weight import
# ---------------------------------------------------------------------------


def _h5_layer_weights(h5file) -> Dict[str, list]:
    """Collect {layer_name: [arrays in stored order]} from a Keras .h5 file."""
    out: Dict[str, list] = {}

    def visit(name, obj):
        import h5py

        if isinstance(obj, h5py.Dataset):
            # names look like model_weights/<layer>/<layer>/kernel:0 (keras2)
            parts = [p for p in name.split("/") if p]
            if len(parts) >= 2:
                layer = parts[-2] if parts[-2] != "model_weights" else parts[-1]
                # prefer the outermost layer-name group
                for p in parts:
                    if p not in ("model_weights", "vars"):
                        layer = p
                        break
                out.setdefault(layer, []).append((name, np.asarray(obj)))

    h5file.visititems(visit)
    return {k: [a for _, a in sorted(v)] for k, v in out.items()}


def load_keras_h5_weights(path: str, params: Any, batch_stats: Any = None):
    """Map a Keras .h5 weight file onto the flax parameter tree.

    The flax modules are named after their Keras counterparts
    (block1_conv1 ... rpn_cls), and conv kernels share the HWIO layout, so
    mapping is name-based with no transposition. Layers present in the tree
    but absent from the file are left at their current values (and returned
    in the `missing` list).

    Returns (new_params, new_batch_stats, missing_layer_names).
    """
    import h5py
    from flax import traverse_util

    with h5py.File(path, "r") as f:
        layers = _h5_layer_weights(f)

    flat = dict(traverse_util.flatten_dict(jax.tree_util.tree_map(np.asarray, params)))
    stats_flat = (
        dict(traverse_util.flatten_dict(
            jax.tree_util.tree_map(np.asarray, batch_stats)))
        if batch_stats is not None
        else {}
    )
    missing = []
    for key in list(flat):
        layer_name = key[-2]  # (...path..., layer, 'kernel'|'bias'|'scale')
        param_name = key[-1]
        if layer_name not in layers:
            missing.append("/".join(key))
            continue
        arrays = layers[layer_name]
        want_shape = flat[key].shape
        matched = [a for a in arrays if a.shape == want_shape]
        if param_name == "kernel":
            cand = [a for a in matched if a.ndim == flat[key].ndim]
        elif param_name == "bias":
            cand = [a for a in matched if a.ndim == 1]
        elif param_name == "scale":  # BN gamma is stored first
            cand = matched[:1]
        else:
            cand = matched
        if not cand:
            missing.append("/".join(key))
            continue
        flat[key] = cand[0].astype(flat[key].dtype)

    from flax import traverse_util as tu

    new_params = tu.unflatten_dict(flat)
    new_stats = tu.unflatten_dict(stats_flat) if stats_flat else batch_stats
    return new_params, new_stats, missing
