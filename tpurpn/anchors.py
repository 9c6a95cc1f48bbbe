"""Anchor-grid generation.

TPU-native rebuild of the reference's ``utils/bbox_utils.generate_base_anchors``
and ``generate_anchors`` (SURVEY.md §2 row 5). All boxes use the TF convention
``[y1, x1, y2, x2]`` in image-normalized coordinates ([0, 1]).

Anchors depend only on the (static) HyperParams, so they are computed eagerly
in numpy once and handed to jitted functions as a constant — XLA folds them
into the compiled program; there is no per-step anchor cost (unlike the
reference, which also computes them once, host-side: rpn_trainer.py call stack,
SURVEY.md §3.1).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from .config import HyperParams


def generate_base_anchors(hp: HyperParams) -> jnp.ndarray:
    """Area-preserving base anchors centered at the origin, normalized by img_size.

    For each (scale, ratio) — scale-major order — width = scale / sqrt(ratio)
    and height = scale * sqrt(ratio), i.e. ratio = h/w with area ~= scale².
    Returns (anchor_count, 4) float32 in [y1, x1, y2, x2] / img_size.

    Reference parity: utils/bbox_utils.generate_base_anchors (scale outer loop,
    ratio inner; normalized by hyper_params["img_size"]).
    """
    scales = np.asarray(hp.anchor_scales, dtype=np.float64)
    ratios = np.asarray(hp.anchor_ratios, dtype=np.float64)
    # scale-major, ratio-minor ordering
    scale_grid = np.repeat(scales, len(ratios))
    ratio_grid = np.tile(ratios, len(scales))
    w = scale_grid / np.sqrt(ratio_grid)
    h = scale_grid * np.sqrt(ratio_grid)
    base = np.stack([-h / 2.0, -w / 2.0, h / 2.0, w / 2.0], axis=-1)
    return jnp.asarray(base / hp.img_size, dtype=jnp.float32)


@functools.lru_cache(maxsize=None)
def _generate_anchors_np(hp: HyperParams) -> np.ndarray:
    fm = hp.feature_map_shape
    stride = 1.0 / fm
    # pixel-center grid coordinates in normalized space (reference:
    # tf.range(fm) / fm + stride / 2)
    coords = (np.arange(fm, dtype=np.float64) / fm) + stride / 2.0
    grid_x, grid_y = np.meshgrid(coords, coords)  # (fm, fm), x varies fastest
    centers = np.stack(
        [grid_y.ravel(), grid_x.ravel(), grid_y.ravel(), grid_x.ravel()], axis=-1
    )  # (fm*fm, 4)
    base = np.asarray(generate_base_anchors(hp), dtype=np.float64)  # (A, 4)
    anchors = centers[:, None, :] + base[None, :, :]  # (fm*fm, A, 4)
    anchors = anchors.reshape(-1, 4)
    return np.clip(anchors, 0.0, 1.0).astype(np.float32)


def generate_anchors(hp: HyperParams) -> jnp.ndarray:
    """Dense anchor grid: (fm*fm*anchor_count, 4), clipped to [0, 1].

    Row order is row-major over (grid_y, grid_x, anchor) — matching the
    reference's reshape of (fm, fm, A, 4) -> (fm*fm*A, 4)
    (utils/bbox_utils.generate_anchors), which in turn matches the layout of
    the conv head outputs reshaped to (B, fm*fm*A, ...).
    """
    return jnp.asarray(_generate_anchors_np(hp))
