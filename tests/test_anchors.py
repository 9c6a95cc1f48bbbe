"""Anchor generation: golden-value and invariant tests (SURVEY.md §4 item 1)."""

import numpy as np
import jax.numpy as jnp

from tpurpn import get_hyper_params, generate_anchors, generate_base_anchors


def test_base_anchor_shapes_and_areas():
    hp = get_hyper_params("vgg16")
    base = np.asarray(generate_base_anchors(hp))
    assert base.shape == (9, 4)
    h = (base[:, 2] - base[:, 0]) * hp.img_size
    w = (base[:, 3] - base[:, 1]) * hp.img_size
    # area-preserving anchors: h*w == scale^2 for each (scale, ratio)
    expected_scales = np.repeat([128.0, 256.0, 512.0], 3)
    np.testing.assert_allclose(np.sqrt(h * w), expected_scales, rtol=1e-5)
    # ratio = h/w in scale-major, ratio-minor (1, 2, 0.5) order
    np.testing.assert_allclose(h / w, np.tile([1.0, 2.0, 0.5], 3), rtol=1e-5)
    # centered at origin
    np.testing.assert_allclose(base[:, 0] + base[:, 2], 0.0, atol=1e-7)
    np.testing.assert_allclose(base[:, 1] + base[:, 3], 0.0, atol=1e-7)


def test_base_anchor_golden_first_row():
    # scale=128, ratio=1 -> 128x128 box centered at 0, normalized by 500
    hp = get_hyper_params("vgg16")
    base = np.asarray(generate_base_anchors(hp))
    np.testing.assert_allclose(
        base[0], np.array([-64, -64, 64, 64]) / 500.0, rtol=1e-6
    )
    # scale=128, ratio=2 -> h=128*sqrt(2), w=128/sqrt(2)
    h, w = 128 * np.sqrt(2), 128 / np.sqrt(2)
    np.testing.assert_allclose(
        base[1], np.array([-h / 2, -w / 2, h / 2, w / 2]) / 500.0, rtol=1e-6
    )


def test_anchor_grid_properties():
    hp = get_hyper_params("vgg16")
    anchors = np.asarray(generate_anchors(hp))
    assert anchors.shape == (31 * 31 * 9, 4)
    assert anchors.dtype == np.float32
    assert anchors.min() >= 0.0 and anchors.max() <= 1.0
    # first grid cell center is at stride/2 = 1/62
    stride = 1.0 / 31
    ctr = stride / 2
    # anchor 0 of cell 0: scale 128 ratio 1 centered at (ctr, ctr), clipped
    y1 = max(ctr - 64 / 500, 0.0)
    np.testing.assert_allclose(anchors[0, 0], y1, atol=1e-6)
    # unclipped y2 = ctr + 64/500
    np.testing.assert_allclose(anchors[0, 2], ctr + 64 / 500, atol=1e-6)


def test_anchor_grid_row_major_layout():
    """Anchor rows are (grid_y, grid_x, anchor)-major — matches head reshape."""
    hp = get_hyper_params("mobilenet_v2")
    assert hp.feature_map_shape == 32
    anchors = np.asarray(generate_anchors(hp))
    assert anchors.shape == (32 * 32 * 9, 4)
    A = hp.anchor_count
    fm = hp.feature_map_shape
    stride = 1.0 / fm
    # interior cells (no clipping): cell (gy, gx) starts at index (gy*fm+gx)*A;
    # anchor 0 (scale 128, ratio 1) center must be the cell center.
    gy, gx = 16, 17
    row = (gy * fm + gx) * A
    cx = (anchors[row, 1] + anchors[row, 3]) / 2
    cy = (anchors[row, 0] + anchors[row, 2]) / 2
    np.testing.assert_allclose(cx, gx / fm + stride / 2, atol=1e-6)
    np.testing.assert_allclose(cy, gy / fm + stride / 2, atol=1e-6)
    # stepping one cell in x advances the row index by exactly A
    cx_next = (anchors[row + A, 1] + anchors[row + A, 3]) / 2
    np.testing.assert_allclose(cx_next - cx, stride, atol=1e-6)


def test_anchor_count_total():
    hp = get_hyper_params("vgg16")
    assert hp.anchor_count == 9
    assert hp.total_anchors == 31 * 31 * 9 == 8649


def test_feature_map_shapes():
    assert get_hyper_params("vgg16").feature_map_shape == 31
    assert get_hyper_params("mobilenet_v2").feature_map_shape == 32
    # tiny sizes used by the multi-chip dryrun
    assert get_hyper_params("vgg16", img_size=64).feature_map_shape == 4
    assert get_hyper_params("mobilenet_v2", img_size=64).feature_map_shape == 4
