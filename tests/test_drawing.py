"""Drawing utilities render boxes to images (headless PNG output)."""

import numpy as np

from tpurpn.drawing import draw_bboxes, draw_bboxes_with_labels, draw_grid_map


def test_draw_bboxes_marks_pixels(tmp_path):
    img = np.zeros((100, 100, 3), np.uint8)
    boxes = np.array([[0.1, 0.1, 0.5, 0.5]], np.float32)
    pil = draw_bboxes(img, boxes)
    arr = np.asarray(pil)
    assert arr.shape == (100, 100, 3)
    assert arr.sum() > 0  # something was drawn
    # the box edge row should contain red pixels
    assert (arr[10, 10:50, 0] > 200).any()
    out = tmp_path / "boxes.png"
    pil.save(str(out))
    assert out.exists()


def test_draw_accepts_float_images():
    img = np.random.default_rng(0).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    pil = draw_bboxes(img, np.array([[0.2, 0.2, 0.8, 0.8]], np.float32))
    assert np.asarray(pil).dtype == np.uint8


def test_draw_with_labels_and_grid():
    img = np.zeros((64, 64, 3), np.uint8)
    boxes = np.array([[0.1, 0.1, 0.4, 0.4], [0.5, 0.5, 0.9, 0.9]], np.float32)
    pil = draw_bboxes_with_labels(img, boxes, [1, 3], class_names=None)
    assert np.asarray(pil).sum() > 0
    grid = np.stack(
        np.meshgrid(np.linspace(0.1, 0.9, 4), np.linspace(0.1, 0.9, 4)), -1
    ).reshape(-1, 2)
    pil2 = draw_grid_map(img, grid)
    assert (np.asarray(pil2)[:, :, 1] > 200).any()  # green dots


def test_draw_skips_degenerate_boxes():
    img = np.zeros((32, 32, 3), np.uint8)
    boxes = np.zeros((5, 4), np.float32)  # padding rows
    pil = draw_bboxes(img, boxes)
    assert np.asarray(pil).sum() == 0  # nothing drawn


def test_draw_labels_one_based_convention():
    """labels are 1-based (0 = background): label 1 must render the FIRST
    class name, label len(names) the last (previously IndexError), 0 ->
    'background'."""
    from tpurpn.data import VOC_CLASSES
    from tpurpn.drawing import draw_bboxes_with_labels

    img = np.zeros((64, 64, 3), np.uint8)
    boxes = np.array(
        [[0.1, 0.1, 0.4, 0.4], [0.5, 0.5, 0.9, 0.9], [0.2, 0.6, 0.4, 0.9]],
        np.float32,
    )
    # includes the last class id (len(VOC_CLASSES)) and background (0)
    pil = draw_bboxes_with_labels(
        img, boxes, [1, len(VOC_CLASSES), 0], class_names=VOC_CLASSES
    )
    assert np.asarray(pil).sum() > 0
