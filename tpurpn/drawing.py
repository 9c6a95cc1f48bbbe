"""Visualization: draw boxes and anchor grids onto images.

Rebuild of the reference's ``utils/drawing_utils`` (SURVEY.md §2 row 9). The
reference shows matplotlib windows interactively; this environment is
headless, so everything renders to PNG files via PIL.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _to_pil(image: np.ndarray):
    from PIL import Image

    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    return Image.fromarray(img)


def draw_bboxes(image: np.ndarray, bboxes: np.ndarray, color=(255, 40, 40)):
    """Draw normalized [y1,x1,y2,x2] boxes; returns a PIL image.

    (reference: drawing_utils.draw_bboxes — tf.image.draw_bounding_boxes + plt)
    """
    from PIL import ImageDraw

    pil = _to_pil(image)
    h, w = pil.height, pil.width
    draw = ImageDraw.Draw(pil)
    for box in np.asarray(bboxes).reshape(-1, 4):
        y1, x1, y2, x2 = box
        if y2 <= y1 or x2 <= x1:
            continue
        draw.rectangle([x1 * w, y1 * h, x2 * w, y2 * h], outline=tuple(color), width=2)
    return pil


def draw_bboxes_with_labels(
    image: np.ndarray,
    bboxes: np.ndarray,
    labels: Sequence[int],
    class_names: Optional[Sequence[str]] = None,
):
    """Boxes + class-name text (reference: drawing_utils.draw_bboxes_with_labels)."""
    from PIL import ImageDraw

    pil = draw_bboxes(image, bboxes)
    h, w = pil.height, pil.width
    draw = ImageDraw.Draw(pil)
    for box, lab in zip(np.asarray(bboxes).reshape(-1, 4), labels):
        if lab < 0:
            continue
        # labels are 1-based with 0 = background (data.py: VOC index + 1),
        # so class_names[lab - 1] is the name; 0 renders as "background"
        lab = int(lab)
        if class_names is None:
            name = str(lab)
        elif lab == 0:
            name = "background"
        elif lab - 1 < len(class_names):
            name = class_names[lab - 1]
        else:
            name = str(lab)
        draw.text((box[1] * w + 2, box[0] * h + 2), name, fill=(255, 255, 0))
    return pil


def draw_grid_map(image: np.ndarray, grid_points: np.ndarray, radius: int = 2):
    """Mark anchor-grid centers (reference: drawing_utils.draw_grid_map)."""
    from PIL import ImageDraw

    pil = _to_pil(image)
    h, w = pil.height, pil.width
    draw = ImageDraw.Draw(pil)
    for cy, cx in np.asarray(grid_points).reshape(-1, 2):
        x, y = cx * w, cy * h
        draw.ellipse([x - radius, y - radius, x + radius, y + radius],
                     fill=(0, 255, 0))
    return pil


def draw_bboxes_to_file(image: np.ndarray, bboxes: np.ndarray, path: str) -> None:
    draw_bboxes(image, bboxes).save(path)
