"""Data pipeline tests: synthetic fixture determinism + on-device preprocessing."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpurpn.data import SyntheticVOC, preprocess_batch, get_dataset, VOC_CLASSES


def test_synthetic_deterministic():
    ds1, ds2 = SyntheticVOC(num_samples=4, seed=3), SyntheticVOC(num_samples=4, seed=3)
    img1, b1, l1 = ds1.sample(2)
    img2, b2, l2 = ds2.sample(2)
    np.testing.assert_array_equal(img1, img2)
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(l1, l2)
    img3, _, _ = ds1.sample(3)
    assert not np.array_equal(img1, img3)


def test_synthetic_format():
    ds = SyntheticVOC(num_samples=8, max_boxes=5)
    img, boxes, labels = ds.sample(0)
    assert img.shape == (375, 500, 3) and img.dtype == np.uint8
    assert boxes.shape == (5, 4) and labels.shape == (5,)
    valid = labels != -1
    assert valid.sum() >= 1
    assert np.all(boxes[valid][:, 2:] > boxes[valid][:, :2])  # y2>y1, x2>x1
    assert boxes[valid].min() >= 0 and boxes[valid].max() <= 1
    assert np.all(boxes[~valid] == 0)
    assert np.all((labels[valid] >= 1) & (labels[valid] <= len(VOC_CLASSES)))


def test_synthetic_batches():
    ds = SyntheticVOC(num_samples=10)
    batches = list(ds.batches(4))
    assert len(batches) == 2  # drop remainder
    imgs, boxes, labels = batches[0]
    assert imgs.shape == (4, 375, 500, 3)
    assert boxes.shape == (4, 8, 4) and labels.shape == (4, 8)


def test_preprocess_resize_and_range():
    ds = SyntheticVOC(num_samples=4)
    imgs, boxes, labels = next(ds.batches(4))
    x, b = preprocess_batch(jnp.asarray(imgs), jnp.asarray(boxes), 128)
    assert x.shape == (4, 128, 128, 3) and x.dtype == jnp.float32
    assert float(x.min()) >= 0.0 and float(x.max()) <= 1.0
    np.testing.assert_array_equal(np.asarray(b), boxes)  # no aug -> boxes pass through


def test_preprocess_flip_boxes_mirror():
    # deterministic flip check: find a key where image 0 flips
    ds = SyntheticVOC(num_samples=2)
    imgs, boxes, labels = next(ds.batches(2))
    imgs_j, boxes_j = jnp.asarray(imgs), jnp.asarray(boxes)
    for s in range(20):
        key = jax.random.key(s)
        flip = jax.random.bernoulli(key, 0.5, (2,))
        if bool(flip[0]):
            break
    x, b = preprocess_batch(imgs_j, boxes_j, 96, augment=True, key=key)
    x0_ref, _ = preprocess_batch(imgs_j, boxes_j, 96)
    np.testing.assert_allclose(
        np.asarray(x[0]), np.asarray(x0_ref[0])[:, ::-1, :], atol=1e-6
    )
    valid = labels[0] != -1
    got = np.asarray(b[0])[valid]
    orig = boxes[0][valid]
    np.testing.assert_allclose(got[:, 1], 1 - orig[:, 3], atol=1e-6)  # x1' = 1-x2
    np.testing.assert_allclose(got[:, 3], 1 - orig[:, 1], atol=1e-6)  # x2' = 1-x1
    np.testing.assert_allclose(got[:, [0, 2]], orig[:, [0, 2]], atol=1e-6)  # y same
    # padded rows stay zero
    np.testing.assert_array_equal(np.asarray(b[0])[~valid], 0.0)


def test_get_dataset_splits_differ():
    tr = get_dataset("synthetic", "train", num_samples=2)
    te = get_dataset("synthetic", "test", num_samples=2)
    assert not np.array_equal(tr.sample(0)[0], te.sample(0)[0])

def _write_voc_fixture(root, n=3):
    """Tiny on-disk VOCdevkit-style fixture: JPEGImages + Annotations + split."""
    import os

    from PIL import Image

    os.makedirs(os.path.join(root, "JPEGImages"))
    os.makedirs(os.path.join(root, "Annotations"))
    os.makedirs(os.path.join(root, "ImageSets", "Main"))
    rng = np.random.default_rng(0)
    ids = []
    for i in range(n):
        img_id = f"{i:06d}"
        ids.append(img_id)
        arr = rng.integers(0, 255, size=(60, 80, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(root, "JPEGImages", img_id + ".jpg"))
        xml = f"""<annotation>
  <size><width>80</width><height>60</height><depth>3</depth></size>
  <object><name>dog</name>
    <bndbox><xmin>9</xmin><ymin>7</ymin><xmax>40</xmax><ymax>30</ymax></bndbox>
  </object>
  <object><name>unknownclass</name>
    <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>10</xmax><ymax>10</ymax></bndbox>
  </object>
</annotation>"""
        with open(os.path.join(root, "Annotations", img_id + ".xml"), "w") as f:
            f.write(xml)
    with open(os.path.join(root, "ImageSets", "Main", "train.txt"), "w") as f:
        f.write("\n".join(ids) + "\n")
    return ids


def test_voc_directory_batches(tmp_path):
    """The real-data path: load_voc_directory -> batches() must iterate."""
    from tpurpn.data import load_voc_directory

    root = str(tmp_path / "VOC2007")
    _write_voc_fixture(root, n=3)
    ds = load_voc_directory(root, split="train", max_boxes=4)
    assert len(ds) == 3
    got = list(ds.batches(2, drop_remainder=False))
    assert len(got) == 2  # 2 + 1
    imgs, boxes, labels = got[0]
    assert imgs.shape == (2, 500, 500, 3) and imgs.dtype == np.uint8
    assert boxes.shape == (2, 4, 4) and labels.shape == (2, 4)
    # tfds-convention normalization: min corners (coord-1)/size, max coord/size
    np.testing.assert_allclose(boxes[0, 0], [6 / 60, 8 / 80, 30 / 60, 40 / 80])
    assert labels[0, 0] == VOC_CLASSES.index("dog") + 1
    # unknown class skipped, rest padded
    assert labels[0, 1] == -1 and np.all(boxes[0, 1:] == 0)


def test_get_dataset_custom_split_stable():
    """Unknown synthetic splits must seed deterministically across processes."""
    a = get_dataset("synthetic", "myweirdsplit", num_samples=2)
    b = get_dataset("synthetic", "myweirdsplit", num_samples=2)
    assert a.seed == b.seed
    import zlib

    assert a.seed == zlib.crc32(b"myweirdsplit") % 1000

def test_data_api_mirrors():
    """Reference data_utils API parity: types/shapes/padding values."""
    from tpurpn.data import get_data_shapes, get_data_types, get_padding_values

    assert get_data_types() == (np.float32, np.float32, np.int32)
    assert get_data_shapes() == ((None, None, 3), (None, 4), (None,))
    pads = get_padding_values()
    assert pads == (0, 0.0, -1)
    # the fixtures actually use these pad values
    ds = SyntheticVOC(num_samples=2, max_boxes=6)
    _, boxes, labels = ds.sample(0)
    n_valid = int((labels != -1).sum())
    assert np.all(boxes[n_valid:] == pads[1]) and np.all(labels[n_valid:] == pads[2])


def test_preprocess_bf16_close_to_f32_resize():
    """The bf16 serving preprocess stays within ~one uint8 quantization
    step of the f32 bilinear resize (the documented contract)."""
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (4, 37, 50, 3), dtype=np.uint8)
    x_b, _ = preprocess_batch(
        jnp.asarray(raw), jnp.zeros((4, 1, 4)), 64, dtype=jnp.bfloat16
    )
    ref = np.asarray(
        jax.image.resize(
            jnp.asarray(raw, jnp.float32) / 255.0, (4, 64, 64, 3), "bilinear"
        )
    )
    assert np.abs(np.asarray(x_b, np.float32) - ref).max() <= 1.5 / 255.0


def test_batches_shuffle_per_epoch():
    """VERDICT r2 #4a: shuffle=seed draws a fresh deterministic permutation
    per epoch; shuffle=None keeps the historical fixed order."""
    ds = SyntheticVOC(num_samples=12, max_boxes=4, raw_h=24, raw_w=32)
    inv = {ds.sample(i)[0].tobytes(): i for i in range(len(ds))}

    def order(shuffle, n_epochs=2):
        it = ds.batches(1, repeat=True, native=False, shuffle=shuffle)
        return [
            inv[next(it)[0][0].tobytes()] for _ in range(n_epochs * len(ds))
        ]

    fixed = order(None)
    assert fixed == list(range(12)) * 2  # unshuffled: index order each epoch

    o1, o2 = order(5), order(5)
    assert o1 == o2  # deterministic per seed
    e1, e2 = o1[:12], o1[12:]
    assert sorted(e1) == list(range(12)) and sorted(e2) == list(range(12))
    assert e1 != list(range(12)) and e1 != e2  # shuffled, and differs by epoch
    assert order(6)[:12] != e1  # different seed, different permutation


def test_coco_json_loader(tmp_path):
    """CocoJson: COCO [x,y,w,h] pixels -> normalized y1x1y2x2, contiguous
    labels with -1 padding, iscrowd skipped, same batch interface."""
    import json

    from PIL import Image

    img_dir = tmp_path / "val"
    img_dir.mkdir()
    for name, (w, h) in (("a.jpg", (40, 20)), ("b.jpg", (30, 30))):
        Image.new("RGB", (w, h), (100, 50, 25)).save(img_dir / name)
    coco = {
        "images": [
            {"id": 7, "file_name": "a.jpg", "width": 40, "height": 20},
            {"id": 3, "file_name": "b.jpg", "width": 30, "height": 30},
        ],
        # sparse, non-contiguous category ids (like real COCO)
        "categories": [{"id": 18}, {"id": 2}],
        "annotations": [
            {"image_id": 7, "bbox": [10, 5, 20, 10], "category_id": 18},
            {"image_id": 7, "bbox": [0, 0, 4, 4], "category_id": 2,
             "iscrowd": 1},
            {"image_id": 3, "bbox": [3, 6, 9, 12], "category_id": 2},
        ],
    }
    ann = tmp_path / "annotations" / "instances_val.json"
    ann.parent.mkdir()
    ann.write_text(json.dumps(coco))

    ds = get_dataset(str(ann), max_boxes=4, raw_size=(16, 16))
    assert len(ds) == 2
    # images sorted by id: index 0 -> id 3 (b.jpg), index 1 -> id 7 (a.jpg)
    img, boxes, labels = ds.sample(1)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    np.testing.assert_allclose(
        boxes[0], [5 / 20, 10 / 40, 15 / 20, 30 / 40], atol=1e-6
    )
    assert labels[0] == 2  # cat id 18 -> contiguous 2 (sorted: 2->1, 18->2)
    assert (labels[1:] == -1).all()  # iscrowd skipped, rest padding
    img2, boxes2, labels2 = ds.sample(0)
    np.testing.assert_allclose(
        boxes2[0], [6 / 30, 3 / 30, 18 / 30, 12 / 30], atol=1e-6
    )
    assert labels2[0] == 1
    # batch interface shared with the VOC sources
    b_imgs, b_boxes, b_labels = next(ds.batches(2, native=False))
    assert b_imgs.shape == (2, 16, 16, 3) and b_boxes.shape == (2, 4, 4)


def test_get_dataset_tfds_requires_tfds(monkeypatch):
    """get_dataset('voc/2007') routes to TfdsVOC; without tensorflow_datasets
    installed it must raise a clear ImportError. Simulate absence by blocking
    the import so the test also passes where the 'voc' extra IS installed."""
    import builtins
    import sys

    import pytest

    monkeypatch.delitem(sys.modules, "tensorflow_datasets", raising=False)
    real_import = builtins.__import__

    def blocked(name, *a, **kw):
        if name == "tensorflow_datasets":
            raise ImportError(f"No module named {name!r}")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", blocked)
    with pytest.raises(ImportError, match="tensorflow_datasets"):
        get_dataset("voc/2007", "train")


def test_tfds_voc_adapter_with_stub(monkeypatch):
    """TfdsVOC against a stubbed tensorflow_datasets module: reference
    conventions (resize to raw_size, labels +1, -1/0 padding) hold."""
    import sys
    import types

    h, w = 30, 45
    examples = [
        {
            "image": np.full((h, w, 3), 7, np.uint8),
            "objects": {
                "bbox": np.array([[0.1, 0.2, 0.5, 0.6]], np.float32),
                "label": np.array([3], np.int64),
            },
        },
        {
            "image": np.full((h * 2, w, 3), 9, np.uint8),
            "objects": {
                "bbox": np.zeros((0, 4), np.float32),
                "label": np.zeros((0,), np.int64),
            },
        },
    ]

    class _Split:
        num_examples = len(examples)

    class _Builder:
        info = types.SimpleNamespace(splits={"train": _Split()})

        def download_and_prepare(self):
            pass

        def as_dataset(self, split, shuffle_files=False):
            assert split == "train"
            return examples

    stub = types.SimpleNamespace(
        builder=lambda name: _Builder(), as_numpy=lambda ds: ds
    )
    monkeypatch.setitem(sys.modules, "tensorflow_datasets", stub)

    ds = get_dataset("voc/2007", "train", max_boxes=4, raw_size=(16, 16))
    assert len(ds) == 2
    imgs, boxes, labels = next(ds.batches(2, native=False))
    assert imgs.shape == (2, 16, 16, 3) and imgs.dtype == np.uint8
    np.testing.assert_allclose(boxes[0, 0], [0.1, 0.2, 0.5, 0.6])
    assert labels[0, 0] == 4  # tfds label 3 -> +1 (0 = background)
    assert labels[0, 1] == -1 and np.all(boxes[0, 1:] == 0)
    assert np.all(labels[1] == -1)  # empty example fully padded


def test_voc_directory_validation_split_maps_to_val_txt(tmp_path):
    """tfds-style 'validation' must open VOCdevkit's val.txt (the file VOC
    actually ships) — the trainer passes 'validation' for reference parity."""
    import os

    from tpurpn.data import load_voc_directory

    root = str(tmp_path / "VOC2007")
    _write_voc_fixture(root, n=2)
    os.rename(
        os.path.join(root, "ImageSets", "Main", "train.txt"),
        os.path.join(root, "ImageSets", "Main", "val.txt"),
    )
    ds = load_voc_directory(root, split="validation", max_boxes=4)
    assert len(ds) == 2


def test_prefetcher_propagates_worker_errors():
    """A data-pipeline error must surface with its traceback, not appear as
    a bare StopIteration (which reads as exhaustion)."""
    from tpurpn.data import Prefetcher

    def bad_iter():
        yield 1
        raise ValueError("corrupt sample")

    it = Prefetcher(bad_iter(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="pipeline worker failed") as ei:
        next(it)
    assert isinstance(ei.value.__cause__, ValueError)
