"""Native C++ data loader: build, format, determinism, throughput sanity."""

import numpy as np
import pytest

from tpurpn import native
from tpurpn.data import VOC_CLASSES, Prefetcher, SyntheticVOC

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader failed to build"
)


def test_native_batch_format():
    imgs, boxes, labels = native.generate_batch(
        seed=0, indices=np.arange(4), raw_h=96, raw_w=128,
        max_boxes=8, min_boxes=1, num_classes=len(VOC_CLASSES),
    )
    assert imgs.shape == (4, 96, 128, 3) and imgs.dtype == np.uint8
    assert boxes.shape == (4, 8, 4) and boxes.dtype == np.float32
    assert labels.shape == (4, 8) and labels.dtype == np.int32
    for b in range(4):
        valid = labels[b] != -1
        assert valid.sum() >= 1
        vb = boxes[b][valid]
        assert np.all(vb[:, 2:] > vb[:, :2])
        assert vb.min() >= 0 and vb.max() <= 1
        assert np.all(boxes[b][~valid] == 0)
        assert np.all((labels[b][valid] >= 1) & (labels[b][valid] <= 20))
        # objects are drawn: box interiors are bright vs the dim background
        y1, x1, y2, x2 = vb[0]
        py = int((y1 + y2) / 2 * 96)
        px = int((x1 + x2) / 2 * 128)
        assert imgs[b, py, px].max() >= 120


def test_native_deterministic():
    a = native.generate_batch(7, np.arange(3), 64, 64, 4, 1, 20)
    b = native.generate_batch(7, np.arange(3), 64, 64, 4, 1, 20)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = native.generate_batch(8, np.arange(3), 64, 64, 4, 1, 20)
    assert not np.array_equal(a[0], c[0])


def test_dataset_uses_native_path():
    ds = SyntheticVOC(num_samples=8, raw_h=64, raw_w=64, max_boxes=4)
    nat = next(ds.batches(4, native=True))
    py = next(ds.batches(4, native=False))
    assert nat[0].shape == py[0].shape
    assert nat[1].shape == py[1].shape
    # different RNGs -> different pixels, same contract
    assert not np.array_equal(nat[0], py[0])


def test_native_faster_than_python():
    import time

    def best_of(fn, reps=3):
        # min-of-N: the host has ONE core, so a concurrent background job can
        # multiply any single wall-time sample; the minimum is contention-free
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    ds = SyntheticVOC(num_samples=64)
    next(ds.batches(64, native=True))  # warm: build + page-fault the buffers
    t_native = best_of(lambda: next(ds.batches(64, native=True)))
    t_py = best_of(lambda: next(ds.batches(64, native=False)))
    assert t_native < t_py, (t_native, t_py)


def test_prefetcher_yields_all():
    ds = SyntheticVOC(num_samples=12, raw_h=32, raw_w=32)
    items = list(Prefetcher(ds.batches(4), depth=2))
    assert len(items) == 3
    assert items[0][0].shape == (4, 32, 32, 3)
