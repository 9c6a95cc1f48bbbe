"""Data pipeline: on-device preprocessing + VOC-style datasets.

TPU-native rebuild of the reference's ``utils/data_utils`` (SURVEY.md §2 row 7).
The reference loads Pascal VOC 2007 via tensorflow_datasets and preprocesses
on the host tf.data workers; here preprocessing (dtype convert, resize, flip
augmentation) is a jitted XLA function that runs **on device**
(BASELINE.json:11 "on-device preprocessing"), and datasets are plain
host-side samplers that hand over fixed-shape uint8 batches:

  images   (B, H, W, 3) uint8
  gt_boxes (B, max_gt, 4) float32, normalized [y1,x1,y2,x2], zero-padded
  gt_labels(B, max_gt) int32, -1 padding (matches the reference's
           padded_batch padding values — boxes 0, labels -1)

Two dataset sources behind one interface:
* :class:`SyntheticVOC` — deterministic procedurally-generated detection data
  (no network / tfds in this environment — SURVEY.md §7 "Environment facts");
* :func:`load_voc_directory` — a real Pascal-VOC directory
  (JPEGImages/ + Annotations/ XML), if one is available on disk.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import xml.etree.ElementTree as ET
from typing import Iterator, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import HyperParams

VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


# ---------------------------------------------------------------------------
# On-device preprocessing (jitted XLA ops — reference: data_utils.preprocessing)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("img_size", "augment", "dtype"))
def preprocess_batch(
    images: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    img_size: int,
    augment: bool = False,
    key: Optional[jax.Array] = None,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """uint8 batch -> [0,1] floats, resized to (img_size, img_size); optional
    per-image random horizontal flip mirroring box x-coordinates.

    Boxes are normalized, so resize leaves them unchanged (the reference's
    tfds boxes likewise pass through resize; flip maps x -> 1 - x).

    ``dtype``: compute/output dtype of the image path. bfloat16 makes the
    resize ~3x faster (4.2 -> 1.4 ms at batch 128) at a max error of one
    uint8 quantization step — the serving path uses it since the model
    consumes bf16 anyway; float32 (default) matches tf.image.resize closely.

    Negative result worth keeping (round 3): replacing the gather-based
    resize with per-axis interpolation-matrix MXU matmuls — which wins 5x
    in a standalone microbenchmark at batch 8 — measured ~10% SLOWER in
    the full config-2 pipeline (2115 -> 1857 img/s): in context XLA
    overlaps/fuses the gather with surrounding ops, and the matmul variant
    serializes against the backbone's MXU work. Resize stays gather-based.
    """
    B = images.shape[0]
    x = images.astype(dtype) / jnp.asarray(255.0, dtype)
    x = jax.image.resize(x, (B, img_size, img_size, 3), method="bilinear")
    if augment:
        if key is None:
            raise ValueError("augment=True requires a PRNG key")
        flip = jax.random.bernoulli(key, 0.5, (B,))
        flipped_img = x[:, :, ::-1, :]
        x = jnp.where(flip[:, None, None, None], flipped_img, x)
        y1, x1, y2, x2 = (gt_boxes[..., i] for i in range(4))
        # zero-padded rows must stay zero: 1 - x on a padded row would create
        # a phantom box, so gate on row validity (any nonzero coordinate)
        valid = jnp.any(gt_boxes != 0.0, axis=-1)
        fb = jnp.stack([y1, 1.0 - x2, y2, 1.0 - x1], axis=-1)
        fb = jnp.where(valid[..., None], fb, 0.0)
        gt_boxes = jnp.where(flip[:, None, None], fb, gt_boxes)
    return x, gt_boxes


# ---------------------------------------------------------------------------
# Synthetic VOC-style dataset (deterministic fixture — SURVEY.md §4 item 4)
# ---------------------------------------------------------------------------


def _max_iou(box: np.ndarray, others: np.ndarray) -> float:
    y1 = np.maximum(box[0], others[:, 0])
    x1 = np.maximum(box[1], others[:, 1])
    y2 = np.minimum(box[2], others[:, 2])
    x2 = np.minimum(box[3], others[:, 3])
    inter = np.clip(y2 - y1, 0, None) * np.clip(x2 - x1, 0, None)
    area = lambda b: (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area(box) + area(others) - inter
    return float((inter / np.maximum(union, 1e-8)).max())


def batch_index_iter(
    num_samples: int,
    batch_size: int,
    *,
    repeat: bool = False,
    drop_remainder: bool = True,
    shuffle: Optional[int] = None,
) -> Iterator[np.ndarray]:
    """Yield per-batch sample indices — THE dataset walk, as data.

    This is the index logic of ``SyntheticVOC.batches`` (fixed order, or a
    fresh deterministic permutation per epoch when ``shuffle`` is an integer
    seed; remainder batches dropped by default) factored out so it can be
    consumed two ways: materialized into sample batches by ``batches()``, or
    stacked into a ``(num_steps, batch_size)`` int32 array and handed to
    ``make_scan_train_steps``'s ``sample_idx`` — device-resident scanned
    training then replays bit-for-bit the order a host loop would have seen.
    """
    epoch = 0
    while True:
        if shuffle is not None:
            order = np.random.default_rng(
                (np.uint32(shuffle), np.uint32(epoch))
            ).permutation(num_samples)
        else:
            order = np.arange(num_samples)
        for start in range(0, num_samples, batch_size):
            idxs = order[start : min(start + batch_size, num_samples)]
            if drop_remainder and len(idxs) < batch_size:
                continue
            yield idxs
        epoch += 1
        if not repeat:
            return


def sharded_batch_index_iter(
    num_samples: int,
    batch_size: int,
    num_shards: int,
    *,
    repeat: bool = False,
    shuffle: Optional[int] = None,
) -> Iterator[np.ndarray]:
    """Shard-local dataset walk for the mesh-sharded scanned trainer.

    Yields ``(batch_size,)`` GLOBAL row indices where batch-position block
    ``d`` (entries ``[d*B/D, (d+1)*B/D)``) indexes only shard ``d``'s rows
    (``[d*N/D, (d+1)*N/D)``) — the locality contract
    ``train.make_scan_train_steps(mesh=...)`` requires so every per-step
    gather stays on-device (see its docstring). Each shard walks its own
    rows in fixed order, or under its own deterministic per-epoch
    permutation when ``shuffle`` is a seed (streams are independent per
    shard: rng seeded by (shuffle, shard, epoch)). Epochs stay aligned
    across shards because N/D and B/D are required to divide evenly.
    """
    if num_samples % num_shards or batch_size % num_shards:
        raise ValueError(
            f"num_samples {num_samples} and batch_size {batch_size} must "
            f"both divide by num_shards {num_shards}"
        )
    n_local = num_samples // num_shards
    b_local = batch_size // num_shards
    if n_local % b_local:
        raise ValueError(
            f"per-shard size {n_local} not divisible by per-shard batch "
            f"{b_local}: shards would drop different remainders"
        )
    epoch = 0
    while True:
        if shuffle is not None:
            orders = [
                np.random.default_rng(
                    (np.uint32(shuffle), np.uint32(d), np.uint32(epoch))
                ).permutation(n_local)
                for d in range(num_shards)
            ]
        else:
            orders = [np.arange(n_local)] * num_shards
        for start in range(0, n_local, b_local):
            yield np.concatenate([
                d * n_local + orders[d][start : start + b_local]
                for d in range(num_shards)
            ])
        epoch += 1
        if not repeat:
            return


@dataclasses.dataclass
class SyntheticVOC:
    """Procedural detection data: bright axis-aligned rectangles on noise.

    Deterministic per (seed, index): the same sample always has the same
    image/boxes, so tests and recall metrics are reproducible. Raw images are
    (raw_h, raw_w) like typical VOC photos; preprocessing resizes them.
    """

    num_samples: int = 256
    raw_h: int = 375
    raw_w: int = 500
    max_boxes: int = 8
    min_boxes: int = 1
    seed: int = 0

    def __len__(self) -> int:
        return self.num_samples

    def sample(self, index: int):
        rng = np.random.default_rng(np.uint32(self.seed * 1_000_003 + index))
        img = rng.integers(0, 60, size=(self.raw_h, self.raw_w, 3), dtype=np.uint8)
        n = int(rng.integers(self.min_boxes, self.max_boxes + 1))
        boxes = np.zeros((self.max_boxes, 4), np.float32)
        labels = np.full((self.max_boxes,), -1, np.int32)
        count = 0
        for _ in range(n):
            # rejection-sample boxes with low mutual overlap: heavily
            # occluded objects would be unlearnable (later rectangles
            # overwrite earlier pixels) and poison recall measurements
            for _attempt in range(8):
                h = rng.uniform(0.12, 0.6)
                w = rng.uniform(0.12, 0.6)
                y1 = rng.uniform(0.0, 1.0 - h)
                x1 = rng.uniform(0.0, 1.0 - w)
                cand = np.array([y1, x1, y1 + h, x1 + w], np.float32)
                if count == 0 or _max_iou(cand, boxes[:count]) < 0.3:
                    break
            else:
                continue
            boxes[count] = cand
            labels[count] = int(rng.integers(1, len(VOC_CLASSES) + 1))  # 0 = bg
            color = rng.integers(120, 255, size=3)
            py1, px1 = int(y1 * self.raw_h), int(x1 * self.raw_w)
            py2, px2 = int((y1 + h) * self.raw_h), int((x1 + w) * self.raw_w)
            img[py1:py2, px1:px2] = color
            count += 1
        return img, boxes, labels

    def batches(
        self,
        batch_size: int,
        *,
        repeat: bool = False,
        drop_remainder: bool = True,
        native: Optional[bool] = None,
        shuffle: Optional[int] = None,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Yield (images u8 (B,H,W,3), boxes (B,M,4), labels (B,M)) batches.

        ``native`` selects the C++ OpenMP generator (tpurpn.native) — ~50x the
        single-thread Python rate, needed to feed multi-k-img/s training.
        None = auto (native when this is a SyntheticVOC and the loader
        builds). Native batches use the loader's own RNG: deterministic per
        (seed, index) but different values than the Python sampler.

        ``shuffle``: integer seed enabling per-epoch sample shuffling (the
        reference's tf.data input flow shuffles between epochs — SURVEY.md
        §2 row 7/§3.1). Each epoch draws a fresh permutation, deterministic
        per (shuffle, epoch); None (default) keeps the fixed order tests and
        recall metrics rely on.
        """
        use_native = False
        if native is not False and type(self) is SyntheticVOC:
            from . import native as native_mod

            use_native = native_mod.available() if native is None else True
        # index walk shared with batch_index_iter so device-resident scanned
        # training (make_scan_train_steps + sample_idx) can replay the exact
        # same sample order; len(self) also covers VOCDirectory, which has no
        # num_samples field
        for idxs in batch_index_iter(
            len(self), batch_size, repeat=repeat,
            drop_remainder=drop_remainder, shuffle=shuffle,
        ):
            if use_native:
                from . import native as native_mod

                yield native_mod.generate_batch(
                    self.seed,
                    np.asarray(idxs, np.int64),
                    self.raw_h,
                    self.raw_w,
                    self.max_boxes,
                    self.min_boxes,
                    len(VOC_CLASSES),
                )
            else:
                samples = [self.sample(i) for i in idxs]
                yield (
                    np.stack([s[0] for s in samples]),
                    np.stack([s[1] for s in samples]),
                    np.stack([s[2] for s in samples]),
                )


# ---------------------------------------------------------------------------
# Real Pascal-VOC directory loader (offline-friendly)
# ---------------------------------------------------------------------------


def _parse_voc_xml(path: str, max_boxes: int):
    root = ET.parse(path).getroot()
    size = root.find("size")
    h = float(size.find("height").text)
    w = float(size.find("width").text)
    boxes = np.zeros((max_boxes, 4), np.float32)
    labels = np.full((max_boxes,), -1, np.int32)
    i = 0
    for obj in root.iter("object"):
        if i >= max_boxes:
            break
        name = obj.find("name").text.strip()
        if name not in VOC_CLASSES:
            continue
        bb = obj.find("bndbox")
        # VOC bndbox pixel coordinates are 1-based; tfds pascal_voc (what the
        # reference consumes) converts min corners as (coord-1)/size — match it
        x1 = (float(bb.find("xmin").text) - 1.0) / w
        y1 = (float(bb.find("ymin").text) - 1.0) / h
        x2 = float(bb.find("xmax").text) / w
        y2 = float(bb.find("ymax").text) / h
        boxes[i] = (y1, x1, y2, x2)
        labels[i] = VOC_CLASSES.index(name) + 1  # 0 = background, like the reference
        i += 1
    return boxes, labels


@dataclasses.dataclass
class VOCDirectory:
    """Pascal-VOC on local disk: <root>/JPEGImages + <root>/Annotations.

    Images are decoded host-side (PIL) and letterbox-free resized on device by
    :func:`preprocess_batch`, matching the reference's plain square resize.
    """

    root: str
    split_ids: List[str]
    max_boxes: int = 64
    raw_size: Tuple[int, int] = (500, 500)  # host-side standardization size

    def __len__(self) -> int:
        return len(self.split_ids)

    def sample(self, index: int):
        from PIL import Image

        img_id = self.split_ids[index]
        img_path = os.path.join(self.root, "JPEGImages", img_id + ".jpg")
        xml_path = os.path.join(self.root, "Annotations", img_id + ".xml")
        # explicit BILINEAR: mirrors the reference's bilinear tf.image.resize
        # and pins behavior across Pillow versions (default flipped to bicubic
        # for RGB in Pillow 9.1)
        img = Image.open(img_path).convert("RGB").resize(
            (self.raw_size[1], self.raw_size[0]), resample=Image.BILINEAR
        )
        boxes, labels = _parse_voc_xml(xml_path, self.max_boxes)
        return np.asarray(img, np.uint8), boxes, labels

    batches = SyntheticVOC.batches  # same batching logic


def load_voc_directory(
    root: str, split: str = "train", max_boxes: int = 64
) -> VOCDirectory:
    """Open a VOCdevkit-style directory (e.g. .../VOC2007). Raises if absent.

    tfds-style split names (what the trainer passes, reference parity) are
    translated to the ImageSets files VOCdevkit actually ships:
    'validation' -> val.txt, 'train+validation' -> trainval.txt.
    """
    fname = {"validation": "val", "train+validation": "trainval"}.get(
        split, split
    )
    split_file = os.path.join(root, "ImageSets", "Main", fname + ".txt")
    with open(split_file) as f:
        ids = [line.split()[0] for line in f if line.strip()]
    return VOCDirectory(root=root, split_ids=ids, max_boxes=max_boxes)


@dataclasses.dataclass
class TfdsVOC:
    """tensorflow_datasets-backed VOC — the reference's exact data source
    (``data_utils.get_dataset("voc/2007", split)``, SURVEY.md §2 row 7).

    Requires ``tensorflow_datasets`` (not installed in offline environments —
    construction raises a clear ImportError; SyntheticVOC / VOCDirectory cover
    those). Samples are host-resized to ``raw_size`` like VOCDirectory (the
    reference's plain square ``tf.image.resize`` has the same aspect-distorting
    semantics; tfds bboxes are already normalized y1x1y2x2 so they pass
    through), labels are shifted +1 (0 = background) and padded with -1 —
    exactly the reference's ``preprocessing`` + ``get_padding_values``
    conventions.
    """

    name: str = "voc/2007"
    split: str = "train"
    max_boxes: int = 64
    raw_size: Tuple[int, int] = (500, 500)

    def __post_init__(self):
        try:
            import tensorflow_datasets as tfds
        except ImportError as e:  # pragma: no cover - exercised via stub
            raise ImportError(
                "tensorflow_datasets is required for TfdsVOC "
                f"(get_dataset({self.name!r})). It is not installed in this "
                "environment; use name='synthetic' or a local VOCdevkit path."
            ) from e
        builder = tfds.builder(self.name)
        builder.download_and_prepare()
        self._examples = None
        self._builder = builder
        self._tfds = tfds
        self._len = int(builder.info.splits[self.split].num_examples)

    def __len__(self) -> int:
        return self._len

    def _materialize(self):
        # decode once, keep host-side uint8 + padded GT (VOC 2007 fits in RAM)
        if self._examples is not None:
            return self._examples
        from PIL import Image

        out = []
        for ex in self._tfds.as_numpy(
            self._builder.as_dataset(split=self.split, shuffle_files=False)
        ):
            # BILINEAR to match the reference's tf.image.resize (ADVICE r2:
            # Pillow's RGB default has been bicubic since 9.1)
            img = np.asarray(
                Image.fromarray(ex["image"]).resize(
                    (self.raw_size[1], self.raw_size[0]),
                    resample=Image.BILINEAR,
                ),
                np.uint8,
            )
            bb = ex["objects"]["bbox"].astype(np.float32)  # (n, 4) y1x1y2x2
            lb = ex["objects"]["label"].astype(np.int32) + 1  # 0 = background
            n = min(len(lb), self.max_boxes)
            boxes = np.zeros((self.max_boxes, 4), np.float32)
            labels = np.full((self.max_boxes,), -1, np.int32)
            boxes[:n] = bb[:n]
            labels[:n] = lb[:n]
            out.append((img, boxes, labels))
        self._examples = out
        return out

    def sample(self, index: int):
        return self._materialize()[index]

    batches = SyntheticVOC.batches  # same batching logic


@dataclasses.dataclass
class CocoJson:
    """COCO-format detection data: an ``instances_*.json`` + an image dir.

    Beyond the reference's data surface (tf-rpn is VOC-only): BASELINE
    config 5 is "COCO-scale RPN training" (BASELINE.json:11), and this
    loader feeds it real COCO annotations through the same
    (images u8, boxes, labels) interface as the VOC sources. Boxes come as
    COCO pixel ``[x, y, w, h]`` and are converted to normalized
    ``[y1, x1, y2, x2]``; ``iscrowd`` and unknown-category annotations are
    skipped; category ids
    (non-contiguous in COCO) are remapped to contiguous 1..K with 0 =
    background, matching the label conventions everywhere else.
    """

    ann_file: str
    images_dir: Optional[str] = None
    max_boxes: int = 64
    raw_size: Tuple[int, int] = (500, 500)

    def __post_init__(self):
        import json

        with open(self.ann_file) as f:
            coco = json.load(f)
        if self.images_dir is None:
            # annotations/instances_train2017.json -> <root>/train2017
            base = os.path.basename(self.ann_file)
            split = base.replace("instances_", "").rsplit(".", 1)[0]
            root = os.path.dirname(os.path.dirname(os.path.abspath(self.ann_file)))
            self.images_dir = os.path.join(root, split)
        cat_ids = sorted(c["id"] for c in coco.get("categories", []))
        self._cat_map = {cid: i + 1 for i, cid in enumerate(cat_ids)}
        self._images = sorted(coco["images"], key=lambda im: im["id"])
        anns_by_img: dict = {}
        for a in coco.get("annotations", []):
            if a.get("iscrowd", 0):
                continue
            if a["category_id"] not in self._cat_map:
                # e.g. a filtered/subset export whose categories list no
                # longer covers every annotation: mapping it to 0 would
                # produce a "background" GT row that every labels != -1
                # validity check still treats as a real object — skip, like
                # iscrowd
                continue
            anns_by_img.setdefault(a["image_id"], []).append(a)
        self._anns = anns_by_img

    def __len__(self) -> int:
        return len(self._images)

    def sample(self, index: int):
        from PIL import Image

        info = self._images[index]
        img = Image.open(
            os.path.join(self.images_dir, info["file_name"])
        ).convert("RGB").resize(
            (self.raw_size[1], self.raw_size[0]), resample=Image.BILINEAR
        )
        w, h = float(info["width"]), float(info["height"])
        boxes = np.zeros((self.max_boxes, 4), np.float32)
        labels = np.full((self.max_boxes,), -1, np.int32)
        for i, a in enumerate(self._anns.get(info["id"], [])[: self.max_boxes]):
            x, y, bw, bh = a["bbox"]
            boxes[i] = (y / h, x / w, (y + bh) / h, (x + bw) / w)
            labels[i] = self._cat_map[a["category_id"]]  # unknown ids skipped
        return np.asarray(img, np.uint8), boxes, labels

    batches = SyntheticVOC.batches  # same batching logic


class Prefetcher:
    """Background-thread batch prefetcher (depth-bounded queue).

    Overlaps host batch generation with device compute — the role of the
    reference's tf.data pipeline threading. Wraps any batch iterator.
    """

    def __init__(self, iterator: Iterator, depth: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = object()
        self._error: BaseException | None = None

        def worker():
            # propagate pipeline errors to the consumer: a swallowed
            # exception here would surface as a bare StopIteration with the
            # real traceback (corrupt JPEG, malformed XML, ...) lost
            try:
                for item in iterator:
                    self._q.put(item)
            except BaseException as e:  # noqa: BLE001 — re-raised in __next__
                self._error = e
            finally:
                self._q.put(self._done)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._error is not None:
                raise RuntimeError(
                    "data pipeline worker failed"
                ) from self._error
            raise StopIteration
        return item


def get_data_types():
    """Mirror of the reference's ``data_utils.get_data_types``.

    Element dtypes for a (image, gt_boxes, gt_labels) sample after
    preprocessing — the reference returns (tf.float32, tf.float32, tf.int32)
    for tf.data's padded_batch; here they are numpy dtypes.
    """
    return (np.float32, np.float32, np.int32)


def get_data_shapes():
    """Mirror of the reference's ``data_utils.get_data_shapes``.

    Per-element shapes with None for the data-dependent dimensions
    ((H, W, 3) image, (num_gt, 4) boxes, (num_gt,) labels). The TPU-native
    pipeline replaces the ragged dims with static pads (img_size / max_gt),
    but the contract shape is the same.
    """
    return ((None, None, 3), (None, 4), (None,))


def get_padding_values():
    """Mirror of the reference's ``data_utils.get_padding_values``.

    padded_batch fill values: image 0, boxes 0.0, labels -1 — these are
    exactly the pad conventions used by SyntheticVOC/VOCDirectory batches.
    """
    return (0, 0.0, -1)


def get_dataset(
    name: str = "synthetic", split: str = "train", **kwargs
):
    """Dataset factory mirroring the reference's data_utils.get_dataset.

    name="synthetic"  -> SyntheticVOC (split selects a disjoint seed);
    name="voc/2007"   -> tensorflow_datasets (the reference's source; needs
                         tfds installed — SURVEY.md §2 row 7);
    name=<x.json>     -> COCO instances file (CocoJson; split is implied by
                         which annotations file you point at);
    name=<path>       -> VOC directory on disk.
    """
    if name.endswith(".json"):
        kwargs.pop("split", None)
        return CocoJson(ann_file=name, **kwargs)
    if name == "synthetic":
        # stable hash for unknown splits: str hash is randomized per process
        import zlib

        seed = {"train": 0, "validation": 1, "test": 2}.get(
            split, zlib.crc32(split.encode()) % 1000
        )
        return SyntheticVOC(seed=seed, **kwargs)
    if name == "voc" or name.startswith("voc/"):
        return TfdsVOC(name=name, split=split, **kwargs)
    return load_voc_directory(name, split=split, **kwargs)
