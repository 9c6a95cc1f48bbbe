"""Native (C++) host-side components, bound via ctypes.

The reference delegates host-side data work to tf.data's C++ workers; this
package is the equivalent layer here: an OpenMP batch generator
(dataloader.cpp) compiled on demand with g++ and loaded through ctypes (no
pybind11 in this environment — SURVEY.md §7 environment facts).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "dataloader.cpp")
_lock = threading.Lock()
_lib = None


def _so_path() -> str:
    """Binary name embeds a source hash: a stale or wrong-source .so (e.g. a
    checkout where mtimes are unreliable) can never be picked up silently."""
    import zlib

    with open(_SRC, "rb") as f:
        digest = zlib.crc32(f.read()) & 0xFFFFFFFF
    return os.path.join(_DIR, f"libtpurpn_data-{digest:08x}.so")


def _build() -> str:
    """Compile the loader unless a binary for this exact source exists.

    Compiles to a per-process temp name and atomically renames into place:
    two concurrent processes (e.g. parallel pytest runs) both building would
    otherwise race on the same output path and one could dlopen a partially
    written ELF.
    """
    so = _so_path()
    if os.path.exists(so):
        return so
    tmp = f"{so}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-fopenmp", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", tmp,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, so)  # atomic on POSIX; last writer wins with identical bits
    return so


def load_library():
    """Build (if needed) and load the native loader; raises on failure."""
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            lib.tpurpn_generate_batch.argtypes = [
                ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.tpurpn_generate_batch.restype = None
            lib.tpurpn_loader_version.restype = ctypes.c_int
            _lib = lib
    return _lib


def available() -> bool:
    try:
        load_library()
        return True
    except Exception:
        return False


def generate_batch(
    seed: int,
    indices: np.ndarray,
    raw_h: int,
    raw_w: int,
    max_boxes: int,
    min_boxes: int,
    num_classes: int,
):
    """Generate a synthetic detection batch natively (parallel across cores).

    Returns (imgs u8 (B,H,W,3), boxes f32 (B,max_boxes,4), labels i32
    (B,max_boxes)) — same format as tpurpn.data.SyntheticVOC, deterministic
    per (seed, index) under its own RNG.
    """
    lib = load_library()
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    B = len(idx)
    imgs = np.empty((B, raw_h, raw_w, 3), np.uint8)
    boxes = np.zeros((B, max_boxes, 4), np.float32)
    labels = np.empty((B, max_boxes), np.int32)
    lib.tpurpn_generate_batch(
        ctypes.c_uint64(seed),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        B, raw_h, raw_w, max_boxes, min_boxes, num_classes,
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return imgs, boxes, labels
