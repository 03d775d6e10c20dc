"""ctypes bindings for the native C++ image pipeline (native/varloader.cc).

The shared library is built lazily on first use with g++ (toolchain is in
the image; no pip deps). Falls back to the PIL path in
``var_tpu.data.imagenet`` when compilation or decoding is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "varloader.cc")
_LIB_DIR = os.path.join(_REPO, "native", "build")
_LIB = os.path.join(_LIB_DIR, "libvarloader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> str:
    os.makedirs(_LIB_DIR, exist_ok=True)
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
               "-ljpeg", "-lpng", "-o", _LIB + ".tmp"]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(_LIB + ".tmp", _LIB)
    return _LIB


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is None:
            try:
                lib = ctypes.CDLL(_build())
                lib.vl_load_image.argtypes = [
                    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
                    ctypes.c_float, ctypes.c_int,
                    np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ]
                lib.vl_load_image.restype = ctypes.c_int
                lib.vl_load_batch.argtypes = [
                    ctypes.c_char_p,
                    np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                    ctypes.c_int,
                    np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ]
                lib.vl_load_batch.restype = ctypes.c_int
                _lib = lib
            except Exception as e:  # missing toolchain/libs -> PIL fallback
                print(f"[native_loader] build unavailable ({e}); using PIL fallback")
                _lib = False  # sentinel
        return _lib or None


def available() -> bool:
    return get_lib() is not None


def load_image(path: str, mid: int, reso: int, crop_fxy=(-1.0, -1.0),
               hflip=False) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    out = np.empty((reso, reso, 3), np.float32)
    rc = lib.vl_load_image(path.encode(), mid, reso, float(crop_fxy[0]),
                           float(crop_fxy[1]), int(hflip), out)
    if rc != 0:
        raise IOError(f"native decode failed: {path}")
    return out


def load_batch(paths: Sequence[str], mid: int, reso: int,
               crops: Optional[np.ndarray] = None, num_threads: int = 16) -> np.ndarray:
    """Decode+resize+crop a batch in parallel C++ threads.

    ``crops``: (N, 3) float32 [fx, fy, hflip] with fx/fy in [0,1] picking
    the crop origin fraction; (-1, -1, 0) = center crop. Failed images come
    back as zeros (count reported via print).
    """
    lib = get_lib()
    assert lib is not None
    n = len(paths)
    blob = b"".join(p.encode() + b"\0" for p in paths)
    offsets = np.zeros(n, np.int64)
    pos = 0
    for i, p in enumerate(paths):
        offsets[i] = pos
        pos += len(p.encode()) + 1
    if crops is None:
        crops = np.full((n, 3), -1.0, np.float32)
        crops[:, 2] = 0.0
    out = np.empty((n, reso, reso, 3), np.float32)
    failed = lib.vl_load_batch(blob, offsets, n, mid, reso,
                               np.ascontiguousarray(crops, np.float32),
                               num_threads, out)
    if failed:
        print(f"[native_loader] {failed}/{n} images failed to decode (zero-filled)")
    return out


def make_native_transform(final_reso: int, mid_reso: float = 1.125,
                          train: bool = True, hflip: bool = False):
    """Drop-in for ``imagenet.make_transform`` using the C++ pipeline."""
    mid = round(mid_reso * final_reso)

    def tf(path: str, rng: np.random.Generator) -> np.ndarray:
        if train:
            flip = bool(hflip and rng.random() < 0.5)
            return load_image(path, mid, final_reso,
                              (rng.random(), rng.random()), flip)
        return load_image(path, mid, final_reso)

    return tf


def make_native_batch_transform(final_reso: int, mid_reso: float = 1.125,
                                train: bool = True, hflip: bool = False,
                                num_threads: int = 16):
    """Whole-batch transform: one FFI call decodes/resizes/crops N images in
    C++ threads (GIL released) — used by ``imagenet.DataLoader``.

    ``rngs``: one per-sample ``np.random.Generator`` per path (see
    ``imagenet.sample_rng``) so crop/flip draws are deterministic per
    (seed, epoch, dataset-index) regardless of batching or threading."""
    mid = round(mid_reso * final_reso)

    def tf(paths: Sequence[str], rngs: Sequence[np.random.Generator]) -> np.ndarray:
        n = len(paths)
        if train:
            crops = np.empty((n, 3), np.float32)
            for i, rng in enumerate(rngs):
                crops[i, 0] = rng.random()
                crops[i, 1] = rng.random()
                crops[i, 2] = (rng.random() < 0.5) if hflip else 0.0
        else:
            crops = None
        return load_batch(paths, mid, final_reso, crops, num_threads)

    return tf
