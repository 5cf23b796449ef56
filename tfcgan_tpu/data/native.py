"""ctypes binding for the native (C++) data-pipeline kernels.

``native/fastpair.cpp`` fuses the reference's host-side per-sample PIL work
(pair split + PIL-exact bicubic resize + normalize + temperature LUT,
``datasets_temp.py:49-119``) into one threaded C++ pass. Falls back to the
PIL path transparently when the shared library hasn't been built
(``native/build.sh``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "libfastpair.so",
)


def _load(build_if_missing: bool = True):
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        script = os.path.join(os.path.dirname(_LIB_PATH), "build.sh")
        if os.path.exists(script):
            try:
                subprocess.run([script], check=True, capture_output=True)
            except (subprocess.CalledProcessError, OSError):
                return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.process_pair.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                 f32p, f32p, f32p]
    lib.process_pair_batch.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, f32p, ctypes.c_int,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def process_pair(img_u8: np.ndarray, out_size: int = 256):
    """(H, W, 3) uint8 A|B image -> (A_norm, B_norm, T_B) float32 arrays."""
    lib = _load()
    assert lib is not None, "native library unavailable (run native/build.sh)"
    img = np.ascontiguousarray(img_u8, dtype=np.uint8)
    h, w, _ = img.shape
    a = np.empty((out_size, out_size, 3), np.float32)
    b = np.empty((out_size, out_size, 3), np.float32)
    t = np.empty((out_size, out_size), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.process_pair(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, out_size,
        a.ctypes.data_as(f32p), b.ctypes.data_as(f32p), t.ctypes.data_as(f32p),
    )
    return a, b, t


def process_pair_batch(imgs_u8: np.ndarray, out_size: int = 256, threads: int = 8):
    """(N, H, W, 3) uint8 stack -> batched (A, B, T_B)."""
    lib = _load()
    assert lib is not None, "native library unavailable (run native/build.sh)"
    imgs = np.ascontiguousarray(imgs_u8, dtype=np.uint8)
    n, h, w, _ = imgs.shape
    a = np.empty((n, out_size, out_size, 3), np.float32)
    b = np.empty((n, out_size, out_size, 3), np.float32)
    t = np.empty((n, out_size, out_size), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.process_pair_batch(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w, out_size,
        a.ctypes.data_as(f32p), b.ctypes.data_as(f32p), t.ctypes.data_as(f32p),
        threads,
    )
    return a, b, t
