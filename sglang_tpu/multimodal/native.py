"""ctypes wrapper over the native image-preprocessing kernels
(csrc/mm_preproc.cpp).

Ref: rust/sglang-mm — the reference runs image decode/resize/normalize
natively off the GIL; here resize replicates PIL's 8bpc fixed-point
separable resampling exactly (parity-tested byte-identical in
tests/test_mm_native.py) and normalize fuses u8 HWC -> f32 CHW with a
per-channel LUT. Falls back silently when g++ is unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

FILTER_BILINEAR = 0
FILTER_BICUBIC = 1

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "csrc", "mm_preproc.cpp",
    )
    so = src[:-4] + ".so"
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-pthread", "-o", so, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
    except Exception as e:  # pragma: no cover - toolchain-less host
        logger.warning("native mm preprocessing unavailable: %s", e)
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.mm_resize_u8.restype = ctypes.c_int
    lib.mm_resize_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.mm_normalize_chw.restype = ctypes.c_int
    lib.mm_normalize_chw.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, f32p,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def resize_u8(arr: np.ndarray, size_hw, filter=FILTER_BICUBIC) -> np.ndarray:
    """PIL-exact resize of a u8 HWC array. Returns None if native
    unavailable (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    ih, iw, c = arr.shape
    oh, ow = int(size_hw[0]), int(size_hw[1])
    out = np.empty((oh, ow, c), dtype=np.uint8)
    rc = lib.mm_resize_u8(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ih, iw, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), oh, ow,
        int(filter),
    )
    if rc != 0:
        return None
    return out


def normalize_chw(arr: np.ndarray, mean, std) -> np.ndarray:
    """u8 HWC -> f32 CHW, (px/255 - mean)/std. None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    mean = np.asarray(mean, dtype=np.float32)
    std = np.asarray(std, dtype=np.float32)
    if mean.size == 1:
        mean = np.repeat(mean, c)
    if std.size == 1:
        std = np.repeat(std, c)
    out = np.empty((c, h, w), dtype=np.float32)
    rc = lib.mm_normalize_chw(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        return None
    return out
