"""Native (C++) host-side preprocessing, bound via ctypes.

Build-on-first-use with g++ (cached .so next to the source). Falls back
cleanly when no compiler is available — callers must check available()."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "preprocess.cpp")
_SO = os.path.join(_DIR, "libpmixpre.so")
_lib = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64 = ctypes.c_int64
    lib.resize_bilinear_normalize_u8.argtypes = [
        u8p, i64, i64, i64, f32p, i64, i64, f32p, f32p, ctypes.c_float]
    lib.center_crop_f32.argtypes = [f32p, i64, i64, i64, f32p, i64, i64]
    lib.extract_patches_f32.argtypes = [f32p, i64, i64, i64, f32p, i64, i64, i64]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def resize_normalize(image: np.ndarray, size: Tuple[int, int],
                     mean: Sequence[float], std: Sequence[float],
                     scale: float = 1 / 255.0) -> np.ndarray:
    """uint8 (H, W, C) -> float32 (h, w, C) resized + normalized, one pass."""
    lib = _load()
    assert lib is not None, "native preprocessing unavailable"
    src = np.ascontiguousarray(image, np.uint8)
    h, w, c = src.shape
    dh, dw = size
    dst = np.empty((dh, dw, c), np.float32)
    mean_a = np.ascontiguousarray(mean, np.float32)
    std_a = np.ascontiguousarray(std, np.float32)
    lib.resize_bilinear_normalize_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw,
        mean_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(scale))
    return dst


def center_crop(image: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    lib = _load()
    assert lib is not None
    src = np.ascontiguousarray(image, np.float32)
    h, w, c = src.shape
    ch, cw = size
    dst = np.empty((ch, cw, c), np.float32)
    lib.center_crop_f32(src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, c,
                        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ch, cw)
    return dst


def extract_patches(image: np.ndarray, patch_size: int, merge_size: int = 2,
                    temporal_patch_size: int = 2) -> np.ndarray:
    """float32 (H, W, C) -> (n_patches, C*tp*ps*ps) in merge-grouped order."""
    lib = _load()
    assert lib is not None
    src = np.ascontiguousarray(image, np.float32)
    h, w, c = src.shape
    gh, gw = h // patch_size, w // patch_size
    dst = np.empty((gh * gw, c * temporal_patch_size * patch_size * patch_size), np.float32)
    lib.extract_patches_f32(src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, c,
                            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                            patch_size, merge_size, temporal_patch_size)
    return dst
