"""ctypes bindings for the native image pipeline (native/image_ops.cpp).

Auto-builds the shared library with `make -C native` on first use if g++ is
available; everything degrades to the PIL path in data/loaders.py when the
library is missing. Parity: PIL-convention antialiased bicubic (a=-0.5),
verified against PIL within 1/255 per pixel in tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_NAME = "librobustvlm_image.so"
_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_lib = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    path = _NATIVE_DIR / _LIB_NAME
    if not path.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        _load_failed = True
        return None
    u8 = ctypes.POINTER(ctypes.c_uint8)
    f32 = ctypes.POINTER(ctypes.c_float)
    lib.resize_bicubic_u8_chw.argtypes = [
        u8, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.u8_hwc_to_f32_chw.argtypes = [
        u8, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32, ctypes.c_int,
    ]
    lib.resize_center_crop_u8_chw.argtypes = [
        u8, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32, ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _as_u8_hwc(img: np.ndarray) -> np.ndarray:
    arr = np.ascontiguousarray(img)
    assert arr.dtype == np.uint8 and arr.ndim == 3, "need uint8 HWC"
    return arr


def resize_bicubic(img: np.ndarray, dh: int, dw: int,
                   n_threads: int = 4) -> np.ndarray:
    """uint8 HWC -> float32 CHW [0,1], PIL-style antialiased bicubic."""
    lib = _load()
    assert lib is not None
    arr = _as_u8_hwc(img)
    h, w, c = arr.shape
    out = np.empty((c, dh, dw), np.float32)
    lib.resize_bicubic_u8_chw(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw, n_threads,
    )
    return out


def resize_center_crop(img: np.ndarray, size: int,
                       n_threads: int = 4) -> np.ndarray:
    """Shorter-side resize + center crop -> float32 CHW [0,1] (the CLIP
    preprocessing, reference adversarial_training_clip.py:111-116)."""
    lib = _load()
    assert lib is not None
    arr = _as_u8_hwc(img)
    h, w, c = arr.shape
    out = np.empty((c, size, size), np.float32)
    lib.resize_center_crop_u8_chw(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), size, n_threads,
    )
    return out


def to_chw_f32(img: np.ndarray, n_threads: int = 4) -> np.ndarray:
    lib = _load()
    assert lib is not None
    arr = _as_u8_hwc(img)
    h, w, c = arr.shape
    out = np.empty((c, h, w), np.float32)
    lib.u8_hwc_to_f32_chw(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
    )
    return out


def native_image_transform(size: int = 224, n_threads: int = 4):
    """Drop-in for data.loaders.default_image_transform backed by the C++
    pipeline (falls back to None when the library is unavailable)."""
    if not available():
        return None

    def tf(img) -> np.ndarray:
        if img.mode != "RGB":
            img = img.convert("RGB")
        return resize_center_crop(np.asarray(img), size, n_threads)

    return tf
