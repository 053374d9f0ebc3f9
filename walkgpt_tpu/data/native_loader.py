"""ctypes binding for the native preprocessing library (walkgpt_tpu/_native/preprocess.cpp;
the top-level `native` path symlinks there).

Builds libwgpreprocess.so on first use (g++ is in the image) and falls back to
the PIL path in transforms.py when unavailable. The native resampler mirrors
Pillow's fixed-point BILINEAR pipeline, so both paths are byte-identical.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _native_dir() -> str:
    env = os.environ.get("WALKGPT_NATIVE_DIR")
    if env:
        return env
    # package-internal sources (shipped in the wheel as package data; the
    # source checkout's top-level `native` is a symlink to this directory)
    return os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "_native")


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    nd = _native_dir()
    so = os.path.join(nd, "libwgpreprocess.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", nd], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.wg_resize_bilinear_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                          ctypes.c_int, u8p, ctypes.c_int,
                                          ctypes.c_int]
    lib.wg_normalize_pad_f32.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                         f32p, f32p, f32p, ctypes.c_int]
    lib.wg_preprocess_stream.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_int,
                                         f32p, f32p, f32p, i32p, i32p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return load_library() is not None


def resize_bilinear(image: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    """uint8 HWC resize, Pillow-BILINEAR-exact. Falls back to PIL."""
    lib = load_library()
    if lib is None:
        from . import transforms as T
        return T._pil_resize(image, size_hw)
    image = np.ascontiguousarray(image, np.uint8)
    h, w, c = image.shape
    out = np.empty((size_hw[0], size_hw[1], c), np.uint8)
    lib.wg_resize_bilinear_u8(image, h, w, c, out, size_hw[0], size_hw[1])
    return out


def preprocess_stream(image: np.ndarray, target_long: int, pad_size: int,
                      mean: np.ndarray, std: np.ndarray
                      ) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Fused longest-side resize + normalize + pad. Returns (canvas, (rh, rw))."""
    lib = load_library()
    if lib is None:
        from . import transforms as T
        resized = T.resize_longest_side(image, target_long)
        return (T.normalize_pad(resized, mean, std, pad_size),
                resized.shape[:2])
    image = np.ascontiguousarray(image, np.uint8)
    h, w, _ = image.shape
    out = np.empty((pad_size, pad_size, 3), np.float32)
    rh = ctypes.c_int()
    rw = ctypes.c_int()
    lib.wg_preprocess_stream(image, h, w, target_long, pad_size,
                             np.ascontiguousarray(mean, np.float32),
                             np.ascontiguousarray(std, np.float32),
                             out, ctypes.byref(rh), ctypes.byref(rw))
    return out, (rh.value, rw.value)
