"""ctypes binding for the native host data path (native/dass_native.cpp).

Builds the shared library on first use (g++ -O3 -fopenmp), caches it next
to the source, and exposes PIL-bit-identical resize + fused normalize.
``transforms.imresize`` routes through this automatically when available
(kill switch: DASS_NATIVE=0); tests assert byte-equality against PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "dass_native.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libdass_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("DASS_NATIVE", "1") == "0":
            return None
        if not os.path.exists(_LIB_PATH) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.resize_bilinear_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                           ctypes.c_int, u8p, ctypes.c_int,
                                           ctypes.c_int]
        lib.resize_nearest_u8.argtypes = list(lib.resize_bilinear_u8.argtypes)
        lib.resize_bilinear_u8_window.argtypes = (
            list(lib.resize_bilinear_u8.argtypes) + [ctypes.c_int] * 4)
        lib.resize_nearest_u8_window.argtypes = list(
            lib.resize_bilinear_u8_window.argtypes)
        lib.normalize_f32.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                      f32p, f32p, f32p]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def resize_u8(arr: np.ndarray, oh: int, ow: int,
              interp: str = "bilinear") -> Optional[np.ndarray]:
    """PIL-identical resize; returns None when the native path is off."""
    lib = get_lib()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr, np.uint8)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[..., None]
    h, w, c = arr.shape
    out = np.empty((oh, ow, c), np.uint8)
    fn = lib.resize_bilinear_u8 if interp == "bilinear" else lib.resize_nearest_u8
    fn(arr, h, w, c, out, oh, ow)
    return out[..., 0] if squeeze else out


def resize_u8_window(arr: np.ndarray, oh: int, ow: int, x0: int, y0: int,
                     ww: int, wh: int,
                     interp: str = "bilinear") -> Optional[np.ndarray]:
    """The [y0:y0+wh, x0:x0+ww] window of a PIL-identical (oh, ow) resize,
    computed without materializing the out-of-window pixels (bit-equal to
    ``resize_u8(...)[y0:y0+wh, x0:x0+ww]``). This is the crop-fused fast
    path for FixScaleCrop-style resize-then-center-crop geometry."""
    # validate BEFORE the lib-availability early return so an invalid
    # window raises identically on native and lib-less hosts (instead of
    # silently degrading to the caller's fallback path on the latter)
    if not (0 <= x0 and 0 <= y0 and x0 + ww <= ow and y0 + wh <= oh
            and ww > 0 and wh > 0):
        raise ValueError(f"window ({x0},{y0},{ww},{wh}) outside ({oh},{ow})")
    lib = get_lib()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr, np.uint8)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[..., None]
    h, w, c = arr.shape
    out = np.empty((wh, ww, c), np.uint8)
    fn = (lib.resize_bilinear_u8_window if interp == "bilinear"
          else lib.resize_nearest_u8_window)
    fn(arr, h, w, c, out, oh, ow, x0, y0, ww, wh)
    return out[..., 0] if squeeze else out


def normalize(arr: np.ndarray, mean, std) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr, np.uint8)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[..., None]
    c = arr.shape[-1]
    mean = np.ascontiguousarray(np.broadcast_to(
        np.asarray(mean, np.float32), (c,)))
    std = np.ascontiguousarray(np.broadcast_to(
        np.asarray(std, np.float32), (c,)))
    out = np.empty(arr.shape, np.float32)
    lib.normalize_f32(arr, arr.shape[0] * arr.shape[1], c, mean, std, out)
    return out[..., 0] if squeeze else out
