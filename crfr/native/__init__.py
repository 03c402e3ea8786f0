"""ctypes bindings for the native host-side preprocessing library
(native/crfr_native.cpp) — the rebuild's equivalent of the reference's
vendored cv2/PIL native code (SURVEY.md §2.2).

The library is built on demand with g++ the first time it's needed (and the
.so cached next to the sources). Every entry point has identical numerics to
the JAX ops (golden-tested in tests/test_native.py); ``available()`` lets
callers fall back to the Python path when no compiler exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO = os.path.join(_DIR, "libcrfr_native.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_err: str | None = None


def _build() -> None:
    subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)


def _load() -> ctypes.CDLL | None:
    global _lib, _err
    with _lock:
        if _lib is not None or _err is not None:
            return _lib
        try:
            if not os.path.exists(_SO) or (
                    os.path.getmtime(_SO)
                    < os.path.getmtime(os.path.join(_DIR, "crfr_native.cpp"))):
                _build()
            lib = ctypes.CDLL(_SO)
        except (OSError, subprocess.CalledProcessError) as e:
            _err = str(e)
            return None
        u8 = ctypes.POINTER(ctypes.c_uint8)
        f32 = ctypes.POINTER(ctypes.c_float)
        i = ctypes.c_int
        lib.crfr_resize_bicubic_f32.argtypes = [f32, i, i, i, f32, i, i, i]
        lib.crfr_resize_bicubic_u8.argtypes = [u8, i, i, i, u8, i, i, i]
        lib.crfr_warp_affine_f32.argtypes = [f32, i, i, i, f32, f32, i, i]
        lib.crfr_solve_similarity.argtypes = [f32, f32, i, f32]
        lib.crfr_align_crop_u8.argtypes = [u8, i, i, i, f32, f32, u8, i]
        lib.crfr_normalize_u8.argtypes = [u8, ctypes.c_longlong, f32]
        lib.crfr_native_abi_version.restype = i
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


_MODES = {"pil": 0, "cv2": 1}


def resize_bicubic(img: np.ndarray, out_hw: tuple[int, int],
                   mode: str = "pil") -> np.ndarray:
    """(H, W, C) float32 or uint8 → resized. uint8 input uses the exact PIL
    8bpc pipeline (uint8 intermediate); float uses float accumulation."""
    lib = _load()
    assert lib is not None, _err
    h, w, c = img.shape
    oh, ow = out_hw
    m = _MODES[mode]
    if img.dtype == np.uint8:
        out = np.empty((oh, ow, c), np.uint8)
        lib.crfr_resize_bicubic_u8(_ptr(np.ascontiguousarray(img), ctypes.c_uint8),
                                   h, w, c, _ptr(out, ctypes.c_uint8), oh, ow, m)
        return out
    img32 = np.ascontiguousarray(img, np.float32)
    out = np.empty((oh, ow, c), np.float32)
    lib.crfr_resize_bicubic_f32(_ptr(img32, ctypes.c_float), h, w, c,
                                _ptr(out, ctypes.c_float), oh, ow, m)
    return out


def warp_affine(img: np.ndarray, matrix: np.ndarray,
                out_hw: tuple[int, int]) -> np.ndarray:
    lib = _load()
    assert lib is not None, _err
    img32 = np.ascontiguousarray(img, np.float32)
    h, w, c = img32.shape
    oh, ow = out_hw
    m = np.ascontiguousarray(matrix, np.float32).reshape(6)
    out = np.empty((oh, ow, c), np.float32)
    lib.crfr_warp_affine_f32(_ptr(img32, ctypes.c_float), h, w, c,
                             _ptr(m, ctypes.c_float),
                             _ptr(out, ctypes.c_float), oh, ow)
    return out


def solve_similarity(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None, _err
    s = np.ascontiguousarray(src, np.float32)
    d = np.ascontiguousarray(dst, np.float32)
    out = np.empty(6, np.float32)
    lib.crfr_solve_similarity(_ptr(s, ctypes.c_float), _ptr(d, ctypes.c_float),
                              len(s), _ptr(out, ctypes.c_float))
    return out.reshape(2, 3)


def align_crop(img_u8: np.ndarray, landmarks: np.ndarray,
               template: np.ndarray | None = None,
               out_size: int = 112) -> np.ndarray:
    lib = _load()
    assert lib is not None, _err
    if template is None:
        from crfr.ops.similarity import REFERENCE_LANDMARKS_112
        template = REFERENCE_LANDMARKS_112
    img = np.ascontiguousarray(img_u8, np.uint8)
    h, w, c = img.shape
    lm = np.ascontiguousarray(landmarks, np.float32)
    tp = np.ascontiguousarray(template, np.float32)
    out = np.empty((out_size, out_size, c), np.uint8)
    lib.crfr_align_crop_u8(_ptr(img, ctypes.c_uint8), h, w, c,
                           _ptr(lm, ctypes.c_float), _ptr(tp, ctypes.c_float),
                           _ptr(out, ctypes.c_uint8), out_size)
    return out


def normalize(img_u8: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None, _err
    img = np.ascontiguousarray(img_u8, np.uint8)
    out = np.empty(img.shape, np.float32)
    lib.crfr_normalize_u8(_ptr(img, ctypes.c_uint8), img.size,
                          _ptr(out.reshape(-1), ctypes.c_float))
    return out
