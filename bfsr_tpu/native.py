"""ctypes bindings for the native host-pipeline library (native/).

Auto-builds ``libbfsr_native.so`` on first use when a toolchain is present;
everything degrades gracefully to the numpy implementations when the
library is unavailable (``available()`` -> False).
"""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libbfsr_native.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.bilinear_resize_f32.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int, f32p, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_int]
    lib.updownup_residual_f32.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                          ctypes.c_int, ctypes.c_int,
                                          ctypes.c_int, f32p, f32p]
    lib.bicubic_resize_f32.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, f32p, ctypes.c_int,
                                       ctypes.c_int]
    lib.bfsr_native_version.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available():
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def bilinear_resize(img_hwc, out_hw, align_corners=False):
    """Native torch-semantics bilinear resize; f32 HWC."""
    lib = _load()
    src = np.ascontiguousarray(img_hwc, dtype=np.float32)
    h, w, c = src.shape
    oh, ow = out_hw
    dst = np.empty((oh, ow, c), np.float32)
    lib.bilinear_resize_f32(_fptr(src), h, w, c, _fptr(dst), oh, ow,
                            1 if align_corners else 0)
    return dst


def updownup_residual(lr_norm_hwc, out_hw):
    """Fused lr_up + up-down-up residual (wrappers.py:132-134)."""
    lib = _load()
    src = np.ascontiguousarray(lr_norm_hwc, dtype=np.float32)
    h, w, c = src.shape
    H, W = out_hw
    lr_up = np.empty((H, W, c), np.float32)
    residual = np.empty((H, W, c), np.float32)
    lib.updownup_residual_f32(_fptr(src), h, w, c, H, W, _fptr(lr_up),
                              _fptr(residual))
    return lr_up, residual


def bicubic_resize(img_hwc, out_hw):
    """Native MATLAB-imresize bicubic (f32; metric-grade path stays f64
    numpy)."""
    lib = _load()
    src = np.ascontiguousarray(img_hwc, dtype=np.float32)
    h, w, c = src.shape
    oh, ow = out_hw
    dst = np.empty((oh, ow, c), np.float32)
    lib.bicubic_resize_f32(_fptr(src), h, w, c, _fptr(dst), oh, ow)
    return dst
