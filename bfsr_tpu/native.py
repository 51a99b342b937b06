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


def _stale():
    """True when the .so is missing or older than its sources (the lib is
    built with -march=native, so a stale or foreign-host binary must be
    rebuilt rather than trusted)."""
    if not os.path.exists(_SO_PATH):
        return True
    so_mtime = os.path.getmtime(_SO_PATH)
    for src in ("bfsr_native.cc", "Makefile"):
        p = os.path.join(_NATIVE_DIR, src)
        if os.path.exists(p) and os.path.getmtime(p) > so_mtime:
            return True
    return False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if _stale():
        try:
            subprocess.run(["make", "-B", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            if not os.path.exists(_SO_PATH):
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


def _require():
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "libbfsr_native.so unavailable (no prebuilt .so and the build "
            "failed — is g++/make installed?); guard calls with "
            "native.available() to use the numpy fallbacks")
    return lib


def bilinear_resize(img_hwc, out_hw, align_corners=False):
    """Native torch-semantics bilinear resize; f32 HWC."""
    lib = _require()
    src = np.ascontiguousarray(img_hwc, dtype=np.float32)
    h, w, c = src.shape
    oh, ow = out_hw
    dst = np.empty((oh, ow, c), np.float32)
    lib.bilinear_resize_f32(_fptr(src), h, w, c, _fptr(dst), oh, ow,
                            1 if align_corners else 0)
    return dst


def updownup_residual(lr_norm_hwc, out_hw):
    """Fused lr_up + up-down-up residual (wrappers.py:132-134)."""
    lib = _require()
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
    lib = _require()
    src = np.ascontiguousarray(img_hwc, dtype=np.float32)
    h, w, c = src.shape
    oh, ow = out_hw
    dst = np.empty((oh, ow, c), np.float32)
    lib.bicubic_resize_f32(_fptr(src), h, w, c, _fptr(dst), oh, ow)
    return dst
