"""MATLAB-compatible imresize (antialiased bicubic/bilinear).

Behavioral twin of MATLAB's ``imresize`` as used throughout the reference for
dataset preparation and the LR-consistency metric (reference:
LINF-LP/imresize.py, byte-identical copy at SRFlow-LP/code/imresize.py — both
are vendored from the public matlab_imresize project).  This is an
independent implementation of the same published algorithm:

* source positions ``u = (x+1)/scale + 0.5*(1 - 1/scale)`` for 1-based x
* kernel widened by 1/scale and scaled by ``scale`` when downsampling
  (antialiasing)
* symmetric (mirror-without-repeat) boundary handling
* per-row weight normalization
* the two axes processed in increasing-scale order

Host (numpy, float64) is the canonical path — it feeds metrics, where
bit-accuracy against the reference decides PSNR parity.  A jnp twin with
static shapes serves on-device pipelines.
"""

import numpy as np
from math import ceil

import jax.numpy as jnp


def _cubic(x):
    x = np.asarray(x, dtype=np.float64)
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    return (1.5 * ax3 - 2.5 * ax2 + 1.0) * (ax <= 1) + (
        -0.5 * ax3 + 2.5 * ax2 - 4.0 * ax + 2.0
    ) * ((ax > 1) & (ax <= 2))


def _triangle(x):
    x = np.asarray(x, dtype=np.float64)
    return (x + 1.0) * ((x >= -1) & (x < 0)) + (1.0 - x) * ((x >= 0) & (x <= 1))


_KERNELS = {"bicubic": (_cubic, 4.0), "bilinear": (_triangle, 2.0)}


def _contributions(in_length, out_length, scale, kernel, k_width):
    if scale < 1:
        h = lambda x: scale * kernel(scale * x)
        kernel_width = k_width / scale
    else:
        h = kernel
        kernel_width = k_width
    x = np.arange(1, out_length + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1.0 - 1.0 / scale)
    left = np.floor(u - kernel_width / 2.0)
    p = int(ceil(kernel_width)) + 2
    ind = left[:, None] + np.arange(p) - 1  # 0-based candidate indices
    indices = ind.astype(np.int64)
    weights = h(u[:, None] - indices - 1)
    weights = weights / weights.sum(axis=1, keepdims=True)
    # symmetric boundary: mirror indices into range without repeating edges
    aux = np.concatenate((np.arange(in_length), np.arange(in_length - 1, -1, -1)))
    indices = aux[np.mod(indices, aux.size)]
    # drop columns that are zero for every output position
    keep = np.any(weights != 0, axis=0)
    return weights[:, keep], indices[:, keep]


def _resize_along_axis(img, weights, indices, axis):
    # img: (..., L, ...) float64; gather then contract the tap axis.
    moved = np.moveaxis(img, axis, 0)  # (L, ...)
    gathered = moved[indices]  # (out, taps, ...)
    w = weights.reshape(weights.shape + (1,) * (gathered.ndim - 2))
    out = (gathered * w).sum(axis=1)
    return np.moveaxis(out, 0, axis)


def imresize(img, scale=None, method="bicubic", output_shape=None):
    """Resize HxW or HxWxC numpy image the MATLAB way.

    Either ``scale`` (scalar) or ``output_shape`` (h, w) must be given.
    uint8 inputs round back to uint8 like MATLAB; float inputs stay float64.
    """
    if method not in _KERNELS:
        raise ValueError(f"unknown method {method!r}")
    kernel, k_width = _KERNELS[method]

    if scale is not None:
        scale = float(scale)
        scales = [scale, scale]
        out_size = [int(ceil(scale * s)) for s in img.shape[:2]]
    elif output_shape is not None:
        out_size = list(output_shape[:2])
        scales = [out_size[0] / img.shape[0], out_size[1] / img.shape[1]]
    else:
        raise ValueError("either scale or output_shape is required")

    src_dtype = img.dtype
    work = np.asarray(img, dtype=np.float64)
    squeeze = False
    if work.ndim == 2:
        work = work[:, :, None]
        squeeze = True

    order = np.argsort(np.array(scales))  # smaller scale (more shrink) first
    ws, inds = {}, {}
    for k in range(2):
        ws[k], inds[k] = _contributions(img.shape[k], out_size[k], scales[k], kernel, k_width)
    for k in range(2):
        dim = int(order[k])
        work = _resize_along_axis(work, ws[dim], inds[dim], dim)
        if src_dtype == np.uint8:
            # MATLAB (and the vendored reference) re-quantize after each axis pass
            work = np.around(np.clip(work, 0, 255)).astype(np.float64)

    if squeeze:
        work = work[:, :, 0]
    if src_dtype == np.uint8:
        return work.astype(np.uint8)
    return work


def imresize_weights(in_shape, out_shape, method="bicubic"):
    """Precompute (weights, indices) per axis for the jnp path (static)."""
    kernel, k_width = _KERNELS[method]
    scales = [out_shape[0] / in_shape[0], out_shape[1] / in_shape[1]]
    per_axis = []
    for k in range(2):
        w, ind = _contributions(in_shape[k], out_shape[k], scales[k], kernel, k_width)
        per_axis.append((w.astype(np.float32), ind.astype(np.int32)))
    order = [int(i) for i in np.argsort(np.array(scales))]
    return per_axis, order


def imresize_jnp(img, per_axis, order):
    """Device imresize with precomputed taps.  img: (H, W, C) jnp array.

    Runs in f32; for metric-grade output use the numpy ``imresize``.
    """
    out = img
    for k in order:
        w, ind = per_axis[k]
        moved = jnp.moveaxis(out, k, 0)
        gathered = moved[jnp.asarray(ind)]
        wdev = jnp.asarray(w).reshape(w.shape + (1,) * (gathered.ndim - 2))
        out = jnp.moveaxis((gathered * wdev).sum(axis=1), 0, k)
    return out
