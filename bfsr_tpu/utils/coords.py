"""Coordinate-grid helpers for implicit-SR query grids.

Conventions (reference: LINF-LP/utils.py:105-129 and the dataset wrappers):
coordinates live at grid centers in [-1, 1] along each axis (axis 0 = height),
and ``cell = (2/H, 2/W)`` is the query footprint.  These functions work for
both numpy and jax.numpy backends; under jit the shapes are static so the
jnp path traces to constants.
"""

import numpy as np
import jax.numpy as jnp


def _make_coord(xp, shape, ranges=None, flatten=True, dtype=None):
    dtype = dtype or xp.float32
    coord_seqs = []
    for i, n in enumerate(shape):
        v0, v1 = (-1.0, 1.0) if ranges is None else ranges[i]
        r = (v1 - v0) / (2 * n)
        # identical recurrence to the reference: v0 + r + 2r*arange(n)
        seq = v0 + r + (2 * r) * xp.arange(n, dtype=dtype)
        coord_seqs.append(seq)
    grids = xp.meshgrid(*coord_seqs, indexing="ij")
    ret = xp.stack(grids, axis=-1)
    if flatten:
        ret = ret.reshape(-1, ret.shape[-1])
    return ret


def make_coord(shape, ranges=None, flatten=True, dtype=None):
    """Grid-center coordinates in [-1,1]; jnp array (device)."""
    return _make_coord(jnp, tuple(shape), ranges, flatten, dtype)


def make_coord_np(shape, ranges=None, flatten=True, dtype=np.float32):
    """Host (numpy) twin of make_coord for the data pipeline."""
    return _make_coord(np, tuple(shape), ranges, flatten, dtype)


def make_cell(hr_shape, dtype=np.float32):
    """cell = (2/H, 2/W) for an HR target of shape (H, W).

    Reference: datasets/wrappers.py:144 (scalar per-image cell in the fast
    wrappers) and :71-73 (per-query cell in the LIIF-style wrapper).
    """
    return np.asarray([2.0 / hr_shape[0], 2.0 / hr_shape[1]], dtype=dtype)


def to_pixel_samples(img_chw):
    """Convert a (3,H,W) image to flat (coord, rgb) pairs.

    Reference: LINF-LP/utils.py:123-129.  Host-side (numpy).
    """
    img_chw = np.asarray(img_chw)
    h, w = img_chw.shape[-2:]
    coord = make_coord_np((h, w))
    rgb = img_chw.reshape(img_chw.shape[0], -1).T
    return coord, rgb
