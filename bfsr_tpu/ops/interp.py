"""Resampling ops with PyTorch numerical semantics, NHWC layout.

The reference pipeline leans on three torch ops whose exact coordinate
conventions decide metric parity:

* ``F.interpolate(mode='bilinear', align_corners=False)`` — residual
  construction in the dataset wrappers (wrappers.py:132-134) and shape
  adaptation at eval (LINF-LP/test.py:149,161).
* ``F.grid_sample(mode='nearest', align_corners=False)`` — 4-corner local
  ensemble feature lookup (linf.py:68,78).
* ``F.grid_sample(mode='bilinear', padding_mode='border',
  align_corners=False)`` — adding the upsampled LR image back (linf.py:193).

All functions here take NHWC arrays.  Grid/coord arguments use the LINF
convention: ``coord[..., 0]`` indexes the *height* axis, ``coord[..., 1]`` the
*width* axis, both in [-1, 1] (the reference stores coords this way and flips
to torch's (x, y) order at each grid_sample call site; we skip the flip).

Nearest rounding matches torch's ``nearbyint`` (round half to even) via
``jnp.rint``; the reference's 1e-6 eps-shifts keep queries off exact ties.
"""

import jax
import jax.numpy as jnp


def _unnormalize(coord, size):
    """align_corners=False: x_pix = ((x + 1) * size - 1) / 2."""
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample_nearest(x, coord):
    """Nearest grid sample, zero padding, align_corners=False.

    x: (B, H, W, C); coord: (B, Hg, Wg, 2) with (h, w) ordering in [-1, 1].
    Returns (B, Hg, Wg, C).
    """
    B, H, W, C = x.shape
    iy = jnp.rint(_unnormalize(coord[..., 0], H)).astype(jnp.int32)
    ix = jnp.rint(_unnormalize(coord[..., 1], W)).astype(jnp.int32)
    inb = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
    iy = jnp.clip(iy, 0, H - 1)
    ix = jnp.clip(ix, 0, W - 1)

    def gather_one(img, yy, xx):
        return img[yy, xx]  # (Hg, Wg, C)

    out = jax.vmap(gather_one)(x, iy, ix)
    return jnp.where(inb[..., None], out, 0.0)


def grid_sample_bilinear(x, coord, padding_mode="border"):
    """Bilinear grid sample, align_corners=False.

    padding_mode: 'border' (clamp; the reference's residual-add mode) or
    'zeros'.  x: (B,H,W,C); coord: (B,Hg,Wg,2) (h, w) order.
    """
    B, H, W, C = x.shape
    fy = _unnormalize(coord[..., 0], H)
    fx = _unnormalize(coord[..., 1], W)
    if padding_mode == "border":
        fy = jnp.clip(fy, 0.0, H - 1.0)
        fx = jnp.clip(fx, 0.0, W - 1.0)
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    wy = fy - y0
    wx = fx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def corner(iy, ix):
        inb = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
        iyc = jnp.clip(iy, 0, H - 1)
        ixc = jnp.clip(ix, 0, W - 1)
        v = jax.vmap(lambda img, yy, xx: img[yy, xx])(x, iyc, ixc)
        if padding_mode == "zeros":
            v = jnp.where(inb[..., None], v, 0.0)
        return v

    v00 = corner(y0i, x0i)
    v01 = corner(y0i, x0i + 1)
    v10 = corner(y0i + 1, x0i)
    v11 = corner(y0i + 1, x0i + 1)
    wy = wy[..., None]
    wx = wx[..., None]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def grid_sample_bilinear_separable(x, coord_y, coord_x, padding_mode="border",
                                   precision=None):
    """Bilinear grid sample for REGULAR grids as two dense matmuls.

    Numerically equivalent to ``grid_sample_bilinear`` when
    coord[b,i,j,0] == coord_y[b,i] and coord[b,i,j,1] == coord_x[b,j]
    (every make_coord-derived grid).  Gathers run far below streaming
    bandwidth on this chip; the 2-tap axis interpolation expressed as
    (Hg,H) @ x @ (W,Wg) rides the MXU instead.

    x: (B,H,W,C); coord_y: (B,Hg); coord_x: (B,Wg).  B must be 1 (the
    eval paths' batch size) or the grids identical across batch.
    """
    B, H, W, C = x.shape
    prec = precision or jax.lax.Precision.HIGHEST

    def axis_matrix(coord, n):
        f = _unnormalize(coord[0], n)
        if padding_mode == "border":
            f = jnp.clip(f, 0.0, n - 1.0)
        i0 = jnp.floor(f)
        w1 = f - i0
        i0 = i0.astype(jnp.int32)
        i1 = i0 + 1
        if padding_mode == "zeros":
            v0 = ((i0 >= 0) & (i0 < n)).astype(jnp.float32)
            v1 = ((i1 >= 0) & (i1 < n)).astype(jnp.float32)
        else:
            v0 = v1 = 1.0
        i0c = jnp.clip(i0, 0, n - 1)
        i1c = jnp.clip(i1, 0, n - 1)
        m = (jax.nn.one_hot(i0c, n, dtype=jnp.float32) * ((1.0 - w1) * v0)[:, None]
             + jax.nn.one_hot(i1c, n, dtype=jnp.float32) * (w1 * v1)[:, None])
        return m  # (out, n)

    my = axis_matrix(coord_y, H)  # (Hg, H)
    mx = axis_matrix(coord_x, W)  # (Wg, W)
    rows = jnp.einsum("gh,bhwc->bgwc", my, x, precision=prec)
    return jnp.einsum("kw,bgwc->bgkc", mx, rows, precision=prec)


def _resize_axis_weights(in_size, out_size, align_corners):
    """Per-output (i0, i1, w1) for 1-D linear resize, torch semantics."""
    out_idx = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners and out_size > 1:
        src = out_idx * ((in_size - 1) / (out_size - 1))
    else:
        src = (out_idx + 0.5) * (in_size / out_size) - 0.5
    src = jnp.clip(src, 0.0, in_size - 1.0)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w1 = src - i0.astype(jnp.float32)
    return i0, i1, w1


def _resize_axis_matrix(in_size, out_size, align_corners):
    """Dense (out, in) interpolation matrix (<=2 taps per row)."""
    i0, i1, w1 = _resize_axis_weights(in_size, out_size, align_corners)
    m = jnp.zeros((out_size, in_size), jnp.float32)
    rows = jnp.arange(out_size)
    m = m.at[rows, i0].add(1.0 - w1)
    m = m.at[rows, i1].add(w1)
    return m


def _resize_axis_banded(in_size, out_size, align_corners, chunk=256):
    """Banded-block form of :func:`_resize_axis_matrix`.

    The dense matrix has only 2 nonzeros per row but the matmul pays for
    all ``in_size`` columns — O(out*in) work per axis, which blows up at
    DIV2K extents (a 1020->2040 row resize over 678x64 data is ~400
    GFLOPs dense vs ~12 banded).  Because the source positions are
    monotone in the output index, any ``chunk`` consecutive output rows
    read a contiguous input span of ~chunk*in/out+2 rows: the matrix is
    block-banded with STATIC per-block offsets.  Same weights, same f32
    accumulation (zero columns add exactly) — bitwise-identical output.

    Returns (starts (G,), blocks (G, chunk, S)); block g applies to
    x[starts[g] : starts[g]+S]; rows past out_size are zero.
    """
    import numpy as np

    out_idx = np.arange(out_size, dtype=np.float32)
    if align_corners and out_size > 1:
        src = out_idx * np.float32((in_size - 1) / (out_size - 1))
    else:
        src = (out_idx + np.float32(0.5)) * np.float32(in_size / out_size) \
            - np.float32(0.5)
    src = np.clip(src, 0.0, np.float32(in_size - 1.0))
    i0 = np.floor(src).astype(np.int32)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0.astype(np.float32)).astype(np.float32)

    G = -(-out_size // chunk)
    starts = np.zeros((G,), np.int32)
    S = 0
    for g in range(G):
        lo, hi = g * chunk, min((g + 1) * chunk, out_size)
        s = int(i0[lo])
        starts[g] = s
        S = max(S, int(i1[hi - 1]) - s + 1)
    starts = np.minimum(starts, max(0, in_size - S))
    blocks = np.zeros((G, chunk, S), np.float32)
    for g in range(G):
        lo, hi = g * chunk, min((g + 1) * chunk, out_size)
        r = np.arange(lo, hi)
        blocks[g, r - lo, i0[r] - starts[g]] += 1.0 - w1[r]
        blocks[g, r - lo, i1[r] - starts[g]] += w1[r]
    return starts, jnp.asarray(blocks)


def _resize_axis_apply_banded(x, in_size, out_size, align_corners, axis):
    """Apply a 1-D linear resize along ``axis`` via the banded-block
    matmul.  x: any rank; returns x with ``axis`` resized to out_size."""
    starts, blocks = _resize_axis_banded(in_size, out_size, align_corners)
    G, chunk, S = blocks.shape
    sl = jnp.stack([jax.lax.slice_in_dim(x, int(s), int(s) + S, axis=axis)
                    for s in starts])  # (G, ..., S, ...)
    # move the sliced axis (now axis+1) to the end, contract, put back
    sl = jnp.moveaxis(sl, axis + 1, -1)  # (G, ..., S)
    out = jnp.einsum("grs,g...s->g...r", blocks, sl,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.moveaxis(out, -1, 1)      # (G, chunk, ...)
    out = out.reshape((G * chunk,) + out.shape[2:])[:out_size]
    # materialize: letting XLA fuse the chunked einsum into a downstream
    # DEFAULT-precision conv was measured catastrophically slow (the
    # UNet's up[1] at DIV2K extents: 27 ms as two programs, 204 ms fused)
    return jax.lax.optimization_barrier(jnp.moveaxis(out, 0, axis))


def resize_bilinear(x, out_hw, align_corners=False, method=None):
    """F.interpolate(mode='bilinear') equivalent. x: (B,H,W,C) -> (B,h,w,C).

    Separable with the exact per-axis weights torch uses; all methods
    produce identical values.  The default follows the global precision
    mode, per in-program A/B at DIV2K and 512^2 extents:

    * HIGH/HIGHEST (metric mode): per-axis MXU matmuls (dense or
      banded-block) — the round-2 winner (full DIV2K pipeline 424 ms vs
      459 with gathers).
    * DEFAULT (serving mode): per-axis gather indexing — XLA compiles a
      resize-einsum-next-to-bf16-convs program catastrophically (the
      UNet's up[1] at 1020x678: 205 ms matmul vs 21 ms gather; an
      optimization_barrier does NOT fix it); gathers took the serving
      DIV2K pipeline 493 -> 323 ms.

    This is unlike the 2-D grid_sample case, where the separable-matmul
    form wins big in every mode (see grid_sample_bilinear_separable).
    """
    B, H, W, C = x.shape
    oh, ow = out_hw
    if method is None:
        from bfsr_tpu.ops import nn as _fnn

        serving = _fnn.default_precision() == jax.lax.Precision.DEFAULT
        method = ("matmul" if jax.default_backend() == "tpu" and not serving
                  else "gather")
    if method == "matmul":
        hi = jax.lax.Precision.HIGHEST

        def one_axis(t, n_in, n_out, axis):
            # banded when the contiguous input span per 256-output block is
            # a small fraction of the axis (dense pays O(in*out) per axis,
            # ~30x waste at DIV2K extents); identical values either way
            if n_out >= 512 and n_in > 3 * (256 * n_in / n_out + 2):
                return _resize_axis_apply_banded(t, n_in, n_out,
                                                 align_corners, axis)
            m = _resize_axis_matrix(n_in, n_out, align_corners)
            t = jnp.moveaxis(t, axis, -1)
            t = jnp.einsum("Os,...s->...O", m, t,
                           preferred_element_type=jnp.float32, precision=hi)
            return jnp.moveaxis(t, -1, axis)

        xh = one_axis(x, H, oh, 1)
        return one_axis(xh, W, ow, 2).astype(x.dtype)
    y0, y1, wy = _resize_axis_weights(H, oh, align_corners)
    x0, x1, wx = _resize_axis_weights(W, ow, align_corners)
    # height
    top = x[:, y0, :, :]
    bot = x[:, y1, :, :]
    xh = top + (bot - top) * wy[None, :, None, None]
    # width
    left = xh[:, :, x0, :]
    right = xh[:, :, x1, :]
    return left + (right - left) * wx[None, None, :, None]


def resize_nearest(x, out_hw):
    """F.interpolate(mode='nearest') equivalent: src = floor(i * in/out)."""
    B, H, W, C = x.shape
    oh, ow = out_hw
    iy = jnp.floor(jnp.arange(oh, dtype=jnp.float32) * (H / oh)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(ow, dtype=jnp.float32) * (W / ow)).astype(jnp.int32)
    iy = jnp.clip(iy, 0, H - 1)
    ix = jnp.clip(ix, 0, W - 1)
    return x[:, iy, :, :][:, :, ix, :]
