"""Pallas 3x3 convolution (stride 1, SAME) with fused affine + activation.

XLA's conv on this chip reaches ~5 TFLOP/s on the UNet's 64-512 channel
3x3 layers (vs ~49 attainable at f32-HIGH).  This kernel reformulates the
conv as three K=3*Cin matmuls over row tiles:

* the input is pre-padded (H+2, W+2) and passed three times with row
  offsets 0/1/2 — BlockSpec row-blocking gives each tile its halo rows
  without manual DMA,
* in-kernel, the three row-shifted blocks are concatenated channel-wise and
  the three column shifts each contract (T_R*W, 3Cin) @ (3Cin, Cout) on the
  MXU,
* per-channel scale/bias (folded BatchNorm) and LeakyReLU/ReLU fuse into
  the output write.

B=1, NHWC, f32.  Used by the inference path of the prior UNet (training
keeps the XLA conv for autodiff).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(W, cin, cout, act, slope, x0_ref, x1_ref, x2_ref, w_ref,
            sb_ref, out_ref):
    T = x0_ref.shape[0]
    xcat = jnp.concatenate([x0_ref[:, :, :], x1_ref[:, :, :], x2_ref[:, :, :]],
                           axis=-1)  # (T, W+2, 3Cin)
    acc = None
    for dx in range(3):
        v = xcat[:, dx:dx + W, :].reshape(T * W, 3 * cin)
        t = jnp.dot(v, w_ref[dx], preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    y = acc * sb_ref[0] + sb_ref[1]
    if act == "lrelu":
        y = jnp.where(y >= 0, y, y * slope)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    out_ref[:, :, :] = y.reshape(T, W, cout)


def conv3x3_fused(x, w, scale=None, bias=None, act=None, slope=0.2,
                  interpret=False):
    """x: (1, H, W, Cin); w: (3, 3, Cin, Cout).  scale/bias: (Cout,) fused
    per-channel affine applied after the conv (fold BN + conv bias here).
    act: None | 'relu' | 'lrelu'.  Returns (1, H, W, Cout) f32."""
    interpret = interpret or jax.default_backend() != "tpu"
    _, H, W, cin = x.shape
    cout = w.shape[-1]
    if scale is None:
        scale = jnp.ones((cout,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)
    sb = jnp.stack([scale, bias]).astype(jnp.float32)  # (2, Cout)

    # row-tile size bounded by VMEM: 3 double-buffered input blocks, the
    # channel-concat temp, ~2 live matmul operand copies, and the
    # double-buffered output block
    per_row = (W + 2) * cin * 4 * (3 * 2 + 3) + W * cout * 4 * 2 + W * 3 * cin * 4 * 2
    T = max(1, min(64, (9 * 1024 * 1024) // max(per_row, 1)))
    while H % T:
        T -= 1
    grid = (H // T,)

    xp = jnp.pad(x[0].astype(jnp.float32), ((1, 1), (1, 1), (0, 0)))
    x0 = xp[:-2]   # rows r-1
    x1 = xp[1:-1]  # rows r
    x2 = xp[2:]    # rows r+1
    wr = w.astype(jnp.float32).reshape(3, 3, cin, cout)
    # (dx, 3Cin, Cout): channel concat order matches xcat = [dy=0,1,2]
    wcat = jnp.stack([
        jnp.concatenate([wr[0, dx], wr[1, dx], wr[2, dx]], axis=0)
        for dx in range(3)
    ])

    out = pl.pallas_call(
        functools.partial(_kernel, W, cin, cout, act, slope),
        out_shape=jax.ShapeDtypeStruct((H, W, cout), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, W + 2, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, W + 2, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, W + 2, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wcat
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale/bias
        ],
        out_specs=pl.BlockSpec((T, W, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x0, x1, x2, wcat, sb)
    return out[None]


def fold_bn(conv_p, bn_p, eps=1e-5):
    """Fold inference BatchNorm into (scale, bias) for conv3x3_fused.

    y = (conv(x) + b - mean) * gamma/sqrt(var+eps) + beta
      = conv(x) * s + (b - mean) * s + beta
    """
    import numpy as np

    s = bn_p["scale"] / jnp.sqrt(bn_p["var"] + eps)
    b = conv_p.get("b")
    base = (b if b is not None else 0.0) - bn_p["mean"]
    return s, base * s + bn_p["bias"]
