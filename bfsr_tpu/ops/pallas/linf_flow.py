"""Fused Pallas kernels for the LINF pointwise flow (pixel model, d=3).

Why: the jnp flow operates on (N, 3) arrays — with d=3 in the lane
dimension, every elementwise op uses 3/128 lanes.  These kernels flip to
channel-major (d, N) layout: each channel/affine row is a full-lane (N,)
vector, the whole (L+1)-layer chain runs in VMEM per tile with the scale/
shift rows streamed once from HBM, and the tiny 3x3 weights live in SMEM.

Forward (encode) and inverse (decode) cover the learned-prior inference
path; log-prob output (needed only when training the flow itself) stays on
the jnp path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bfsr_tpu.ops.pointwise_flow import AFFINE_EPS

TILE_N = 2048


def _inverse_kernel(n_layers, w_inv_ref, b_ref, z_ref, info_ref, out_ref):
    # z_ref: (8, TILE) padded rows 0..2 used; info_ref: (64, TILE) rows
    # 0..6L-1 used; w_inv_ref/b_ref in SMEM.
    d = 3
    x = [z_ref[c, :] for c in range(d)]
    # last linear inverse: y_c = sum_k w_inv[L, c, k] * (x_k - b[L, k])
    t = [x[k] - b_ref[n_layers, k] for k in range(d)]
    x = [sum(w_inv_ref[n_layers, c, k] * t[k] for k in range(d)) for c in range(d)]
    for i in range(n_layers - 1, -1, -1):
        base = i * 2 * d
        for c in range(d):
            s = info_ref[base + c, :]
            scale = jax.nn.sigmoid(s + 2.0) + AFFINE_EPS
            shift = info_ref[base + d + c, :]
            x[c] = (x[c] - shift) / scale
        t = [x[k] - b_ref[i, k] for k in range(d)]
        x = [sum(w_inv_ref[i, c, k] * t[k] for k in range(d)) for c in range(d)]
    for c in range(d):
        out_ref[c, :] = x[c]


def _forward_kernel(n_layers, w_ref, b_ref, x_ref, info_ref, out_ref):
    d = 3
    z = [x_ref[c, :] for c in range(d)]
    for i in range(n_layers):
        # y_c = sum_k w[i, c, k] * z_k + b[i, c]
        z = [sum(w_ref[i, c, k] * z[k] for k in range(d)) + b_ref[i, c]
             for c in range(d)]
        base = i * 2 * d
        for c in range(d):
            s = info_ref[base + c, :]
            scale = jax.nn.sigmoid(s + 2.0) + AFFINE_EPS
            shift = info_ref[base + d + c, :]
            z[c] = z[c] * scale + shift
    z = [sum(w_ref[n_layers, c, k] * z[k] for k in range(d)) + b_ref[n_layers, c]
         for c in range(d)]
    for c in range(d):
        out_ref[c, :] = z[c]


def _inverse_kernel_nd(n_layers, d, w_inv_ref, b_ref, z_ref, info_ref, out_ref):
    """Generic-d inverse (patch model, d = 3*ps^2): channel-major 2-D
    blocks, per-layer (d, d) @ (d, TILE) matmuls on the MXU."""
    x = z_ref[:d, :]
    x = jnp.dot(w_inv_ref[n_layers], x - b_ref[n_layers][:d, :],
                preferred_element_type=jnp.float32)
    for i in range(n_layers - 1, -1, -1):
        base = i * 2 * d
        scale = jax.nn.sigmoid(info_ref[base:base + d, :] + 2.0) + AFFINE_EPS
        shift = info_ref[base + d:base + 2 * d, :]
        x = (x - shift) / scale
        x = jnp.dot(w_inv_ref[i], x - b_ref[i][:d, :],
                    preferred_element_type=jnp.float32)
    out_ref[:d, :] = x


def _forward_kernel_nd(n_layers, d, w_ref, b_ref, x_ref, info_ref, out_ref):
    z = x_ref[:d, :]
    for i in range(n_layers):
        z = jnp.dot(w_ref[i], z, preferred_element_type=jnp.float32) \
            + b_ref[i][:d, :]
        base = i * 2 * d
        scale = jax.nn.sigmoid(info_ref[base:base + d, :] + 2.0) + AFFINE_EPS
        shift = info_ref[base + d:base + 2 * d, :]
        z = z * scale + shift
    z = jnp.dot(w_ref[n_layers], z, preferred_element_type=jnp.float32) \
        + b_ref[n_layers][:d, :]
    out_ref[:d, :] = z


def cm_rows(d):
    """Channel-major row count for dimension d (sublane-aligned)."""
    return -(-d // 8) * 8


def _run(kernel, weights, b, z_cm, info_cm, n_layers, interpret=False):
    """z_cm: (rows, N) channel-major padded; info_cm: (info_rows, N)."""
    # Mosaic kernels need real TPU hardware; elsewhere fall back to the
    # interpreter so the same code path stays testable on CPU.
    interpret = interpret or jax.default_backend() != "tpu"
    n = z_cm.shape[1]
    rows = z_cm.shape[0]
    info_rows = info_cm.shape[0]
    d = weights.shape[-1]
    # generic-d path: weights as (L+1, d, d) VMEM matmul operands with
    # column-broadcast biases; d=3 keeps the tuned scalar-SMEM kernels
    if d != 3:
        kernel = _inverse_kernel_nd if kernel is _inverse_kernel else _forward_kernel_nd
        b2 = jnp.broadcast_to(b[:, :, None], (*b.shape, 1)).astype(jnp.float32)
        tile = max(512, TILE_N // max(1, (d * d) // 64))
        grid = (pl.cdiv(n, tile),)
        return pl.pallas_call(
            functools.partial(kernel, n_layers, d),
            out_shape=jax.ShapeDtypeStruct((rows, n), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # biases
                    pl.BlockSpec((rows, tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((info_rows, tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((rows, tile), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(weights, b2, z_cm, info_cm)
    grid = (pl.cdiv(n, TILE_N),)  # ragged last block handled by pallas
    return pl.pallas_call(
        functools.partial(kernel, n_layers),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, TILE_N), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((64, TILE_N), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, TILE_N), lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(weights, b, z_cm, info_cm)


def _to_cm(x, rows):
    """(N, d) -> channel-major (rows, Np) with N padded to TILE_N."""
    n, d = x.shape
    n_pad = (TILE_N - n % TILE_N) % TILE_N
    x = jnp.pad(x, ((0, n_pad), (0, 0)))
    x = x.T  # (d, Np)
    return jnp.pad(x, ((0, rows - d), (0, 0))), n


def flow_inverse_cm(params, z_cm, info_cm, interpret=False):
    """Channel-major fast path: z_cm (8, N), info_cm (64, N), N a multiple
    of TILE_N.  No boundary transposes — feed it straight from
    ``linf_affine_info_grid(..., channel_major_rows=64)``.  Returns (8, N)
    with rows 0..2 holding the result."""
    n_layers = params["w"].shape[0] - 1
    return _run(_inverse_kernel, params["w_inv"].astype(jnp.float32),
                params["b"].astype(jnp.float32), z_cm, info_cm, n_layers,
                interpret)


def flow_forward_cm(params, x_cm, info_cm, interpret=False):
    """Channel-major forward (z only): x_cm (8, N), info_cm (64, N)."""
    n_layers = params["w"].shape[0] - 1
    return _run(_forward_kernel, params["w"].astype(jnp.float32),
                params["b"].astype(jnp.float32), x_cm, info_cm, n_layers,
                interpret)


def flow_inverse(params, z, affine_info, interpret=False):
    """Pallas twin of pointwise_flow.inverse with cached inverses.

    z: (N, d); affine_info: (N, 2*d*n_layers).  Returns (N, d).  d=3 runs
    the tuned scalar kernels; other d (patch model, 3*ps^2) the generic
    matmul kernels.
    """
    n_layers = params["w"].shape[0] - 1
    d = params["w"].shape[-1]
    assert "w_inv" in params, "flow_inverse requires cached inverses (freeze())"
    if d == 3 and 2 * d * n_layers > 64:
        raise ValueError("tuned d=3 kernels support <= 10 flow layers "
                         "(info rows pad to 64); use pointwise_flow")
    z_cm, n = _to_cm(z.astype(jnp.float32), cm_rows(d) if d != 3 else 8)
    info_cm, _ = _to_cm(affine_info.astype(jnp.float32),
                        cm_rows(2 * d * n_layers) if d != 3 else 64)
    out = _run(_inverse_kernel, params["w_inv"].astype(jnp.float32),
               params["b"].astype(jnp.float32), z_cm, info_cm, n_layers,
               interpret)
    return out[:d, :n].T


def flow_forward(params, x, affine_info, interpret=False):
    """Pallas twin of pointwise_flow.forward (z only, no log-prob)."""
    n_layers = params["w"].shape[0] - 1
    d = params["w"].shape[-1]
    if d == 3 and 2 * d * n_layers > 64:
        raise ValueError("tuned d=3 kernels support <= 10 flow layers "
                         "(info rows pad to 64); use pointwise_flow")
    x_cm, n = _to_cm(x.astype(jnp.float32), cm_rows(d) if d != 3 else 8)
    info_cm, _ = _to_cm(affine_info.astype(jnp.float32),
                        cm_rows(2 * d * n_layers) if d != 3 else 64)
    out = _run(_forward_kernel, params["w"].astype(jnp.float32),
               params["b"].astype(jnp.float32), x_cm, info_cm, n_layers,
               interpret)
    return out[:d, :n].T
