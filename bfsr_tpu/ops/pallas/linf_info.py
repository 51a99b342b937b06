"""Fully-fused affine-info kernel for LINF on regular query grids.

The XLA pipeline materializes eight HR-resolution gathered maps, the
trig basis, and the 1024-channel feature tensor (~GBs of HBM traffic per
image).  This kernel produces the per-query affine parameters straight
from the LR-resolution coef/freq maps:

* the LR maps live in HBM (channel-major (h, C, w)); each row-tile DMAs
  just the LR row range it needs (<= R_MAX rows) into VMEM,
* the 4-corner column expansion is an MXU matmul against one-hot
  column-selection matrices (w x W),
* Fourier basis (cos/sin), area weighting, and the 4-layer MLP all run in
  VMEM per tile; only the final (64, N) channel-major info leaves the chip.

Layout contracts (all f32):
  coef_cm, freq_cm : (h, C, w)        C = hidden_dim (256)
  P_xm, P_xp       : (w, W)           one-hot column selectors
  rel_x_m/p        : (1, W)
  phase_col        : (C/2, 1)
  w1t              : (4, C, C)        first-layer weight, per-shift slices,
                                      transposed (out, in)
  w2t, w3t         : (C, C)
  w4t              : (64, C)          zero-padded beyond the true out dim
  b1, b2, b3       : (C, 1);  b4: (64, 1)
  scalar prefetch  : row_start (n_tiles,), iy_m, iy_p (H,) int32,
                     rel_y_m, rel_y_p (H,) f32
  output           : info_cm (64, H*W), H a multiple of T_R

Feed the output directly to ``linf_flow.flow_forward_cm`` /
``flow_inverse_cm``.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_R = 8       # HR rows per tile
R_MAX = 16    # max LR rows a tile can touch (scale >= ~0.8)


def _kernel(hidden, W, n_hidden,
            row_start_ref, iy_m_ref, iy_p_ref, rel_y_m_ref, rel_y_p_ref,
            coef_ref, freq_ref, pxm_ref, pxp_ref, relxm_ref, relxp_ref,
            phase_ref, w1t_ref, wht_ref, w4t_ref,
            b1_ref, bh_ref, b4_ref,
            out_ref, coef_buf, freq_buf, sems):
    t = pl.program_id(0)
    C = hidden
    half = C // 2
    row_start = row_start_ref[t]

    cp = pltpu.make_async_copy(coef_ref.at[pl.ds(row_start, R_MAX)], coef_buf,
                               sems.at[0])
    fp = pltpu.make_async_copy(freq_ref.at[pl.ds(row_start, R_MAX)], freq_buf,
                               sems.at[1])
    cp.start()
    fp.start()
    cp.wait()
    fp.wait()

    relx_m = relxm_ref[0, :]
    relx_p = relxp_ref[0, :]
    phase = phase_ref[:, 0][:, None]  # (half, 1)

    for r in range(T_R):
        hr_row = t * T_R + r
        iy_m = iy_m_ref[hr_row] - row_start
        iy_p = iy_p_ref[hr_row] - row_start
        ry_m = rel_y_m_ref[hr_row]
        ry_p = rel_y_p_ref[hr_row]

        coef_m = coef_buf[iy_m]   # (C, w)
        freq_m = freq_buf[iy_m]
        coef_p = coef_buf[iy_p]
        freq_p = freq_buf[iy_p]

        # stacked column expansion: (4C, w) @ (w, W) on the MXU
        sm = jnp.concatenate([coef_m, freq_m, coef_p, freq_p], axis=0)
        a_m = jnp.dot(sm, pxm_ref[:, :], preferred_element_type=jnp.float32)
        a_p = jnp.dot(sm, pxp_ref[:, :], preferred_element_type=jnp.float32)

        # combos in reference loop order [(vx,vy)] = mm, mp, pm, pp
        combos = (
            (a_m[0:C], a_m[C:2 * C], ry_m, relx_m),
            (a_p[0:C], a_p[C:2 * C], ry_m, relx_p),
            (a_m[2 * C:3 * C], a_m[3 * C:4 * C], ry_p, relx_m),
            (a_p[2 * C:3 * C], a_p[3 * C:4 * C], ry_p, relx_p),
        )
        areas = [jnp.abs(ry * rx) + 1e-9 for _, _, ry, rx in combos]
        tot = areas[0] + areas[1] + areas[2] + areas[3]
        weights = [areas[3] / tot, areas[2] / tot, areas[1] / tot, areas[0] / tot]

        acc = None
        for i, (coef_c, freq_c, ry, rx) in enumerate(combos):
            f = freq_c[:half] * ry + freq_c[half:] * rx[None, :] + phase
            basis = jnp.concatenate(
                [jnp.cos(math.pi * f), jnp.sin(math.pi * f)], axis=0
            )
            piece = (weights[i][None, :] * coef_c) * basis  # (C, W)
            term = jnp.dot(w1t_ref[i], piece, preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
        hcur = jnp.maximum(acc + b1_ref[:, 0][:, None], 0.0)
        for j in range(n_hidden):
            hcur = jnp.maximum(
                jnp.dot(wht_ref[j], hcur, preferred_element_type=jnp.float32)
                + bh_ref[j, :, 0][:, None], 0.0)
        info = (jnp.dot(w4t_ref[:, :], hcur, preferred_element_type=jnp.float32)
                + b4_ref[:, 0][:, None])
        out_ref[:, r * W:(r + 1) * W] = info


def _nearest_index_vec(coord, n):
    return jnp.clip(jnp.rint(((coord + 1.0) * n - 1.0) / 2.0).astype(jnp.int32),
                    0, n - 1)


def fused_affine_info_cm(params, coef, freq, coord_y, coord_x, cell,
                         hidden_dim, interpret=False):
    """Compute channel-major (64, H*W) affine info for a regular grid.

    coef/freq: (1, h, w, C) conv outputs; coord_y: (H,), coord_x: (W,)
    (1-D, batch stripped); cell: (1, 2).  H must be a multiple of T_R.
    """
    from bfsr_tpu.ops import nn as fnn

    interpret = interpret or jax.default_backend() != "tpu"
    C = hidden_dim
    h, w = coef.shape[1], coef.shape[2]
    H = coord_y.shape[0]
    W = coord_x.shape[0]
    assert H % T_R == 0
    n_tiles = H // T_R

    rx = 1.0 / h
    ry_cell = 1.0 / w
    eps = 1e-6

    def axis(coord, n, shift):
        s = jnp.clip(coord + shift + eps, -1 + 1e-6, 1 - 1e-6)
        idx = _nearest_index_vec(s, n)
        q = -1.0 + (2.0 * idx.astype(jnp.float32) + 1.0) / n
        return idx, (coord - q) * n

    iy_m, rel_y_m = axis(coord_y, h, -rx)
    iy_p, rel_y_p = axis(coord_y, h, +rx)
    ix_m, rel_x_m = axis(coord_x, w, -ry_cell)
    ix_p, rel_x_p = axis(coord_x, w, +ry_cell)

    # per-tile LR row-range starts, clamped so [start, start+R_MAX) is valid
    first = iy_m.reshape(n_tiles, T_R)[:, 0]
    row_start = jnp.clip(first, 0, max(h - R_MAX, 0))

    pxm = jax.nn.one_hot(ix_m, w, dtype=jnp.float32).T  # (w, W)
    pxp = jax.nn.one_hot(ix_p, w, dtype=jnp.float32).T

    rel_cell = cell * jnp.asarray([h, w], cell.dtype)
    phase = fnn.linear(rel_cell, params["phase"])[0]  # (C/2,)

    # channel-major LR maps; pad rows so every R_MAX DMA window is valid and
    # the width to a 128-lane multiple (Mosaic DMA slice alignment)
    w128 = -(-w // 128) * 128
    coef_cm = coef[0].transpose(0, 2, 1)  # (h, C, w)
    freq_cm = freq[0].transpose(0, 2, 1)
    pad_h_rows = max(R_MAX - h, 0)
    coef_cm = jnp.pad(coef_cm, ((0, pad_h_rows), (0, 0), (0, w128 - w)))
    freq_cm = jnp.pad(freq_cm, ((0, pad_h_rows), (0, 0), (0, w128 - w)))
    pxm = jnp.pad(pxm, ((0, w128 - w), (0, 0)))
    pxp = jnp.pad(pxp, ((0, w128 - w), (0, 0)))

    mlp = params["mlp"]
    n_hidden = len(mlp) - 2
    w1 = mlp[0]["w"]  # (4C, C)
    w1t = jnp.stack([w1[i * C:(i + 1) * C].T for i in range(4)])  # (4, C, C)
    if n_hidden > 0:
        wht = jnp.stack([mlp[1 + j]["w"].T for j in range(n_hidden)])
        bh = jnp.stack([mlp[1 + j]["b"][:, None] for j in range(n_hidden)])
    else:
        wht = jnp.zeros((1, C, C), jnp.float32)
        bh = jnp.zeros((1, C, 1), jnp.float32)
    w4 = jnp.pad(mlp[-1]["w"], ((0, 0), (0, 64 - mlp[-1]["w"].shape[-1])))
    b4 = jnp.pad(mlp[-1]["b"], (0, 64 - mlp[-1]["b"].shape[0]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # coef_cm (DMA'd manually)
            pl.BlockSpec(memory_space=pltpu.ANY),   # freq_cm
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pxm
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pxp
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rel_x_m (1, W)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rel_x_p
            pl.BlockSpec(memory_space=pltpu.VMEM),  # phase (C/2, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1t
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wht
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w4t
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bh
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b4
        ],
        out_specs=pl.BlockSpec((64, T_R * W), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R_MAX, C, w128), jnp.float32),
            pltpu.VMEM((R_MAX, C, w128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    return pl.pallas_call(
        functools.partial(_kernel, C, W, n_hidden),
        out_shape=jax.ShapeDtypeStruct((64, H * W), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        row_start.astype(jnp.int32), iy_m.astype(jnp.int32),
        iy_p.astype(jnp.int32), rel_y_m, rel_y_p,
        coef_cm, freq_cm, pxm, pxp,
        rel_x_m[None, :], rel_x_p[None, :], phase[:, None],
        w1t, wht, w4.T,
        mlp[0]["b"][:, None], bh, b4[:, None],
    )
