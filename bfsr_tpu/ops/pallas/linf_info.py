"""Fully-fused affine-info kernel for LINF on regular query grids.

The XLA pipeline materializes eight HR-resolution gathered maps, the
trig basis, and the 1024-channel feature tensor (~GBs of HBM traffic per
image).  This kernel produces the per-query affine parameters straight
from the LR-resolution coef/freq maps:

* the LR maps live in HBM (channel-major (h, C, w)); each (row, col) tile
  DMAs just the LR row/col window it needs into VMEM,
* the 4-corner column expansion is an MXU matmul against per-tile one-hot
  column-selection matrices,
* Fourier basis (cos/sin), area weighting, and the MLP all run in VMEM per
  tile; only the final channel-major info (rows = out_dim padded to 8)
  leaves the chip.

Tiling: up to 32 HR rows x 128/256 HR cols per grid step; the LR DMA
window covers tr/scale (+3) rows x up to 512 cols (128-aligned base) —
VMEM-bounded regardless of image size.

Feed the output (reshaped (rows, H*W)) to ``linf_flow.flow_forward_cm`` /
``flow_inverse_cm``.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_R = 16      # HR row quantum (predictor pads H to a multiple of this, so
              # the kernel can always run full 16-row tiles — DIV2K's 2040
              # used to fall back to 8-row tiles, re-reading every LR
              # window twice).  The kernel itself accepts any multiple of
              # _ROW_Q.
_ROW_Q = 8
_MAX_TR = 16  # HR rows per tile (large: amortizes the LR-window DMA, which
              # otherwise re-reads the same rows for every small row tile)
WT = 128      # HR col-tile quantum (predictor pads W to a multiple of this)
# (wt, cw, min_scale) col-tile configs: bigger tiles when W allows — fewer
# DMA re-reads and larger matmuls; cw covers wt/s + 2 + <=127 base rounding
_CONFIGS = ((256, 512, 1.5), (128, 384, 0.8))


def _sincos_pi(f):
    """(cos(pi*f), sin(pi*f)) via explicit range reduction + Taylor on
    [-pi/2, pi/2].  The VPU's transcendental sequence costs ~29 cycles per
    element (measured: trig is ~4 ms of this kernel at 512^2); this shared
    reduction + polynomial pair costs ~11 each.  Max abs error ~1e-7."""
    k = jnp.round(f)
    r = f - k  # [-0.5, 0.5]
    kh = k * 0.5
    sign = 1.0 - 4.0 * (kh - jnp.floor(kh))  # (-1)^k
    x = r * math.pi
    z = x * x
    # cos x = sum_i (-1)^i z^i / (2i)!, Horner from i=7
    _COS = [-1.0 / 87178291200.0, 1.0 / 479001600.0, -1.0 / 3628800.0,
            1.0 / 40320.0, -1.0 / 720.0, 1.0 / 24.0, -0.5, 1.0]
    c = _COS[0]
    for a in _COS[1:]:
        c = c * z + a
    # sin x = x * sum_i (-1)^i z^i / (2i+1)!, Horner from i=6
    _SIN = [1.0 / 6227020800.0, -1.0 / 39916800.0, 1.0 / 362880.0,
            -1.0 / 5040.0, 1.0 / 120.0, -1.0 / 6.0, 1.0]
    s = _SIN[0]
    for a in _SIN[1:]:
        s = s * z + a
    s = s * x
    return sign * c, sign * s


def _kernel(hidden, n_hidden, cw, r_max, tr,
            row_start_ref, col_base_ref, iy_m_ref, iy_p_ref,
            rel_y_m_ref, rel_y_p_ref,
            coef_ref, freq_ref, pxm_ref, pxp_ref, relxm_ref, relxp_ref,
            phase_ref, w1t_ref, wht_ref, w4t_ref,
            b1_ref, bh_ref, b4_ref,
            out_ref, coef_buf, freq_buf, sems):
    t = pl.program_id(0)
    c = pl.program_id(1)
    C = hidden
    half = C // 2
    row_start = row_start_ref[t]
    col_base = pl.multiple_of(col_base_ref[c], 128)

    cp = pltpu.make_async_copy(
        coef_ref.at[pl.ds(row_start, r_max), :, pl.ds(col_base, cw)],
        coef_buf, sems.at[0])
    fp = pltpu.make_async_copy(
        freq_ref.at[pl.ds(row_start, r_max), :, pl.ds(col_base, cw)],
        freq_buf, sems.at[1])
    cp.start()
    fp.start()
    cp.wait()
    fp.wait()

    relx_m = relxm_ref[0, :]
    relx_p = relxp_ref[0, :]
    phase = phase_ref[:, 0][:, None]  # (half, 1)
    pxm = pxm_ref[0]  # (CW, WT)
    pxp = pxp_ref[0]

    for r in range(tr):
        hr_row = t * tr + r
        iy_m = iy_m_ref[hr_row] - row_start
        iy_p = iy_p_ref[hr_row] - row_start
        ry_m = rel_y_m_ref[hr_row]
        ry_p = rel_y_p_ref[hr_row]

        coef_m = coef_buf[iy_m]   # (C, CW)
        freq_m = freq_buf[iy_m]
        coef_p = coef_buf[iy_p]
        freq_p = freq_buf[iy_p]

        # stacked column expansion: (4C, CW) @ (CW, WT) on the MXU
        sm = jnp.concatenate([coef_m, freq_m, coef_p, freq_p], axis=0)
        a_m = jnp.dot(sm, pxm, preferred_element_type=jnp.float32)
        a_p = jnp.dot(sm, pxp, preferred_element_type=jnp.float32)

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
            cf, sf = _sincos_pi(f)
            basis = jnp.concatenate([cf, sf], axis=0)
            piece = (weights[i][None, :] * coef_c) * basis  # (C, WT)
            term = jnp.dot(w1t_ref[i], piece, preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
        hcur = jnp.maximum(acc + b1_ref[:, 0][:, None], 0.0)
        for j in range(n_hidden):
            hcur = jnp.maximum(
                jnp.dot(wht_ref[j], hcur, preferred_element_type=jnp.float32)
                + bh_ref[j, :, 0][:, None], 0.0)
        info = (jnp.dot(w4t_ref[:, :], hcur, preferred_element_type=jnp.float32)
                + b4_ref[:, 0][:, None])
        out_ref[:, r, :] = info


def _nearest_index_vec(coord, n):
    return jnp.clip(jnp.rint(((coord + 1.0) * n - 1.0) / 2.0).astype(jnp.int32),
                    0, n - 1)


def fused_affine_info_cm(params, coef, freq, coord_y, coord_x, cell,
                         hidden_dim, interpret=False):
    """Compute channel-major (rows_out, H*W) affine info for a regular
    grid (rows_out = the MLP's output dim padded to a multiple of 8; 64
    for the pixel model, 544 for the ps=3 patch model).

    coef/freq: (1, h, w, C) conv outputs; coord_y: (H,), coord_x: (W,)
    (1-D, batch stripped); cell: (1, 2).  H must be a multiple of T_R and
    W a multiple of WT (the predictor pads accordingly).
    """
    from bfsr_tpu.ops import nn as fnn

    interpret = interpret or jax.default_backend() != "tpu"
    C = hidden_dim
    h, w = coef.shape[1], coef.shape[2]
    H = coord_y.shape[0]
    W = coord_x.shape[0]
    assert H % _ROW_Q == 0 and W % WT == 0, (H, W)
    scale_est = min(H / h, W / w)
    out_dim_early = params["mlp"][-1]["w"].shape[-1]
    rows_out_early = max(-(-out_dim_early // 8) * 8, 8)
    wt, cw = next(
        (c[0], c[1]) for c in _CONFIGS
        if W % c[0] == 0 and scale_est >= c[2]
    )
    tr = min(_MAX_TR, H)
    while H % tr:
        tr -= _ROW_Q

    # the DMA window never needs to exceed the (128-padded) LR extent,
    # nor what a wt-col tile can read: its ix span is wt/scale + 2 plus
    # up to 127 cols of col_base 128-rounding (windows sized beyond that
    # are pure DMA waste — DIV2K used to ship cw=512 where 256 suffices)
    w128 = -(-w // 128) * 128

    def _cw_for(wt_):
        need = int(wt_ / max(scale_est, 0.8)) + 2 + 127 + 1
        return min(w128, max(-(-need // 128) * 128, 128))

    cw = min(cw, _cw_for(wt))

    # VMEM cap on the WHOLE scoped footprint, not just the out block: at
    # DIV2K LR widths the coef/freq col windows are cw=512 (vs 128 at the
    # 512^2 bench) and tr=16 overflowed the 16M scoped-vmem limit.  The
    # temporaries coefficient is calibrated against the measured 512^2
    # (fits) and 2040x1356 (17.38M, overflowed) footprints.
    def _vmem_est(tr_, wt_, cw_):
        r = min(int(math.ceil(tr_ / max(scale_est, 0.8))) + 3, max(h, 4))
        return (rows_out_early * tr_ * wt_ * 4 * 2   # out block, dbl-buffered
                + 2 * r * C * cw_ * 4                # coef/freq LR windows
                + 2 * 2 * cw_ * wt_ * 4              # pxm/pxp blocks
                # in-kernel temporaries scale with BOTH the hidden width
                # and the output rows (the 544-row patch model's MLP-out
                # accumulators OOM'd scoped vmem at DIV2K extents when
                # only C was counted)
                + int(1.7 * tr_ * wt_ * max(C, rows_out_early) * 4))

    budget = 15 * 1024 * 1024
    while tr > _ROW_Q and _vmem_est(tr, wt, cw) > budget:
        tr -= _ROW_Q
    if W % 128 == 0:
        while wt > 128 and _vmem_est(tr, wt, cw) > budget:
            wt //= 2
            cw = min(cw, _cw_for(wt))
    # LR row window: tr HR rows span <= tr/scale LR rows (+2 for the
    # corner shifts, +1 rounding)
    r_max = int(math.ceil(tr / max(scale_est, 0.8))) + 3
    r_max = min(r_max, max(h, 4))
    n_rows = H // tr
    n_cols = W // wt

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

    # channel-major LR maps, padded so every DMA window is valid
    w_pad = max(w128, cw)
    h_pad_rows = max(r_max - h, 0)
    coef_cm = jnp.pad(coef[0].transpose(0, 2, 1),
                      ((0, h_pad_rows), (0, 0), (0, w_pad - w)))
    freq_cm = jnp.pad(freq[0].transpose(0, 2, 1),
                      ((0, h_pad_rows), (0, 0), (0, w_pad - w)))

    # per-row-tile LR row-window starts (iy monotonic on regular grids)
    row_start = jnp.clip(iy_m.reshape(n_rows, tr)[:, 0], 0,
                         max(h + h_pad_rows - r_max, 0))
    # per-col-tile LR col-window bases, 128-aligned for the DMA
    first_ix = ix_m.reshape(n_cols, wt)[:, 0]
    col_base = jnp.clip((first_ix // 128) * 128, 0, max(w_pad - cw, 0))

    # per-tile one-hot column selectors, indices relative to col_base
    def local_px(ix):
        local = ix.reshape(n_cols, wt) - col_base[:, None]
        return jax.nn.one_hot(local, cw, dtype=jnp.float32).transpose(0, 2, 1)

    pxm = local_px(ix_m)  # (n_cols, CW, WT)
    pxp = local_px(ix_p)

    rel_cell = cell * jnp.asarray([h, w], cell.dtype)
    phase = fnn.linear(rel_cell, params["phase"])[0]  # (C/2,)

    mlp = params["mlp"]
    n_hidden = len(mlp) - 2
    w1 = mlp[0]["w"]  # (4C, C)
    w1t = jnp.stack([w1[i * C:(i + 1) * C].T for i in range(4)])
    if n_hidden > 0:
        wht = jnp.stack([mlp[1 + j]["w"].T for j in range(n_hidden)])
        bh = jnp.stack([mlp[1 + j]["b"][:, None] for j in range(n_hidden)])
    else:
        wht = jnp.zeros((1, C, C), jnp.float32)
        bh = jnp.zeros((1, C, 1), jnp.float32)
    out_dim = mlp[-1]["w"].shape[-1]
    rows_out = max(-(-out_dim // 8) * 8, 8)
    w4 = jnp.pad(mlp[-1]["w"], ((0, 0), (0, rows_out - out_dim)))
    b4 = jnp.pad(mlp[-1]["b"], (0, rows_out - out_dim))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_rows, n_cols),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # coef_cm (DMA'd manually)
            pl.BlockSpec(memory_space=pltpu.ANY),   # freq_cm
            pl.BlockSpec((1, cw, wt), lambda t, c, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),  # pxm
            pl.BlockSpec((1, cw, wt), lambda t, c, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),  # pxp
            pl.BlockSpec((1, wt), lambda t, c, *_: (0, c),
                         memory_space=pltpu.VMEM),  # rel_x_m
            pl.BlockSpec((1, wt), lambda t, c, *_: (0, c),
                         memory_space=pltpu.VMEM),  # rel_x_p
            pl.BlockSpec(memory_space=pltpu.VMEM),  # phase (C/2, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1t
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wht
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w4t
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bh
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b4
        ],
        out_specs=pl.BlockSpec((rows_out, tr, wt), lambda t, c, *_: (0, t, c),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((r_max, C, cw), jnp.float32),
            pltpu.VMEM((r_max, C, cw), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel, C, n_hidden, cw, r_max, tr),
        out_shape=jax.ShapeDtypeStruct((rows_out, H, W), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        row_start.astype(jnp.int32), col_base.astype(jnp.int32),
        iy_m.astype(jnp.int32), iy_p.astype(jnp.int32), rel_y_m, rel_y_p,
        coef_cm, freq_cm, pxm, pxp,
        rel_x_m[None, :], rel_x_p[None, :], phase[:, None],
        w1t, wht, w4.T,
        mlp[0]["b"][:, None], bh, b4[:, None],
    )
    return out.reshape(rows_out, H * W)
