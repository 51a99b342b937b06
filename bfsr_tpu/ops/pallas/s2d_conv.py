"""Space-to-depth 3x3 convolution kernel (the UNet's 512^2 conv engine).

XLA's NHWC conv on this chip runs at 3-17 TF/s for the <=64-channel 3x3
layers that dominate the prior UNet (reference: LINF-LP/models/unet.py) —
output channels <=64 waste most of the MXU's 128 output lanes, and the
dense block's channel concats add relayout traffic.  This kernel instead
computes the conv in the 2x2 space-to-depth domain:

* a 3x3 stride-1 SAME conv at (H, W, C) is exactly a 3x3 SAME conv at
  (H/2, W/2, 4C) whose weight carries the phase structure — output
  channels become 4*Cout (>=128 for Cout>=32): full MXU output width,
* inputs are a LIST of phase-major s2d tensors (a channel concat in the
  original domain) — each is DMA'd once per tile and contracted with its
  own weight block: no concat materialization at all,
* f32 accuracy via the explicit 3-pass bf16 split (hi@hi + hi@lo + lo@hi,
  == XLA Precision.HIGH; Mosaic has no native HIGH), ``passes=1`` gives
  the DEFAULT-precision serving mode,
* per-channel scale/bias (folded BatchNorm + conv bias) and
  LeakyReLU/ReLU fuse into the output write.

B=1, f32.  H and W must be even (the UNet runs at the HR resolution).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major: c' = (2*py+px)*C + c."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def depth_to_space(y):
    """Inverse of :func:`space_to_depth`."""
    B, Hs, Ws, C4 = y.shape
    C = C4 // 4
    y = y.reshape(B, Hs, Ws, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, Hs * 2, Ws * 2, C)


def space_to_depth_h(x):
    """(B, H, W, C) -> (B, H/2, W, 2C), phase-major: c' = py*C + c.
    The H-only s2d domain for ``factors=(2, 1)`` convs."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W, C).transpose(0, 1, 3, 2, 4)
    return x.reshape(B, H // 2, W, 2 * C)


def depth_to_space_h(y):
    """Inverse of :func:`space_to_depth_h`."""
    B, Hs, W, C2 = y.shape
    y = y.reshape(B, Hs, W, 2, C2 // 2).transpose(0, 1, 3, 2, 4)
    return y.reshape(B, Hs * 2, W, C2 // 2)


def full_to_h_s2d(x4):
    """Relayout full 2x2 s2d (B, H/2, W/2, 4C) -> H-only s2d (B, H/2, W, 2C)
    of the same original tensor (pure reshape/transpose)."""
    B, Hs, Ws, C4 = x4.shape
    C = C4 // 4
    x = x4.reshape(B, Hs, Ws, 2, 2, C)           # (py, px, c)
    x = x.transpose(0, 1, 2, 4, 3, 5)            # B, Hs, (Ws, px), (py, c)
    return x.reshape(B, Hs, Ws * 2, 2 * C)


def _phase_map(ky=2, kx=2):
    """Constant (9, ky*kx, ky*kx, 3, 3) binary map: s2d tap t=(ry,rx), in
    phase p=(py,px), out phase q=(a,b) carries orig tap (dy, dx) =
    (ky*ry+py-a, kx*rx+px-b) when both lie in [-1, 1].

    The map is mostly structurally zero: a kxk s2d trades k(y)*k(x) extra
    MACs for k(y)*k(x)-wider output lanes.  Axis-only s2d (ky=2, kx=1 /
    ky=1, kx=2) trades only 2x MACs for 2x lanes — the better deal for
    Cout=64 convs, where 2*Cout already fills the 128 MXU lanes."""
    m = np.zeros((9, ky * kx, ky * kx, 3, 3), np.float32)
    for a in range(ky):
        for b in range(kx):
            q = a * kx + b
            for py in range(ky):
                for px in range(kx):
                    p = py * kx + px
                    for ry in (-1, 0, 1):
                        for rx in (-1, 0, 1):
                            dy = ky * ry + py - a
                            dx = kx * rx + px - b
                            if -1 <= dy <= 1 and -1 <= dx <= 1:
                                m[(ry + 1) * 3 + rx + 1, p, q,
                                  dy + 1, dx + 1] = 1.0
    return m


_PHASE_MAPS = {(2, 2): _phase_map(2, 2), (2, 1): _phase_map(2, 1),
               (1, 2): _phase_map(1, 2)}


def s2d_weight(w, cin_split=None, factors=(2, 2)):
    """Transform (3, 3, Cin, Cout) conv weights into the s2d domain.

    Returns a list of (9, P*Ci, P*Cout) f32 arrays (P = ky*kx), one per
    input block in ``cin_split`` (default: one block of Cin).  Tap order:
    (dy*3+dx) over the s2d-domain 3x3 kernel; channels phase-major
    (p*Ci+c / q*Cout+co).  Pure jnp (a constant-map einsum) so it traces
    under jit.
    """
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3
    cin_split = list(cin_split) if cin_split is not None else [cin]
    assert sum(cin_split) == cin
    P = factors[0] * factors[1]
    ws = jnp.einsum("yxco,tpqyx->tpcqo", w.astype(jnp.float32),
                    jnp.asarray(_PHASE_MAPS[tuple(factors)]))
    outs = []
    off = 0
    for ci in cin_split:
        blk = ws[:, :, off:off + ci].reshape(9, P * ci, P * cout)
        outs.append(blk)
        off += ci
    return outs


def _kernel(n_in, T, Wc, m, act, slope, passes, *refs):
    """refs: in_refs*n (HBM) | wh*n | wl*n | sb | out_ref | wins*n | sems."""
    in_refs = refs[:n_in]
    wh = refs[n_in:2 * n_in]
    wl = refs[2 * n_in:3 * n_in]
    sb = refs[3 * n_in]
    out_ref = refs[3 * n_in + 1]
    wins = refs[3 * n_in + 2:3 * n_in + 2 + n_in]
    sems = refs[-1]

    i = pl.program_id(0)
    j = pl.program_id(1)
    # col windows are 8-aligned (sublane tiling): inputs are padded 8 cols
    # on each side, the true left halo sits at col offset 7 in the window
    copies = []
    for k in range(n_in):
        c = pltpu.make_async_copy(
            in_refs[k].at[pl.ds(i * T, T + 2), pl.ds(j * Wc, Wc + 16), :],
            wins[k], sems.at[k])
        c.start()
        copies.append(c)

    acc = jnp.zeros((T * Wc, m), jnp.float32)
    for k in range(n_in):
        copies[k].wait()
        win = wins[k][:, :, :]  # (T+2, Wc+16, Ci)
        ci = win.shape[-1]
        for t in range(9):
            dy, dx = t // 3, t % 3
            v = win[dy:dy + T, 7 + dx:7 + dx + Wc, :].reshape(T * Wc, ci)
            vh = v.astype(jnp.bfloat16)
            acc += jnp.dot(vh, wh[k][t], preferred_element_type=jnp.float32)
            if passes >= 2:  # hi@lo: the weights' low bits
                acc += jnp.dot(vh, wl[k][t], preferred_element_type=jnp.float32)
            if passes == 3:  # lo@hi: the activations' low bits
                vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
                acc += jnp.dot(vl, wh[k][t], preferred_element_type=jnp.float32)

    y = acc * sb[0] + sb[1]
    if act == "lrelu":
        y = jnp.where(y >= 0, y, y * slope)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    out_ref[:, :, :] = y.reshape(T, Wc, m)


def prepad(x):
    """(1, Hs, Ws, C) -> (Hs+2, Ws+16, Cp) kernel-layout array: 1-row halo,
    8-col halo (sublane alignment), channels zero-padded to a multiple of
    128 (DMA lane alignment).  Pass prepadded arrays to :func:`conv3x3_s2d`
    when a tensor feeds several convs (the RRDB dense block reuses each
    tensor up to 5x) — the pad copy then happens once per producer instead
    of once per consumer."""
    c = x.shape[-1]
    cp = -(-c // 128) * 128
    return jnp.pad(x[0], ((1, 1), (8, 8), (0, cp - c)))


def conv3x3_s2d(inputs, weights, scale=None, bias=None, act=None, slope=0.2,
                passes=None, interpret=False, phases=4):
    """Fused 3x3 SAME conv over an implicit channel-concat of ``inputs``.

    ``passes=None`` follows the global precision mode: 3-pass bf16
    (== XLA HIGH) normally, single-pass in `BFSR_PRECISION=default`
    serving mode.

    inputs: list of (1, Hs, Ws, P*Ci) phase-major s2d tensors (f32, P =
    ``phases``: 4 for full 2x2 s2d, 2 for axis-only), or 3-D
    (Hs+2, Ws+16, Cp) kernel-layout arrays from :func:`prepad` (the
    two forms mix freely).
    weights: list of (9, P*Ci, P*Cout) from :func:`s2d_weight` (pass the
    matching ``factors``).
    scale/bias: (Cout,) per-ORIGINAL-channel affine folded into the output
    (BN + conv bias); act: None | 'relu' | 'lrelu'.
    Returns (1, Hs, Ws, P*Cout) phase-major s2d, f32.
    """
    interpret = interpret or jax.default_backend() != "tpu"
    if passes is None:
        from bfsr_tpu.ops import nn as fnn

        # 1 under DEFAULT, 2 under the TWO_PASS stage policy, 3 at HIGH+
        passes = fnn.default_passes()
    n_in = len(inputs)
    if inputs[0].ndim == 3:
        Hs, Ws = inputs[0].shape[0] - 2, inputs[0].shape[1] - 16
    else:
        Hs, Ws = inputs[0].shape[1], inputs[0].shape[2]
    m = weights[0].shape[-1]
    cout = m // phases
    if scale is None:
        scale = jnp.ones((cout,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)
    sb = jnp.stack([jnp.tile(scale, phases),
                    jnp.tile(bias, phases)]).astype(jnp.float32)

    # tile: T rows x Wc cols; keep the window set + weights within VMEM.
    # Mosaic block constraint: the col dim of a block must be 8-aligned
    # unless it equals the array's — widths like DIV2K's 1020 (no 8-mult
    # divisor) are zero-padded right to a 128 multiple and cropped after
    # (exact: SAME-conv zeros).
    if Ws <= 512:
        # pad to a sublane multiple — the DMA window is Wc+16 cols and
        # non-8-multiple slice sizes fault the DMA engine (hit at the
        # 204x168 eval extent: Ws=84 -> window 100)
        Wp = -(-Ws // 8) * 8
        cands = [Wp] + [c for c in (256, 128) if Wp % c == 0 and c < Wp]
    else:
        Wp = -(-Ws // 128) * 128
        cands = [c for c in (512, 384, 256, 128) if Wp % c == 0]

    def _cp(x):
        return x.shape[-1] if x.ndim == 3 else -(-x.shape[-1] // 128) * 128

    cin_tot = sum(_cp(x) for x in inputs)

    def _fit_T(wc):
        # windows + dbl-buffered out + f32 acc + matmul temps (~1.3 margin)
        t = 8
        while t > 1 and int(1.3 * ((t + 2) * (wc + 16) * cin_tot * 4
                                   + 3 * t * wc * m * 4)) > 10 * 1024 * 1024:
            t //= 2
        while Hs % t:
            t -= 1
        return t

    # prefer tall row tiles over wide col tiles: the (T+2)/T halo re-read
    # dominates at small T (the DIV2K dense proj used to run T=2 at
    # Wc=384 where T=8 fits at Wc=128)
    T, Wc = max(((_fit_T(c), c) for c in cands))
    grid = (Hs // T, Wp // Wc)

    # DMA slices must be 128-aligned in the last dim (CLAUDE.md / Mosaic):
    # zero-pad small channel counts (and the matching weight rows)
    padded, weights_p = [], []
    for x, w in zip(inputs, weights):
        if x.ndim == 3:
            if Wp != Ws:
                # appended zeros sit past the data+halo: every col window
                # right of the image reads zeros, exactly SAME semantics
                x = jnp.pad(x, ((0, 0), (0, Wp - Ws), (0, 0)))
            padded.append(x)
            cp = x.shape[-1]
        else:
            cp = -(-x.shape[-1] // 128) * 128
            if Wp != Ws:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, Wp - Ws), (0, 0)))
            padded.append(prepad(x))
        weights_p.append(jnp.pad(w, ((0, 0), (0, cp - w.shape[1]), (0, 0))))
    wh = [w.astype(jnp.bfloat16) for w in weights_p]
    wl = [(w - w.astype(jnp.bfloat16).astype(jnp.float32)).astype(jnp.bfloat16)
          for w in weights_p]

    in_specs = ([pl.BlockSpec(memory_space=pl.ANY)] * n_in
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_in + 1))
    scratch = [pltpu.VMEM((T + 2, Wc + 16, x.shape[-1]), jnp.float32)
               for x in padded]
    scratch.append(pltpu.SemaphoreType.DMA((n_in,)))

    out = pl.pallas_call(
        functools.partial(_kernel, n_in, T, Wc, m, act, slope, passes),
        out_shape=jax.ShapeDtypeStruct((Hs, Wp, m), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, Wc, m), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*padded, *wh, *wl, sb)
    if Wp != Ws:
        out = out[:, :Ws]
    return out[None]


def maxpool2x2_from_s2d(xs, cout):
    """2x2 stride-2 maxpool of the ORIGINAL tensor, computed directly from
    its phase-major s2d form: the max over the 4 phases.  Returns NHWC
    (1, Hs, Ws, cout)."""
    B, Hs, Ws, _ = xs.shape
    return jnp.max(xs.reshape(B, Hs, Ws, 4, cout), axis=3)


def maxpool2x2_from_s2d_h(xs, cout):
    """2x2 stride-2 maxpool of the ORIGINAL tensor from its H-only s2d
    form (B, H/2, W, 2C): max over the py phases, then over col pairs.
    Returns NHWC (1, H/2, W/2, cout)."""
    B, Hs, W, _ = xs.shape
    x = jnp.max(xs.reshape(B, Hs, W, 2, cout), axis=3)
    return jnp.max(x.reshape(B, Hs, W // 2, 2, cout), axis=3)
