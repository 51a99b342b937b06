"""SRFlow flow steps in the 2x2 space-to-depth domain.

The level-1 flow of SRFlow (reference FlowUpsamplerNet.py:267-296 runs
K=16 coupling steps at (H/2)^2 with C=12) wastes 116/128 MXU/VPU lanes on
this chip.  Carrying the state as its phase-major space-to-depth form —
(H/4)^2 spatial, 4C=48 channels — makes every op in the step 4x wider at
a quarter of the positions:

* actnorm: per-channel params tile 4x (the pixel-count x channel-tile
  factors cancel in the log-det, which stays exact),
* invconv 1x1: a per-phase block-diagonal matmul,
* coupling convs: the exact s2d 3x3 weight transform
  (``ops.pallas.s2d_conv.s2d_weight``) turns each into a same-math conv at
  quarter resolution with 4x the output channels,
* squeeze to the next level: a pure channel permutation (squeeze2d's
  channel-major (c, fy, fx) nesting vs s2d's phase-major (p, c) order) —
  no data movement beyond one relayout.

Everything is plain XLA (works on any backend); log-dets and outputs match
the NHWC path to float tolerance.  Used by the cached eval path
(``flow_upsampler.encode/decode`` when the ft cache is marked s2d).
"""

import jax
import jax.numpy as jnp

from bfsr_tpu.ops import flows
from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.ops.pallas.s2d_conv import (depth_to_space, s2d_weight,
                                          space_to_depth)

to_s2d = space_to_depth
from_s2d = depth_to_space


def _tile(v):
    return jnp.tile(v, 4)


def _per_phase(x4, c):
    B, h, w, _ = x4.shape
    return x4.reshape(B, h, w, 4, c)


def _flat(r):
    B, h, w, p, c = r.shape
    return r.reshape(B, h, w, p * c)


def squeeze_to_next_level(x4):
    """s2d level state (B, h, w, 4C) -> the NHWC state squeeze2d would
    produce at the same resolution: channel reorder (p, c) -> (c, p)."""
    c = x4.shape[-1] // 4
    return _flat(_per_phase(x4, c).swapaxes(-1, -2).reshape(
        x4.shape[:3] + (c, 4)))


def unsqueeze_from_next_level(x):
    """Inverse of :func:`squeeze_to_next_level`."""
    B, h, w, c4 = x.shape
    c = c4 // 4
    return _flat(x.reshape(B, h, w, c, 4).swapaxes(-1, -2))


def conv2d_s2d(x4, w, b=None):
    """Exact 3x3 SAME conv in the s2d domain.  x4: (B, h, w, 4Ci);
    w: (3, 3, Ci, Co) original-domain weights -> (B, h, w, 4Co)."""
    taps = s2d_weight(w)[0]  # (9, 4Ci, 4Co)
    k = taps.reshape(3, 3, taps.shape[1], taps.shape[2])
    y = fnn.conv2d(x4, {"w": k})
    if b is not None:
        y = y + _tile(b)
    return y


def actnorm(x4, p, logdet=None, reverse=False):
    # sum(tiled logs) * (pixels/4) == sum(logs) * pixels: logdet exact
    pt = {"bias": _tile(p["bias"]), "logs": _tile(p["logs"])}
    return flows.actnorm(x4, pt, logdet, reverse)


def invconv1x1(x4, p, logdet=None, reverse=False):
    c = p["w"].shape[0]
    w = p["w"].astype(jnp.float32)
    if "logabsdet" in p:
        dlog = p["logabsdet"].astype(jnp.float32)
    else:
        dlog = jnp.linalg.slogdet(w)[1]
    if reverse:
        w = p.get("w_inv")
        if w is None:
            w = jnp.linalg.inv(p["w"].astype(jnp.float32))
    r = _per_phase(x4, c)
    y = jnp.einsum("bhwpi,oi->bhwpo", r, w.astype(jnp.float32),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    if logdet is not None:
        d = dlog * (x4.shape[1] * x4.shape[2] * 4)
        logdet = logdet + (-d if reverse else d)
    return _flat(y).astype(x4.dtype), logdet


def an_invconv_fused(x4, p, logdet=None, reverse=False):
    """Folded actnorm+invconv on s2d state (``flows.fold_actnorm_invconv``):
    one per-phase matmul + bias, constant log-det."""
    c = p["w_fold"].shape[0]
    w = p["w_inv_fold"] if reverse else p["w_fold"]
    r = _per_phase(x4, c)
    y = jnp.einsum("bhwpi,oi->bhwpo", r, w.astype(jnp.float32),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    y = y - p["an_bias"] if reverse else y + p["b_fold"]
    if logdet is not None:
        d = p["logabsdet_fold"].astype(jnp.float32) * (
            x4.shape[1] * x4.shape[2] * 4)
        logdet = logdet + (-d if reverse else d)
    return _flat(y).astype(x4.dtype), logdet


def _split_channels(x4, c, c_nn):
    r = _per_phase(x4, c)
    return _flat(r[..., :c_nn]), _flat(r[..., c_nn:])


def _cat_channels(a4, b4, ca, cb):
    r = jnp.concatenate([_per_phase(a4, ca), _per_phase(b4, cb)], axis=-1)
    return _flat(r)


def _scale_shift(h4, eps=flows.AFFINE_EPS):
    c2 = h4.shape[-1] // 4
    r = _per_phase(h4, c2)
    shift, scale = r[..., 0::2], r[..., 1::2]  # 'cross' split, per phase
    scale = jax.nn.sigmoid(_flat(scale) + 2.0) + eps
    return scale, _flat(shift)


def _an_relu(y4, an):
    y4 = (y4 + _tile(an["bias"])) * jnp.exp(_tile(an["logs"]))
    return fnn.relu(y4)


def _flow_f_split(z1_4, p, aff1_ft4):
    """``flows.flow_f_split`` in the s2d domain (cached eval path only)."""
    w = p["conv1"]["w"]
    c_nn = z1_4.shape[-1] // 4
    y = conv2d_s2d(z1_4, w[:, :, :c_nn, :]) + aff1_ft4
    h = _an_relu(y, p["conv1"]["actnorm"])
    # conv2 is 1x1 (kernel_hidden=1): per-phase matmul
    w2 = p["conv2"]["w"]
    h = jnp.einsum("bhwpi,io->bhwpo", _per_phase(h, w2.shape[2]), w2[0, 0],
                   preferred_element_type=jnp.float32,
                   precision=fnn.default_precision())
    h = fnn.relu((h + p["conv2"]["actnorm"]["bias"])
                 * jnp.exp(p["conv2"]["actnorm"]["logs"]))
    o = conv2d_s2d(_flat(h), p["out"]["w"], b=p["out"]["b"])
    return o * jnp.exp(_tile(p["out"]["logs"]) * 3.0)


def cond_affine(x4, p, logdet=None, reverse=False, ft_params=None):
    """``flows.cond_affine`` on s2d state; requires an s2d ft cache."""
    c = x4.shape[-1] // 4
    c_nn = c // 2

    def faffine(z1_4):
        return _scale_shift(_flow_f_split(z1_4, p["fAffine"],
                                          ft_params["aff1_ft"]))

    scale_ft, shift_ft = ft_params["scale_ft"], ft_params["shift_ft"]
    logdet_ft = ft_params.get("logdet_ft")
    if not reverse:
        z = (x4 + shift_ft) * scale_ft
        if logdet is not None:
            logdet = logdet + (logdet_ft if logdet_ft is not None
                               else flows._sum_log(scale_ft))
        z1, z2 = _split_channels(z, c, c_nn)
        scale, shift = faffine(z1)
        z2 = (z2 + shift) * scale
        if logdet is not None:
            logdet = logdet + flows._sum_log(scale)
        return _cat_channels(z1, z2, c_nn, c - c_nn), logdet
    z1, z2 = _split_channels(x4, c, c_nn)
    scale, shift = faffine(z1)
    z2 = z2 / scale - shift
    z = _cat_channels(z1, z2, c_nn, c - c_nn)
    if logdet is not None:
        logdet = logdet - flows._sum_log(scale)
    z = z / scale_ft - shift_ft
    if logdet is not None:
        logdet = logdet - (logdet_ft if logdet_ft is not None
                           else flows._sum_log(scale_ft))
    return z, logdet


def step_forward(x4, p, logdet, cond, ft_params=None):
    if "anic" in p:
        x4, logdet = an_invconv_fused(x4, p["anic"], logdet)
    else:
        x4, logdet = actnorm(x4, p["actnorm"], logdet)
        x4, logdet = invconv1x1(x4, p["invconv"], logdet)
    if cond:
        x4, logdet = cond_affine(x4, p["affine"], logdet, ft_params=ft_params)
    return x4, logdet


def step_reverse(x4, p, logdet, cond, ft_params=None):
    if cond:
        x4, logdet = cond_affine(x4, p["affine"], logdet, reverse=True,
                                 ft_params=ft_params)
    if "anic" in p:
        x4, logdet = an_invconv_fused(x4, p["anic"], logdet, reverse=True)
    else:
        x4, logdet = invconv1x1(x4, p["invconv"], logdet, reverse=True)
        x4, logdet = actnorm(x4, p["actnorm"], logdet, reverse=True)
    return x4, logdet


def _conv_zeros(x4, p):
    y = conv2d_s2d(x4, p["w"], b=p["b"])
    return y * jnp.exp(_tile(p["logs"]) * 3.0)


def split2d(x4, p, logdet, reverse=False, eps=None, eps_std=None, key=None,
            consume_ratio=0.5):
    """``flows.split2d`` on s2d state (ft-less, as used by SRFlow).
    eps is exchanged in NHWC layout (the prior consumes/produces NHWC)."""
    c = x4.shape[-1] // 4
    if not reverse:
        n_consume = int(round(c * consume_ratio))
        n_pass = c - n_consume
        z1, z2 = _split_channels(x4, c, n_pass)
        h = _conv_zeros(z1, p["conv"])
        mean4, logs4 = _scale_shift_raw(h)
        out_eps = (z2 - mean4) / jnp.exp(logs4)
        if logdet is not None:
            logdet = logdet + flows.gaussian_logp(z2, mean4, logs4)
        return z1, logdet, from_s2d(out_eps)
    z1 = x4
    h = _conv_zeros(z1, p["conv"])
    mean4, logs4 = _scale_shift_raw(h)
    if eps is None:
        if key is None:
            # keyless heat-0 decode (see flows.split2d): zero eps, no RNG
            if eps_std:
                raise ValueError("split2d reverse with eps_std > 0 needs a "
                                 "PRNG key (or explicit eps)")
            eps4 = jnp.zeros(mean4.shape, mean4.dtype)
        else:
            eps4 = jax.random.normal(key, mean4.shape, mean4.dtype) * (
                eps_std if eps_std is not None else 1.0)
    else:
        eps4 = to_s2d(eps)
    z2 = mean4 + jnp.exp(logs4) * eps4
    n_pass = z1.shape[-1] // 4
    z = _cat_channels(z1, z2, n_pass, mean4.shape[-1] // 4)
    if logdet is not None:
        logdet = logdet - flows.gaussian_logp(z2, mean4, logs4)
    return z, logdet, None


def _scale_shift_raw(h4):
    """split_feature 'cross' per phase, no sigmoid (split2d prior)."""
    c2 = h4.shape[-1] // 4
    r = _per_phase(h4, c2)
    return _flat(r[..., 0::2]), _flat(r[..., 1::2])


def _nearest_phase_kernels(w, a, b):
    """Effective 2x2 base-domain kernel of ``conv3x3(nearest2x(.))`` for HR
    phase (a, b), plus the conv padding that aligns it.

    1-D: out(2i+a) = sum_dy W[dy] * s(floor((2i+a+dy)/2)); a=0 hits base
    rows (i-1, i) with weights (W[-1], W[0]+W[1]); a=1 hits (i, i+1) with
    (W[-1]+W[0], W[1]).  Exact including borders (zero padding maps to
    zero padding)."""
    def taps(wk, ph):  # wk: (3, ...) over dy; returns (2, ...), pad pair
        if ph == 0:
            return jnp.stack([wk[0], wk[1] + wk[2]]), (1, 0)
        return jnp.stack([wk[0] + wk[1], wk[2]]), (0, 1)

    ky, pad_y = taps(w, a)                      # (2, 3, Ci, Co)
    k, pad_x = taps(jnp.swapaxes(ky, 0, 1), b)  # (2, 2, Ci, Co) [x, y]
    return jnp.swapaxes(k, 0, 1), (pad_y, pad_x)


def _composed_phase_kernel(wu, wa, a, b):
    """3x3 base-domain kernel of ``conv3x3(conv3x3(nearest2x(.), wu), wa)``
    for HR phase (a, b) — interior-exact (borders are patched separately).

    Base tap t = floor((phase + dy + ey) / 2) in {-1, 0, 1} for the two
    kernel offsets dy (outer conv) and ey (inner conv)."""
    comp = jnp.einsum("abim,cdmo->acbdio", wu, wa,
                      preferred_element_type=jnp.float32)  # ey,dy,ex,dx,i,o
    rows = {ph: [[] for _ in range(3)] for ph in (0, 1)}
    for ph in (0, 1):
        for e in (-1, 0, 1):
            for d in (-1, 0, 1):
                rows[ph][(ph + e + d) // 2 + 1].append((e + 1, d + 1))
    k = [[None] * 3 for _ in range(3)]
    for ty in range(3):
        for tx in range(3):
            k[ty][tx] = sum(
                comp[ey, dy, ex, dx]
                for (ey, dy) in rows[a][ty] for (ex, dx) in rows[b][tx])
    return jnp.stack([jnp.stack(r) for r in k])  # (3, 3, Ci, Co)


def cond_affine_cache_batched_nearest(base, stack, upconv, ps):
    """Level-1 conditioning caches computed at BASE resolution in the s2d
    phase domain.

    The level-1 conditioning map (SRFlowNet_arch.py:118-138 via
    rrdb_preprocess) is ``concat([conv3x3(nearest2x(base), upconv),
    nearest2x(stack)])`` at 2h x 2w.  Both halves are derived from h x w
    maps, so the batched conv1 stack (fFeatures.conv1 + fAffine ft slices,
    320 -> 128K channels) folds into base-resolution convs:

    * stack part: exact per-phase 2x2 convs (2.25x fewer MACs, quarter
      the positions),
    * fea_up2 part: per-phase composed 3x3 convs (same MACs, quarter
      positions, no giant transposes); the 1-px HR border ring, where
      kernel composition differs from the sequential zero-padded convs,
      is recomputed exactly from 4-wide strips and overwritten.

    Outputs are s2d-layout caches for the fs2d step path — numerically
    matching ``flows.cond_affine_cache`` per step.  base: (1, h, w, Ci);
    stack: (1, h, w, Cs); upconv: {'w','b'} of rrdb upconv1."""
    n = len(ps)
    hid = ps[0]["fFeatures"]["conv1"]["w"].shape[-1]
    c_a = base.shape[-1]
    c_ft = c_a + stack.shape[-1]
    w1 = jnp.concatenate(
        [p["fFeatures"]["conv1"]["w"] for p in ps]
        + [p["fAffine"]["conv1"]["w"][:, :, -c_ft:, :] for p in ps], axis=-1)
    w_a, w_b = w1[:, :, :c_a], w1[:, :, c_a:]
    wu, bu = upconv["w"], upconv.get("b")

    # interior constant from upconv's bias passing through the outer taps
    c0 = jnp.einsum("i,yxio->o", bu, w_a) if bu is not None else 0.0

    # exact fea_up2 (small: Ci channels at 2h x 2w) for the border strips
    a_up = jnp.concatenate([
        jnp.concatenate([_phase_conv_nearest(base, wu, a, b)
                         for b in (0, 1)], axis=-1)
        for a in (0, 1)], axis=-1)  # s2d layout (1, h, w, 4Ci)
    a_full = from_s2d(a_up)
    if bu is not None:
        a_full = a_full + bu

    # exact ring values of the sequential conv3x3(a_full) (4-wide strips)
    conv_a = lambda x: fnn.conv2d(x, {"w": w_a})
    top = conv_a(a_full[:, :4])[:, 0]       # (1, 2w, M) — HR row 0
    bot = conv_a(a_full[:, -4:])[:, -1]     # HR row 2h-1
    left = conv_a(a_full[:, :, :4])[:, :, 0]    # (1, 2h, M) — HR col 0
    right = conv_a(a_full[:, :, -4:])[:, :, -1]  # HR col 2w-1

    # lax.conv runs ~2x below the matmul rate at these tiny-spatial /
    # huge-channel shapes: express the phase convs as im2col matmuls.
    # All 4 composed-A phases share one im2col (same input taps).
    m = w1.shape[-1]
    hb, wb_ = base.shape[1], base.shape[2]
    ka_all = jnp.concatenate(
        [_composed_phase_kernel(wu, w_a, a, b).reshape(9 * c_a, m)
         for a in (0, 1) for b in (0, 1)], axis=-1)  # (9ca, 4m)
    pb_ = jnp.pad(base, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [pb_[:, dy:dy + hb, dx:dx + wb_] for dy in range(3) for dx in range(3)],
        axis=-1)
    ya_all = jnp.einsum("bhwk,ko->bhwo", cols, ka_all,
                        preferred_element_type=jnp.float32,
                        precision=fnn.default_precision())
    ps_ = jnp.pad(stack, ((0, 0), (1, 1), (1, 1), (0, 0)))

    ys = []
    for q, (a, b) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        ya = ya_all[..., q * m:(q + 1) * m] + c0
        # overwrite the border ring (composition is interior-exact only)
        if a == 0:
            ya = ya.at[:, 0].set(top[:, b::2])
        else:
            ya = ya.at[:, -1].set(bot[:, b::2])
        if b == 0:
            ya = ya.at[:, :, 0].set(left[:, a::2])
        else:
            ya = ya.at[:, :, -1].set(right[:, a::2])
        kb, (pad_y, pad_x) = _nearest_phase_kernels(w_b, a, b)
        oy, ox = pad_y[1], pad_x[1]  # padding (1,0) <-> offset 0; (0,1) <-> 1
        cols_b = jnp.concatenate(
            [ps_[:, oy + u:oy + u + hb, ox + v:ox + v + wb_]
             for u in range(2) for v in range(2)], axis=-1)
        yb = jnp.einsum("bhwk,ko->bhwo", cols_b,
                        kb.reshape(4 * stack.shape[-1], m),
                        preferred_element_type=jnp.float32,
                        precision=fnn.default_precision())
        ys.append(ya + yb)

    # ---- per-step tails (fFeatures tower + cache assembly), s2d native
    hh = jnp.stack([y[..., : n * hid] for y in ys], axis=-2)  # (1,h,w,4,n*hid)
    B, h, w = hh.shape[:3]
    hh = hh.reshape(B, h, w, 4, n, hid)
    an1_b = jnp.stack([p["fFeatures"]["conv1"]["actnorm"]["bias"] for p in ps])
    an1_s = jnp.stack([p["fFeatures"]["conv1"]["actnorm"]["logs"] for p in ps])
    hh = fnn.relu((hh + an1_b) * jnp.exp(an1_s))
    w2 = jnp.stack([p["fFeatures"]["conv2"]["w"][0, 0] for p in ps])
    hh = jnp.einsum("bhwqnc,ncd->bhwqnd", hh, w2,
                    preferred_element_type=jnp.float32,
                    precision=fnn.default_precision())
    an2_b = jnp.stack([p["fFeatures"]["conv2"]["actnorm"]["bias"] for p in ps])
    an2_s = jnp.stack([p["fFeatures"]["conv2"]["actnorm"]["logs"] for p in ps])
    hh = fnn.relu((hh + an2_b) * jnp.exp(an2_s))

    caches = []
    for s in range(n):
        h_s2d = hh[..., s, :].reshape(B, h, w, 4 * hid)
        po = ps[s]["fFeatures"]["out"]
        c2 = po["w"].shape[-1]
        c2p = -(-c2 // 32) * 32  # pad to a 128-lane s2d output
        o = conv2d_s2d(h_s2d, jnp.pad(po["w"], ((0, 0),) * 3 + ((0, c2p - c2),)))
        o = _flat(_per_phase(o, c2p)[..., :c2]) + _tile(po["b"])
        o = o * jnp.exp(_tile(po["logs"]) * 3.0)
        scale_ft, shift_ft = _scale_shift(o)
        aff1 = jnp.concatenate(
            [y[..., (n + s) * hid:(n + s + 1) * hid] for y in ys], axis=-1)
        caches.append({"scale_ft": scale_ft, "shift_ft": shift_ft,
                       "aff1_ft": aff1,
                       "logdet_ft": flows._sum_log(scale_ft)})
    return caches


def _phase_conv(x, k, pads):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), pads, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=fnn.default_precision()).astype(x.dtype)


def _phase_conv_nearest(x, w, a, b):
    return _phase_conv(x, *_nearest_phase_kernels(w, a, b))


def cache_to_s2d(cache):
    """Convert a NHWC ``cond_affine_cache`` dict to the s2d layout (layout
    is detected from shapes downstream — no marker leaf: it would trace)."""
    out = {"scale_ft": to_s2d(cache["scale_ft"]),
           "shift_ft": to_s2d(cache["shift_ft"]),
           "aff1_ft": to_s2d(cache["aff1_ft"])}
    if "logdet_ft" in cache:
        out["logdet_ft"] = cache["logdet_ft"]
    return out
