"""LINF: Local Implicit Normalizing Flow, pixel and patch variants.

Reference: LINF-LP/models/linf.py (both ``LINF`` @'linf' and ``LINFPatch``
@'linf-patch').  The model pipeline per query grid:

1. ``gen_feat`` — encoder features over the LR image.
2. Fourier head: two 3x3 convs produce per-LR-pixel coefficient/frequency
   fields; a bias-free linear maps the (relative) cell to a phase.
3. 4-corner local ensemble: each HR query gathers its nearest LR pixel under
   four half-cell diagonal shifts; relative coords scale the frequencies;
   cos/sin basis; area-swapped bilinear-style weights (linf.py:94-101).
4. A shared 1x1-conv MLP maps the concatenated features to the pointwise
   flow's per-layer affine parameters.
5. The pointwise flow runs forward (``query_log_p``: residual -> z, log_p)
   or inverse (``query_rgb``: z -> residual, plus bilinear-upsampled LR
   added back, linf.py:193-194).

TPU-first design vs the reference:

* Nearest-neighbour ``grid_sample`` of the feature-coordinate map is
  replaced by closed-form integer index math (the sampled "q_coord" is just
  the grid-center coordinate of the chosen LR pixel); only coef/freq need
  real gathers.
* The whole query pipeline (steps 3-5) is one fused jittable function over
  a static-shape query tile; eval tiles the HR grid in row blocks
  (reference row-chunks 256 rows in test.py:20-47).
* The MLP is expressed as dense matmuls over flattened queries — MXU work —
  rather than 1x1 convs.

All model params live in one pytree::

    {'encoder': ..., 'coef': conv3x3, 'freq': conv3x3, 'phase': linear,
     'mlp': [conv1x1...], 'imnet': pointwise-flow params}
"""

import math

import jax
import jax.numpy as jnp

from bfsr_tpu import registry
from bfsr_tpu.models.base import Model
from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.ops import pointwise_flow as pwf
from bfsr_tpu.ops.interp import grid_sample_bilinear
from bfsr_tpu.registry import register


def _nearest_index(coord, n):
    """Index of the LR pixel whose grid-center is nearest to ``coord``
    (one axis).  Equivalent to grid_sample(nearest, align_corners=False)
    on a make_coord feature map: unnormalize then round-half-even."""
    return jnp.clip(jnp.rint(((coord + 1.0) * n - 1.0) / 2.0).astype(jnp.int32), 0, n - 1)


def _gather_bhwc(maps, iy, ix):
    """maps: (B, h, w, C); iy/ix: (B, Hq, Wq) -> (B, Hq, Wq, C)."""
    return jax.vmap(lambda m, yy, xx: m[yy, xx])(maps, iy, ix)


def linf_affine_info(params, feat, coord, cell, hidden_dim):
    """Fourier head + local ensemble + MLP -> per-query affine params.

    feat: (B, h, w, C); coord: (B, Hq, Wq, 2) in (h, w) order;
    cell: (B, 2).  Returns (B, Hq, Wq, out_dim) f32.
    """
    B, h, w, _ = feat.shape
    coef = fnn.conv2d(feat, params["coef"])
    freq = fnn.conv2d(feat, params["freq"])

    rx = 1.0 / h  # 2 / h / 2
    ry = 1.0 / w
    eps_shift = 1e-6

    # phase from relative cell (shared across the 4 corners)
    rel_cell = cell * jnp.asarray([h, w], cell.dtype)
    phase = fnn.linear(rel_cell, params["phase"])  # (B, hidden/2)
    phase = phase.reshape(phase.shape[0], *(1,) * (coord.ndim - 2), phase.shape[-1])

    cy = coord[..., 0]
    cx = coord[..., 1]

    freqs, coefs, areas = [], [], []
    for vx in (-1, 1):
        for vy in (-1, 1):
            sy = jnp.clip(cy + vx * rx + eps_shift, -1 + 1e-6, 1 - 1e-6)
            sx = jnp.clip(cx + vy * ry + eps_shift, -1 + 1e-6, 1 - 1e-6)
            iy = _nearest_index(sy, h)
            ix = _nearest_index(sx, w)
            # grid-center coordinate of the selected LR pixel (closed form)
            qy = -1.0 + (2.0 * iy.astype(cy.dtype) + 1.0) / h
            qx = -1.0 + (2.0 * ix.astype(cx.dtype) + 1.0) / w
            rel_y = (cy - qy) * h
            rel_x = (cx - qx) * w

            coef_ = _gather_bhwc(coef, iy, ix)
            freq_ = _gather_bhwc(freq, iy, ix)

            # torch splits freq into 2 halves along channels and contracts
            # with (rel_y, rel_x) (linf.py:82-84)
            half = hidden_dim // 2
            f = freq_[..., :half] * rel_y[..., None] + freq_[..., half:] * rel_x[..., None]
            f = f + phase
            basis = jnp.concatenate([jnp.cos(math.pi * f), jnp.sin(math.pi * f)], axis=-1)

            freqs.append(basis)
            coefs.append(coef_)
            areas.append(jnp.abs(rel_y * rel_x) + 1e-9)

    tot_area = areas[0] + areas[1] + areas[2] + areas[3]
    # diagonal-opposite area swap (linf.py:95-96)
    areas = [areas[3], areas[2], areas[1], areas[0]]

    feats = [
        (areas[i] / tot_area)[..., None] * coefs[i] * freqs[i] for i in range(4)
    ]
    features = jnp.concatenate(feats, axis=-1)  # (B, ..., hidden*4)
    # shared MLP over flattened queries — dense MXU matmuls
    return _mlp_apply(params, features)


def _mlp_apply(params, features):
    lead = features.shape[:-1]
    x = features.reshape(-1, features.shape[-1])
    n_mlp = len(params["mlp"])
    for i, lp in enumerate(params["mlp"]):
        x = fnn.linear(x, lp)
        if i < n_mlp - 1:
            x = fnn.relu(x)
    return x.reshape(*lead, -1)


def _mlp_apply_cm(params, features, pad_rows):
    """MLP with a channel-major final matmul: (..., hidden*4) ->
    (pad_rows, N).  The output rows beyond the true out-dim are zero —
    sized for the Pallas flow kernels' (64, N) layout so no transpose or
    pad touches the 60-row affine-info stream."""
    x = features.reshape(-1, features.shape[-1])
    n_mlp = len(params["mlp"])
    for lp in params["mlp"][:-1]:
        x = fnn.relu(fnn.linear(x, lp))
    last = params["mlp"][-1]
    out_dim = last["w"].shape[-1]
    w = jnp.pad(last["w"], ((0, 0), (0, pad_rows - out_dim)))
    b = jnp.pad(last["b"], (0, pad_rows - out_dim))
    out_cm = jnp.einsum("nc,co->on", x, w, preferred_element_type=jnp.float32,
                        precision=fnn.default_precision())
    return out_cm + b[:, None]


def linf_affine_info_grid(params, feat, coord_y, coord_x, cell, hidden_dim,
                          channel_major_rows=0, fast_sincos=False):
    """Separable fast path for *regular* query grids.

    coord_y: (B, Hq) per-row height coords; coord_x: (B, Wq) per-column
    width coords (valid whenever coord[b,i,j,0] varies only with i and
    coord[b,i,j,1] only with j — true for every make_coord-derived grid the
    eval paths use).  The 4-corner lookups become two axis slice-gathers
    per map instead of a 2-D gather — near-streaming HBM traffic on TPU.

    fast_sincos: compute the Fourier basis with the Pallas info kernel's
    polynomial sincos (~11 VPU cycles/elem vs the native transcendental
    sequence's ~29; max err ~1e-7) — opt-in so the default eval path's
    numerics/compile-cache keys stay bit-stable.
    """
    B, h, w, _ = feat.shape
    coef = fnn.conv2d(feat, params["coef"])
    freq = fnn.conv2d(feat, params["freq"])

    rx = 1.0 / h
    ry = 1.0 / w
    eps_shift = 1e-6
    half = hidden_dim // 2

    rel_cell = cell * jnp.asarray([h, w], cell.dtype)
    phase = fnn.linear(rel_cell, params["phase"])  # (B, half)
    phase = phase[:, None, None, :]

    feats = [None] * 4
    areas = [None] * 4
    idx = 0
    pieces = []
    for vx in (-1, 1):
        for vy in (-1, 1):
            sy = jnp.clip(coord_y + vx * rx + eps_shift, -1 + 1e-6, 1 - 1e-6)
            sx = jnp.clip(coord_x + vy * ry + eps_shift, -1 + 1e-6, 1 - 1e-6)
            iy = _nearest_index(sy, h)  # (B, Hq)
            ix = _nearest_index(sx, w)  # (B, Wq)
            qy = -1.0 + (2.0 * iy.astype(coord_y.dtype) + 1.0) / h
            qx = -1.0 + (2.0 * ix.astype(coord_x.dtype) + 1.0) / w
            rel_y = (coord_y - qy) * h  # (B, Hq)
            rel_x = (coord_x - qx) * w  # (B, Wq)

            def axis_gather(m, iy, ix):
                # (B,h,w,C) -> (B,Hq,Wq,C) via two slice-gathers
                rows = jax.vmap(lambda mm, yy: mm[yy])(m, iy)
                return jax.vmap(lambda mm, xx: mm[:, xx])(rows, ix)

            coef_ = axis_gather(coef, iy, ix)
            freq_ = axis_gather(freq, iy, ix)

            f = (freq_[..., :half] * rel_y[:, :, None, None]
                 + freq_[..., half:] * rel_x[:, None, :, None])
            f = f + phase
            if fast_sincos:
                from bfsr_tpu.ops.pallas.linf_info import _sincos_pi

                cf, sf = _sincos_pi(f)
            else:
                cf, sf = jnp.cos(math.pi * f), jnp.sin(math.pi * f)
            basis = jnp.concatenate([cf, sf], axis=-1)
            area = jnp.abs(rel_y[:, :, None] * rel_x[:, None, :]) + 1e-9
            pieces.append((coef_, basis, area))
            idx += 1

    tot_area = pieces[0][2] + pieces[1][2] + pieces[2][2] + pieces[3][2]
    swapped = [pieces[3][2], pieces[2][2], pieces[1][2], pieces[0][2]]
    feats = [
        (swapped[i] / tot_area)[..., None] * pieces[i][0] * pieces[i][1]
        for i in range(4)
    ]
    features = jnp.concatenate(feats, axis=-1)
    if channel_major_rows:
        return _mlp_apply_cm(params, features, channel_major_rows)
    return _mlp_apply(params, features)


def init_linf(key, encoder_init, encoder_out_dim, flow_layers=10, num_layer=3,
              hidden_dim=256, patch_size=1):
    keys = jax.random.split(key, num_layer + 6)
    d = 3 * patch_size * patch_size
    mlp = [fnn.init_conv(keys[0], 1, 1, hidden_dim * 4, hidden_dim)]
    for i in range(num_layer - 1):
        mlp.append(fnn.init_conv(keys[1 + i], 1, 1, hidden_dim, hidden_dim))
    mlp.append(fnn.init_conv(keys[num_layer], 1, 1, hidden_dim, flow_layers * d * 2))
    # 1x1 convs == linears over the channel dim: store as linear params
    mlp = [{"w": p["w"][0, 0], "b": p["b"]} for p in mlp]
    return {
        "encoder": encoder_init,
        "mlp": mlp,
        "coef": fnn.init_conv(keys[num_layer + 1], 3, 3, encoder_out_dim, hidden_dim),
        "freq": fnn.init_conv(keys[num_layer + 2], 3, 3, encoder_out_dim, hidden_dim),
        "phase": fnn.init_linear(keys[num_layer + 3], 2, hidden_dim // 2, bias=False),
        "imnet": pwf.init_pointwise_flow(keys[num_layer + 4], flow_layers, patch_size),
    }


class _LINFBase(Model):
    def __init__(self, encoder_spec, imnet_spec=None, flow_layers=10, num_layer=3,
                 hidden_dim=256, patch_size=1):
        super().__init__()
        self.args = dict(encoder_spec=encoder_spec, imnet_spec=imnet_spec,
                         flow_layers=flow_layers, num_layer=num_layer,
                         hidden_dim=hidden_dim)
        if patch_size != 1:
            self.args["patch_size"] = patch_size
        self.encoder = registry.make(encoder_spec)
        self.flow_layers = flow_layers
        self.hidden_dim = hidden_dim
        self.num_layer = num_layer
        self.patch_size = patch_size
        self.dim = 3 * patch_size * patch_size
        self.params = init_linf(
            jax.random.PRNGKey(0), self.encoder.params, self.encoder.out_dim,
            flow_layers, num_layer, hidden_dim, patch_size,
        )

    # -- pure functions ---------------------------------------------------

    def gen_feat(self, params, inp):
        """inp: (B, H, W, 3) normalized LR -> features."""
        return self.encoder.apply(params["encoder"], inp)

    def query_log_p(self, params, inp, feat, coord, cell, gt):
        """gt: (B, Hq, Wq, d) residual target -> (log_p (B*Hq*Wq,), z map).

        Mirrors linf.py:40-114 but NHWC and gather-based.
        """
        info = linf_affine_info(params, feat, coord, cell, self.hidden_dim)
        lead = info.shape[:-1]
        flat_n = 1
        for s in lead:
            flat_n *= s
        z, log_p = pwf.forward(
            params["imnet"], gt.reshape(-1, self.dim), info.reshape(flat_n, -1)
        )
        return log_p, z.reshape(*lead, self.dim)

    def query_residual(self, params, inp, feat, coord, cell, temperature=0.0,
                       zmap=None, key=None):
        """Flow inverse only: per-query residual (B, ..., d).

        coord may have any query shape (B, ..., 2); zmap (B, ..., d) or
        None (zeros when key is None, else N(0, temperature^2) samples —
        temperature may be a traced scalar).
        """
        info = linf_affine_info(params, feat, coord, cell, self.hidden_dim)
        lead = info.shape[:-1]
        n = 1
        for s in lead[1:]:
            n *= s
        flat_n = lead[0] * n
        if zmap is None:
            if key is None:
                z = jnp.zeros((flat_n, self.dim), jnp.float32)
            else:
                z = jax.random.normal(key, (flat_n, self.dim)) * temperature
        else:
            z = zmap.reshape(-1, self.dim)
        pred = pwf.inverse(params["imnet"], z, info.reshape(flat_n, -1))
        return pred.reshape(*lead, self.dim)

    def query_log_p_grid(self, params, inp, feat, coord, cell, gt):
        """query_log_p via the separable-grid info fast path.

        Valid ONLY for regular rank-4 coord grids where coord[b,i,j,0]
        varies with i alone and coord[b,i,j,1] with j alone — true for
        every make_coord-derived (sub-)grid the -fast training wrappers
        emit (contiguous crops of a regular grid stay separable; the
        patch model's padded center coords do NOT qualify).  The 4-corner
        2-D gathers of `linf_affine_info` become two axis slice-gathers
        per map (the documented fast class on this chip); measured 3.2 ms
        faster per train step at b16 48^2 x2, parity 7e-7
        (profiling/latent_encode_probe.py)."""
        info = linf_affine_info_grid(params, feat, coord[:, :, 0, 0],
                                     coord[:, 0, :, 1], cell,
                                     self.hidden_dim)
        lead = info.shape[:-1]
        flat_n = 1
        for s in lead:
            flat_n *= s
        z, log_p = pwf.forward(
            params["imnet"], gt.reshape(-1, self.dim), info.reshape(flat_n, -1)
        )
        return log_p, z.reshape(*lead, self.dim)

    def query_rgb(self, params, inp, feat, coord, cell, temperature=0.0, zmap=None,
                  key=None):
        """zmap: (B, Hq, Wq, d) learned latent (or None -> sample).

        Returns the predicted residual-plus-LR image (pixel model) or the
        raw folded patch residual (patch model adds LR residual outside,
        test.py:161).
        """
        pred = self.query_residual(params, inp, feat, coord, cell, temperature,
                                   zmap, key)
        if self.patch_size == 1:
            lr_up = grid_sample_bilinear(inp, coord, padding_mode="border")
            return pred + lr_up
        return self._fold(pred)

    def _fold(self, pred):
        """(B, Hq, Wq, 3*ps^2) -> (B, Hq*ps, Wq*ps, 3), torch F.fold channel
        order (c, ky, kx) (linf.py:401-406)."""
        ps = self.patch_size
        B, Hq, Wq, _ = pred.shape
        x = pred.reshape(B, Hq, Wq, 3, ps, ps)
        x = x.transpose(0, 1, 4, 2, 5, 3)  # B, Hq, ky, Wq, kx, 3
        return x.reshape(B, Hq * ps, Wq * ps, 3)

    # -- reference-style op dispatch (linf.py:205-216) --------------------

    def __call__(self, op, inp=None, feat=None, coord=None, cell=None, gt=None,
                 temperature=0.0, zmap=None, key=None):
        p = self.params
        if op == "gen_feat":
            return self.gen_feat(p, inp)
        if op == "query_log_p":
            return self.query_log_p(p, inp, feat, coord, cell, gt)
        if op == "query_rgb":
            return self.query_rgb(p, inp, feat, coord, cell, temperature, zmap, key)
        if op == "log_p":
            feat = self.gen_feat(p, inp)
            return self.query_log_p(p, inp, feat, coord, cell, gt)
        if op == "rgb":
            feat = self.gen_feat(p, inp)
            return self.query_rgb(p, inp, feat, coord, cell, temperature, zmap, key)
        raise ValueError(op)

    def freeze(self):
        """Cache flow inverses for frozen inference/training-the-prior."""
        self.params = dict(self.params)
        self.params["imnet"] = pwf.cache_inverses(self.params["imnet"])
        return self


@register("linf")
class LINF(_LINFBase):
    registry_name = "linf"

    def __init__(self, encoder_spec, imnet_spec=None, flow_layers=10, num_layer=3,
                 hidden_dim=256):
        super().__init__(encoder_spec, imnet_spec, flow_layers, num_layer, hidden_dim, 1)


@register("linf-patch")
class LINFPatch(_LINFBase):
    registry_name = "linf-patch"

    def __init__(self, encoder_spec, imnet_spec=None, flow_layers=10, num_layer=3,
                 hidden_dim=256, patch_size=3):
        super().__init__(encoder_spec, imnet_spec, flow_layers, num_layer, hidden_dim,
                         patch_size)
