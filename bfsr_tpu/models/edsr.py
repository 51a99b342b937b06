"""EDSR encoder (reference: LINF-LP/models/edsr.py, from EDSR-PyTorch).

Functional NHWC: head conv3x3 -> n_resblocks x (conv-relu-conv, residual
scaled) -> tail conv3x3 + global skip.  With ``no_upsampling=True`` (the only
mode the LINF configs use, configs/train/*.yaml) the trunk features are the
output (out_dim = n_feats); otherwise a pixel-shuffle Upsampler + final conv
produce RGB.
"""

import functools

import jax

from bfsr_tpu.models.base import Model
from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.registry import register


def init_edsr(key, n_resblocks=16, n_feats=64, n_colors=3, scale=2, no_upsampling=True):
    keys = jax.random.split(key, n_resblocks * 2 + 8)
    p = {
        "head": fnn.init_conv(keys[0], 3, 3, n_colors, n_feats),
        "body": [
            {
                "conv1": fnn.init_conv(keys[1 + 2 * i], 3, 3, n_feats, n_feats),
                "conv2": fnn.init_conv(keys[2 + 2 * i], 3, 3, n_feats, n_feats),
            }
            for i in range(n_resblocks)
        ],
        "body_tail": fnn.init_conv(keys[1 + 2 * n_resblocks], 3, 3, n_feats, n_feats),
    }
    if not no_upsampling:
        ups = []
        k = 2 + 2 * n_resblocks
        if scale & (scale - 1) == 0:
            s = scale
            while s > 1:
                ups.append(fnn.init_conv(keys[k], 3, 3, n_feats, 4 * n_feats))
                k += 1
                s //= 2
        elif scale == 3:
            ups.append(fnn.init_conv(keys[k], 3, 3, n_feats, 9 * n_feats))
            k += 1
        else:
            raise NotImplementedError(scale)
        p["upsampler"] = ups
        p["tail"] = fnn.init_conv(keys[k], 3, 3, n_feats, n_colors)
    return p


def edsr_apply(params, x, res_scale=1.0, no_upsampling=True, scale=2):
    """x: (B, H, W, 3) -> features (B, H, W, n_feats) or RGB."""
    x = fnn.conv2d(x, params["head"])
    res = x
    for blk in params["body"]:
        h = fnn.relu(fnn.conv2d(res, blk["conv1"]))
        h = fnn.conv2d(h, blk["conv2"])
        res = res + h * res_scale
    res = fnn.conv2d(res, params["body_tail"])
    res = res + x
    if no_upsampling:
        return res
    for up in params["upsampler"]:
        res = fnn.pixel_shuffle(fnn.conv2d(res, up), 3 if scale == 3 else 2)
    return fnn.conv2d(res, params["tail"])


def edsr_apply_fused(params, x, res_scale=1.0):
    """Inference-only trunk with every conv in the H-only (1x2) s2d Pallas
    domain: XLA runs these <=64-out 3x3 convs at 3-17 TF/s on this chip,
    while 2*n_feats fills the 128 MXU lanes at only a 2x MAC trade.
    Residual adds stay in the s2d layout (elementwise).  Requires B=1,
    even H, no_upsampling; numerics = 3-pass bf16 == XLA HIGH."""
    from bfsr_tpu.ops.pallas import s2d_conv as s2d

    def conv(t, p, act=None):
        w = s2d.s2d_weight(p["w"], factors=(2, 1))
        return s2d.conv3x3_s2d([t], w, bias=p.get("b"), act=act, phases=2)

    xs = s2d.space_to_depth_h(x)
    h0 = conv(xs, params["head"])
    res = h0
    for blk in params["body"]:
        h = conv(res, blk["conv1"], act="relu")
        h = conv(h, blk["conv2"])
        res = res + h * res_scale
    res = conv(res, params["body_tail"])
    return s2d.depth_to_space_h(res + h0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _edsr_fused_diff(params, x, res_scale):
    """edsr_apply_fused with a VJP that runs the XLA form: pallas_call has
    no differentiation rule, and the two forms are numerically identical
    (3-pass bf16 == XLA HIGH), so grads through the fused encoder are the
    XLA path's grads."""
    return edsr_apply_fused(params, x, res_scale)


def _edsr_fused_fwd(params, x, res_scale):
    return edsr_apply_fused(params, x, res_scale), (params, x)


def _edsr_fused_bwd(res_scale, saved, g):
    params, x = saved
    _, vjp = jax.vjp(
        lambda p, xx: edsr_apply(p, xx, res_scale, no_upsampling=True), params, x)
    return vjp(g)


_edsr_fused_diff.defvjp(_edsr_fused_fwd, _edsr_fused_bwd)


class _EDSR(Model):
    def __init__(self, n_resblocks, n_feats, res_scale, scale, no_upsampling, rgb_range, name):
        super().__init__()
        self.registry_name = name
        self.args = dict(
            n_resblocks=n_resblocks, n_feats=n_feats, res_scale=res_scale,
            scale=scale, no_upsampling=no_upsampling, rgb_range=rgb_range,
        )
        self.n_resblocks = n_resblocks
        self.n_feats = n_feats
        self.res_scale = res_scale
        self.scale = scale
        self.no_upsampling = no_upsampling
        self.out_dim = n_feats if no_upsampling else 3
        self.params = init_edsr(
            jax.random.PRNGKey(0), n_resblocks, n_feats, 3, scale, no_upsampling
        )

    def apply(self, params, x, fused=None):
        if fused is None:
            # >=8 extent floor: tiny shapes are the documented Mosaic DMA
            # fault class (rrdb._use_s2d_trunk gates the same way); 8x8
            # LR is hardware-verified by selfcheck.py
            fused = (jax.default_backend() == "tpu" and self.no_upsampling
                     and x.shape[0] == 1 and x.shape[1] % 2 == 0
                     and x.shape[1] >= 8 and x.shape[2] >= 8
                     and self.n_feats <= 64)
        if fused:
            # differentiable wrapper: the Pallas forward has no VJP rule,
            # so the backward runs through the (numerically identical)
            # XLA form — the auto-enabled fused path stays safe under
            # jax.grad (every in-repo trainer stop_gradients the encoder,
            # but the public apply must not require knowing that)
            return _edsr_fused_diff(params, x, self.res_scale)
        return edsr_apply(params, x, self.res_scale, self.no_upsampling, self.scale)

    def __call__(self, x):
        return self.apply(self.params, x)


@register("edsr-baseline")
def make_edsr_baseline(n_resblocks=16, n_feats=64, res_scale=1, scale=2,
                       no_upsampling=False, rgb_range=1):
    return _EDSR(n_resblocks, n_feats, res_scale, scale, no_upsampling, rgb_range,
                 "edsr-baseline")


@register("edsr")
def make_edsr(n_resblocks=32, n_feats=256, res_scale=0.1, scale=2,
              no_upsampling=False, rgb_range=1):
    return _EDSR(n_resblocks, n_feats, res_scale, scale, no_upsampling, rgb_range, "edsr")
