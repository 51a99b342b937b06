"""Two-branch UNet prior for SRFlow-LP (reference:
SRFlow-LP/code/models/unet.py, registered 'unet' in its own registry).

Branch 0 processes eps0 (6ch, H/2); branch 1 processes the final latent
(96ch, H/8); both are depth-3 UNets over DenseBlock projections (no LR-image
input, unlike the LINF flavor).  Registered here as 'srflow-unet' since our
registry is shared across both stacks.
"""

import jax

from bfsr_tpu.models.base import Model
from bfsr_tpu.models.unet import (
    init_dense_block5c,
    dense_block5c_scatter,
    init_double_conv,
    double_conv,
    _up_merge,
)
from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.registry import register


def _init_branch(key, in_out_ch, depth, dim, bilinear=True):
    factor = 2 if bilinear else 1
    keys = iter(jax.random.split(key, depth * 2 + 4))
    p = {
        "input_proj": init_dense_block5c(next(keys), in_out_ch, dim, dim),
        "inc": init_double_conv(next(keys), dim, dim),
        "down": [],
        "up": [],
        "outc": fnn.init_conv(next(keys), 1, 1, dim, in_out_ch),
    }
    for i in range(depth):
        cout = dim * (2 ** (i + 1))
        if i == depth - 1:
            cout //= factor
        p["down"].append(init_double_conv(next(keys), dim * (2 ** i), cout))
    for i in range(depth):
        cin = dim * (2 ** (depth - i))
        cout = dim * (2 ** (depth - i - 1))
        if i < depth - 1:
            cout //= factor
        p["up"].append(init_double_conv(next(keys), cin, cout, mid=cin // 2))
    return p


def _branch_apply(params, z, depth, training, bn_updates, prefix):
    # scatter form: measured faster than the narrow gather
    # convs at this branch's 256^2/64^2 extents
    x = dense_block5c_scatter(z, params["input_proj"])
    feats = []
    x = double_conv(x, params["inc"], training, bn_updates, prefix + ("inc",))
    feats.append(x)
    for i, dp in enumerate(params["down"]):
        x = fnn.max_pool2d(x, 2)
        x = double_conv(x, dp, training, bn_updates, prefix + ("down", i))
        feats.append(x)
    for i, up in enumerate(params["up"]):
        x = _up_merge(x, feats[depth - 1 - i], up, training, bn_updates, prefix + ("up", i))
    return fnn.conv2d(x, params["outc"])


def srflow_unet_apply(params, epses, depth=3, training=False):
    """epses: [eps0 (B,h0,w0,6), z (B,h1,w1,96)] -> learned [z0, z1]."""
    bn_updates = {}
    z0 = _branch_apply(params["branch0"], epses[0], depth, training, bn_updates, ("branch0",))
    z1 = _branch_apply(params["branch1"], epses[1], depth, training, bn_updates, ("branch1",))
    if training:
        return [z0, z1], bn_updates
    return [z0, z1]


@register("srflow-unet")
class SRFlowUNet(Model):
    registry_name = "srflow-unet"

    def __init__(self, depth=3, dim=64, bilinear=True, ch0=6, ch1=96):
        super().__init__()
        self.args = dict(depth=depth, dim=dim, bilinear=bilinear, ch0=ch0, ch1=ch1)
        self.depth = depth
        k0, k1 = jax.random.split(jax.random.PRNGKey(0))
        self.params = {
            "branch0": _init_branch(k0, ch0, depth, dim, bilinear),
            "branch1": _init_branch(k1, ch1, depth, dim, bilinear),
        }

    def apply(self, params, epses, training=False):
        return srflow_unet_apply(params, epses, self.depth, training)

    def __call__(self, epses):
        return self.apply(self.params, epses)
