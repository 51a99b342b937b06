"""RDN encoder (Residual Dense Network; reference: LINF-LP/models/rdn.py).

Config A: 20 blocks x 6 conv layers, growth 32; config B: 16 x 8, growth 64.
``no_upsampling`` exposes G0-channel features for LINF.
"""

import jax
import jax.numpy as jnp

from bfsr_tpu.models.base import Model
from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.registry import register

_CONFIGS = {"A": (20, 6, 32), "B": (16, 8, 64)}


def init_rdn(key, g0=64, ksize=3, config="B", scale=2, no_upsampling=True, n_colors=3):
    d, c, g = _CONFIGS[config]
    keys = iter(jax.random.split(key, d * (c + 1) + 8))
    p = {
        "sfe1": fnn.init_conv(next(keys), ksize, ksize, n_colors, g0),
        "sfe2": fnn.init_conv(next(keys), ksize, ksize, g0, g0),
        "rdbs": [
            {
                "convs": [
                    fnn.init_conv(next(keys), ksize, ksize, g0 + i * g, g)
                    for i in range(c)
                ],
                "lff": fnn.init_conv(next(keys), 1, 1, g0 + c * g, g0),
            }
            for _ in range(d)
        ],
        "gff1": fnn.init_conv(next(keys), 1, 1, d * g0, g0),
        "gff2": fnn.init_conv(next(keys), ksize, ksize, g0, g0),
    }
    if not no_upsampling:
        up = []
        if scale in (2, 3):
            up.append(fnn.init_conv(next(keys), ksize, ksize, g0, g * scale * scale))
            up.append(fnn.init_conv(next(keys), ksize, ksize, g, n_colors))
        elif scale == 4:
            up.append(fnn.init_conv(next(keys), ksize, ksize, g0, g * 4))
            up.append(fnn.init_conv(next(keys), ksize, ksize, g, g * 4))
            up.append(fnn.init_conv(next(keys), ksize, ksize, g, n_colors))
        else:
            raise ValueError("scale must be 2, 3 or 4")
        p["upnet"] = up
    return p


def rdn_apply(params, x, config="B", scale=2, no_upsampling=True):
    f1 = fnn.conv2d(x, params["sfe1"])
    h = fnn.conv2d(f1, params["sfe2"])
    outs = []
    for rdb in params["rdbs"]:
        inp = h
        for conv in rdb["convs"]:
            out = fnn.relu(fnn.conv2d(inp, conv))
            inp = jnp.concatenate([inp, out], -1)
        h = fnn.conv2d(inp, rdb["lff"]) + h
        outs.append(h)
    h = fnn.conv2d(jnp.concatenate(outs, -1), params["gff1"])
    h = fnn.conv2d(h, params["gff2"]) + f1
    if no_upsampling:
        return h
    up = params["upnet"]
    if scale in (2, 3):
        h = fnn.pixel_shuffle(fnn.conv2d(h, up[0]), scale)
        return fnn.conv2d(h, up[1])
    h = fnn.pixel_shuffle(fnn.conv2d(h, up[0]), 2)
    h = fnn.pixel_shuffle(fnn.conv2d(h, up[1]), 2)
    return fnn.conv2d(h, up[2])


@register("rdn")
class RDN(Model):
    registry_name = "rdn"

    def __init__(self, G0=64, RDNkSize=3, RDNconfig="B", scale=2, no_upsampling=False):
        super().__init__()
        self.args = dict(G0=G0, RDNkSize=RDNkSize, RDNconfig=RDNconfig, scale=scale,
                         no_upsampling=no_upsampling)
        self.config = RDNconfig
        self.scale = scale
        self.no_upsampling = no_upsampling
        self.out_dim = G0 if no_upsampling else 3
        self.params = init_rdn(jax.random.PRNGKey(0), G0, RDNkSize, RDNconfig, scale,
                               no_upsampling)

    def apply(self, params, x):
        return rdn_apply(params, x, self.config, self.scale, self.no_upsampling)

    def __call__(self, x):
        return self.apply(self.params, x)
