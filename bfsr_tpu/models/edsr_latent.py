"""EDSR-style latent module (reference: LINF-LP/models/edsr_latent.py,
@'edsr-baseline-latent').  DenseBlock input/LR projections (each dim/2) ->
concat -> n_resblocks x (conv-lrelu-conv residual) -> 1x1 out conv."""

import jax
import jax.numpy as jnp

from bfsr_tpu.models.base import Model
from bfsr_tpu.models.unet import init_dense_block5c, dense_block5c
from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.ops.interp import resize_bilinear
from bfsr_tpu.registry import register


def init_edsr_latent(key, in_chans, n_resblocks=16, dim=64):
    keys = iter(jax.random.split(key, n_resblocks * 2 + 6))
    return {
        "input_proj": init_dense_block5c(next(keys), in_chans, dim // 2, dim // 2),
        "lr_proj_conv": fnn.init_conv(next(keys), 3, 3, 3, in_chans),
        "lr_proj_dense": init_dense_block5c(next(keys), in_chans, dim // 2, dim // 2),
        "body": [
            {
                "conv1": fnn.init_conv(next(keys), 3, 3, dim, dim),
                "conv2": fnn.init_conv(next(keys), 3, 3, dim, dim),
            }
            for _ in range(n_resblocks)
        ],
        "last_conv": fnn.init_conv(next(keys), 1, 1, dim, in_chans),
    }


def edsr_latent_apply(params, z, lr, res_scale=1.0):
    x = dense_block5c(z, params["input_proj"])
    lr_embed = fnn.leaky_relu(fnn.conv2d(lr, params["lr_proj_conv"], stride=3, padding=1))
    lr_embed = dense_block5c(lr_embed, params["lr_proj_dense"])
    if lr_embed.shape[1:3] != x.shape[1:3]:
        lr_embed = resize_bilinear(lr_embed, x.shape[1:3], align_corners=False)
    x = jnp.concatenate([x, lr_embed], -1)
    for blk in params["body"]:
        h = fnn.leaky_relu(fnn.conv2d(x, blk["conv1"]))
        h = fnn.conv2d(h, blk["conv2"])
        x = x + h * res_scale
    return fnn.conv2d(x, params["last_conv"])


@register("edsr-baseline-latent")
class EDSRLatent(Model):
    registry_name = "edsr-baseline-latent"

    def __init__(self, in_chans, n_resblocks=16, dim=64, res_scale=1, scale=2, rgb_range=1):
        super().__init__()
        self.args = dict(in_chans=in_chans, n_resblocks=n_resblocks, dim=dim,
                         res_scale=res_scale, scale=scale, rgb_range=rgb_range)
        self.res_scale = res_scale
        self.params = init_edsr_latent(jax.random.PRNGKey(0), in_chans, n_resblocks, dim)

    def apply(self, params, z, lr, training=False, key=None):
        out = edsr_latent_apply(params, z, lr, self.res_scale)
        return (out, {}) if training else out

    def __call__(self, z, lr):
        return self.apply(self.params, z, lr)
