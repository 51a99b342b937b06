"""Swin-Transformer latent module (reference:
LINF-LP/models/swin_transformer.py:497-631, @'swin_latent').

DenseBlock z/LR projections (each embed_dim=96) -> concat (192ch, NHWC) ->
4 BasicLayers (depths [2,2,6,2], heads [3,6,12,24], window 7, constant dim;
the reference's Downsample/Upsample ctor args are dead code — BasicLayer
never calls them) -> LayerNorm -> 1x1 conv head back to in_chans.

Faithful quirks:
* each block pads itself to a window multiple and crops after
  (swin_transformer.py:327-375),
* the *layer-level* shifted-window mask is applied to every block in the
  layer, including unshifted ones (BasicLayer.forward:480-484 passes
  attn_mask unconditionally) — replicated for checkpoint parity,
* training mode applies stochastic depth with the reference's decay rule
  (timm DropPath per residual, rates linspace(0, drop_path_rate=0.1,
  sum(depths)) — swin_transformer.py:316,374-377,541): per-sample
  bernoulli keep mask scaled by 1/keep, threaded through a PRNG key.
"""

import numpy as np

import jax
import jax.numpy as jnp

from bfsr_tpu.models.base import Model
from bfsr_tpu.models.swinir import (
    layer_norm,
    init_layer_norm,
    relative_position_index,
    window_attention,
    init_swin_block,
    drop_path,
    _window_partition,
    _window_reverse,
)
from bfsr_tpu.models.unet import init_dense_block5c, dense_block5c
from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.ops.interp import resize_bilinear
from bfsr_tpu.registry import register

DEPTHS = (2, 2, 6, 2)
NUM_HEADS = (3, 6, 12, 24)


def _layer_mask(H, W, ws, shift):
    """Shifted-window mask at the padded (Hp, Wp) size
    (swin_transformer.py:456-476)."""
    Hp = int(np.ceil(H / ws)) * ws
    Wp = int(np.ceil(W / ws)) * ws
    img_mask = np.zeros((Hp, Wp), np.float32)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[h, w] = cnt
            cnt += 1
    mw = img_mask.reshape(Hp // ws, ws, Wp // ws, ws)
    mw = mw.transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = mw[:, None, :] - mw[:, :, None]
    return jnp.asarray(np.where(diff != 0, -100.0, 0.0).astype(np.float32))


def _latent_block(x, p, num_heads, ws, shift, rel_index, attn_mask,
                  dp_rate=0.0, key=None):
    """Pad-to-window, (shift), window attention with the layer mask, crop
    (swin_transformer.py:322-378).  dp_rate/key: stochastic depth on both
    residuals (:374-377)."""
    B, H, W, C = x.shape
    shortcut = x
    x = layer_norm(x, p["norm1"])
    pad_b = (ws - H % ws) % ws
    pad_r = (ws - W % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    Hp, Wp = x.shape[1], x.shape[2]
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    windows = _window_partition(x, ws)
    attn = window_attention(windows, p["attn"], num_heads, rel_index, attn_mask)
    x = _window_reverse(attn, ws, B, Hp, Wp)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = x[:, :H, :W]
    k1 = k2 = None
    if key is not None:
        k1, k2 = jax.random.split(key)
    x = shortcut + drop_path(x, dp_rate, k1)
    h = layer_norm(x, p["norm2"])
    h = fnn.linear(h, p["mlp_fc1"])
    h = jax.nn.gelu(h, approximate=False)
    h = fnn.linear(h, p["mlp_fc2"])
    return x + drop_path(h, dp_rate, k2)


def init_swin_latent(key, in_chans, embed_dim=96, window_size=7, mlp_ratio=4.0):
    dim = embed_dim * 2
    keys = iter(jax.random.split(key, sum(DEPTHS) + 10))
    p = {
        "input_proj": init_dense_block5c(next(keys), in_chans, embed_dim, embed_dim),
        "lr_proj_conv": fnn.init_conv(next(keys), 3, 3, 3, in_chans),
        "lr_proj_dense": init_dense_block5c(next(keys), in_chans, embed_dim, embed_dim),
        "layers": [],
        "norm": init_layer_norm(dim),
        "head": [
            fnn.init_conv(next(keys), 1, 1, dim, dim // 2),
            fnn.init_conv(next(keys), 1, 1, dim // 2, dim // 4),
            fnn.init_conv(next(keys), 1, 1, dim // 4, in_chans),
        ],
    }
    for li, depth in enumerate(DEPTHS):
        p["layers"].append({
            "blocks": [
                init_swin_block(next(keys), dim, NUM_HEADS[li], window_size, mlp_ratio)
                for _ in range(depth)
            ]
        })
    return p


def swin_latent_apply(params, z, lr, window_size=7, key=None,
                      drop_path_rate=0.1):
    """z: (B, H, W, in_chans); lr: (B, h, w, 3) -> (B, H, W, in_chans).

    key: training-mode PRNG for stochastic depth (None = eval/identity);
    per-block rates follow the reference decay rule
    linspace(0, drop_path_rate, sum(depths)) (swin_transformer.py:541)."""
    ws = window_size
    dpr = np.linspace(0.0, drop_path_rate, sum(DEPTHS))
    x = dense_block5c(z, params["input_proj"])
    lr_embed = fnn.leaky_relu(fnn.conv2d(lr, params["lr_proj_conv"], stride=3, padding=1))
    lr_embed = dense_block5c(lr_embed, params["lr_proj_dense"])
    if lr_embed.shape[1:3] != x.shape[1:3]:
        lr_embed = resize_bilinear(lr_embed, x.shape[1:3], align_corners=False)
    x = jnp.concatenate([x, lr_embed], -1)

    H, W = x.shape[1], x.shape[2]
    rel_index = jnp.asarray(relative_position_index(ws))
    shift = ws // 2
    mask = _layer_mask(H, W, ws, shift)
    gi = 0
    for li, layer in enumerate(params["layers"]):
        for bi, blk in enumerate(layer["blocks"]):
            b_shift = 0 if bi % 2 == 0 else shift
            bkey = (jax.random.fold_in(key, gi) if key is not None else None)
            x = _latent_block(x, blk, NUM_HEADS[li], ws, b_shift, rel_index,
                              mask, dp_rate=float(dpr[gi]), key=bkey)
            gi += 1
    x = layer_norm(x, params["norm"])
    x = fnn.leaky_relu(fnn.conv2d(x, params["head"][0]))
    x = fnn.leaky_relu(fnn.conv2d(x, params["head"][1]))
    return fnn.conv2d(x, params["head"][2])


@register("swin_latent")
class SwinLatent(Model):
    registry_name = "swin_latent"

    def __init__(self, in_chans, inp_size=None, window_size=7):
        super().__init__()
        self.args = dict(in_chans=in_chans, inp_size=inp_size, window_size=window_size)
        self.window_size = window_size
        self.params = init_swin_latent(jax.random.PRNGKey(0), in_chans,
                                       window_size=window_size)

    def apply(self, params, z, lr, training=False, key=None):
        """training=True with a key applies stochastic depth (reference
        drop_path_rate=0.1); without a key it degrades to the
        deterministic path (matching eval semantics)."""
        out = swin_latent_apply(params, z, lr, self.window_size,
                                key=key if training else None)
        return (out, {}) if training else out

    def __call__(self, z, lr):
        return self.apply(self.params, z, lr)
