"""SwinIR encoder (reference: LINF-LP/models/swinir.py, @'swinir').

Window-attention SR backbone used by the SwinIR-LINF variant.  The LINF
registry builds it with the default config (embed_dim 180, 6 RSTB layers of
depth 6, heads 6, window 8, mlp_ratio 2, upsampler='none' -> out_dim 64,
swinir.py:650-670,855-857).

Functional NHWC implementation.  Eval is the default (dropout/drop-path
identity — the reference notes drop_path has "no impact on SR results",
swinir.py:719, and its drop_rate/attn_drop_rate default to 0 so drop_path
is the only stochastic regularizer); training mode (`key=...`) applies
stochastic depth with the reference decay rule linspace(0,
drop_path_rate=0.1, sum(depths)) (swinir.py:653,705).  Inputs are
reflect-padded to a
window multiple and the padded feature map is returned, exactly like the
reference's check_image_size + 'none' path (swinir.py:790-821); the eval
harness generates query coords for the padded size (test.py:99-107).
"""

import numpy as np

import jax
import jax.numpy as jnp

from bfsr_tpu.models.base import Model
from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.registry import register


def layer_norm(x, p, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def init_layer_norm(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def drop_path(x, rate, key):
    """timm DropPath (stochastic depth): per-SAMPLE bernoulli keep mask on
    the residual branch, scaled by 1/keep (timm layers/drop.py, referenced
    from swinir.py:12,208).  Identity when rate==0 or key is None (eval)."""
    if key is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask.astype(x.dtype) / keep


def relative_position_index(ws):
    """(ws*ws, ws*ws) indices into the (2ws-1)^2 bias table
    (swinir.py:96-107)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def _window_reverse(windows, ws, B, H, W):
    C = windows.shape[-1]
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def _attn_mask(H, W, ws, shift):
    """(nW, ws*ws, ws*ws) 0/-100 mask for shifted windows
    (swinir.py:220-241).  Static (numpy) given static shapes."""
    img_mask = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, h, w, :] = cnt
            cnt += 1
    mw = img_mask.reshape(1, H // ws, ws, W // ws, ws, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    diff = mw[:, None, :] - mw[:, :, None]
    return jnp.asarray(np.where(diff != 0, -100.0, 0.0).astype(np.float32))


def window_attention(x, p, num_heads, rel_index, mask=None):
    """x: (B_, N, C); rel_index: (N, N) static."""
    B_, N, C = x.shape
    hd = C // num_heads
    qkv = fnn.linear(x, p["qkv"]).reshape(B_, N, 3, num_heads, hd)
    qkv = qkv.transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = q * (hd ** -0.5)
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                      preferred_element_type=jnp.float32,
                      precision=fnn.default_precision())
    bias = p["bias_table"][rel_index.reshape(-1)].reshape(N, N, num_heads)
    attn = attn + bias.transpose(2, 0, 1)[None]
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(B_ // nW, nW, num_heads, N, N) + mask[None, :, None]
        attn = attn.reshape(B_, num_heads, N, N)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                     preferred_element_type=jnp.float32,
                     precision=fnn.default_precision())
    out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
    return fnn.linear(out, p["proj"])


def swin_block(x_bhwc, p, num_heads, ws, shift, rel_index, dp_rate=0.0,
               key=None):
    """dp_rate/key: stochastic depth on both residuals
    (swinir.py:280-281); identity at the eval default."""
    B, H, W, C = x_bhwc.shape
    shortcut = x_bhwc
    x = layer_norm(x_bhwc, p["norm1"])
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = _attn_mask(H, W, ws, shift)
    else:
        mask = None
    windows = _window_partition(x, ws)
    attn = window_attention(windows, p["attn"], num_heads, rel_index, mask)
    x = _window_reverse(attn, ws, B, H, W)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    k1 = k2 = None
    if key is not None:
        k1, k2 = jax.random.split(key)
    x = shortcut + drop_path(x, dp_rate, k1)
    h = layer_norm(x, p["norm2"])
    h = fnn.linear(h, p["mlp_fc1"])
    h = jax.nn.gelu(h, approximate=False)
    h = fnn.linear(h, p["mlp_fc2"])
    return x + drop_path(h, dp_rate, k2)


def init_swin_block(key, dim, num_heads, ws, mlp_ratio):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    hidden = int(dim * mlp_ratio)
    table = jax.random.truncated_normal(k5, -2, 2, ((2 * ws - 1) ** 2, num_heads)) * 0.02
    return {
        "norm1": init_layer_norm(dim),
        "attn": {
            "qkv": fnn.init_linear(k1, dim, dim * 3),
            "proj": fnn.init_linear(k2, dim, dim),
            "bias_table": table.astype(jnp.float32),
        },
        "norm2": init_layer_norm(dim),
        "mlp_fc1": fnn.init_linear(k3, dim, hidden),
        "mlp_fc2": fnn.init_linear(k4, hidden, dim),
    }


def init_swinir(key, embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
                window_size=8, mlp_ratio=2.0, num_feat=64, in_chans=3,
                patch_norm=True):
    keys = iter(jax.random.split(key, sum(depths) + len(depths) + 8))
    p = {
        "conv_first": fnn.init_conv(next(keys), 3, 3, in_chans, embed_dim),
        "patch_norm": init_layer_norm(embed_dim) if patch_norm else None,
        "layers": [],
        "norm": init_layer_norm(embed_dim),
        "conv_after_body": fnn.init_conv(next(keys), 3, 3, embed_dim, embed_dim),
        "conv_before_upsample": fnn.init_conv(next(keys), 3, 3, embed_dim, num_feat),
    }
    for li, depth in enumerate(depths):
        blocks = [
            init_swin_block(next(keys), embed_dim, num_heads[li], window_size, mlp_ratio)
            for _ in range(depth)
        ]
        p["layers"].append({"blocks": blocks,
                            "conv": fnn.init_conv(next(keys), 3, 3, embed_dim, embed_dim)})
    return p


def swinir_encode(params, x, depths=(6,) * 6, num_heads=(6,) * 6,
                  window_size=8, key=None, drop_path_rate=0.1):
    """x: (B, H, W, 3) -> (B, Hp, Wp, num_feat) with Hp/Wp padded to a
    window multiple (reference 'none' upsampler path).

    key: training-mode PRNG for stochastic depth (None = eval/identity);
    per-block rates follow linspace(0, drop_path_rate, sum(depths))
    (swinir.py:705)."""
    ws = window_size
    B, h, w, _ = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
    H, W = x.shape[1], x.shape[2]

    feat = fnn.conv2d(x, params["conv_first"])
    rel_index = jnp.asarray(relative_position_index(ws))

    dpr = np.linspace(0.0, drop_path_rate, sum(depths))
    h_tokens = feat
    if params.get("patch_norm") is not None:
        h_tokens = layer_norm(h_tokens, params["patch_norm"])
    gi = 0
    for li, layer in enumerate(params["layers"]):
        res = h_tokens
        for bi, blk in enumerate(layer["blocks"]):
            shift = 0 if bi % 2 == 0 else ws // 2
            bkey = jax.random.fold_in(key, gi) if key is not None else None
            res = swin_block(res, blk, num_heads[li], ws, shift, rel_index,
                             dp_rate=float(dpr[gi]), key=bkey)
            gi += 1
        res = fnn.conv2d(res, layer["conv"])
        h_tokens = h_tokens + res
    h_tokens = layer_norm(h_tokens, params["norm"])

    deep = fnn.conv2d(h_tokens, params["conv_after_body"]) + feat
    out = fnn.leaky_relu(fnn.conv2d(deep, params["conv_before_upsample"]),
                         negative_slope=0.01)
    return out


@register("swinir")
class SwinIR(Model):
    registry_name = "swinir"

    def __init__(self, no_upsampling=True, embed_dim=180, depths=(6,) * 6,
                 num_heads=(6,) * 6, window_size=8, mlp_ratio=2.0, num_feat=64):
        super().__init__()
        self.args = dict(no_upsampling=no_upsampling)
        self.depths = tuple(depths)
        self.num_heads = tuple(num_heads)
        self.window_size = window_size
        self.out_dim = num_feat
        self.params = init_swinir(jax.random.PRNGKey(0), embed_dim, self.depths,
                                  self.num_heads, window_size, mlp_ratio, num_feat)

    def apply(self, params, x, training=False, key=None):
        """training=True with a key applies stochastic depth (reference
        drop_path_rate=0.1 decay rule); without a key it degrades to the
        deterministic path (matching eval semantics)."""
        return swinir_encode(params, x, self.depths, self.num_heads,
                             self.window_size,
                             key=key if training else None)

    def __call__(self, x):
        return self.apply(self.params, x)
