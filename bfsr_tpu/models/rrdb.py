"""RRDBNet (ESRGAN trunk) — one implementation, two personalities.

* LINF encoder flavor (reference: LINF-LP/models/rrdb.py): ``no_upsampling``
  returns trunk features (out_dim = nf).
* SRFlow conditioning flavor (reference:
  SRFlow-LP/code/models/modules/RRDBNet_arch.py): ``get_steps=True`` also
  returns per-block taps and the multi-scale ``fea_up*`` dict that feeds the
  flow's conditional couplings (incl. the 0.5x/0.25x bilinear down-scales
  ``fea_up0``/``fea_up-1``).
"""

import os

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from bfsr_tpu.models.base import Model
from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.ops.interp import resize_nearest, resize_bilinear
from bfsr_tpu.ops.pallas import s2d_conv as s2d
from bfsr_tpu.registry import register


def _init_dense_block(key, nf, gc, gain=0.1):
    ks = jax.random.split(key, 5)
    cins = [nf, nf + gc, nf + 2 * gc, nf + 3 * gc, nf + 4 * gc]
    couts = [gc, gc, gc, gc, nf]
    return {
        f"conv{i+1}": fnn.init_conv(ks[i], 3, 3, cins[i], couts[i], mode="xavier_normal", gain=gain)
        for i in range(5)
    }


def _dense_block(x, p, mask=None):
    """Scatter-form dense block (reference RRDBNet_arch.py ResidualDenseBlock
    order: 5 narrow gather convs over growing concats).  Mathematically the
    same sums, reassociated: each produced tensor does ONE wide conv to all
    of its future consumers (x->192ch, x1->160, ..., x4->64) instead of
    contributing to up to 5 narrow 32-out convs — <=64-out convs run at
    3-17 TF/s on this chip vs ~40 at >=128 out (CLAUDE.md).  Each wide conv
    is 9 accumulated shifted matmuls (im2col materialization is
    bandwidth-bound; lax.conv lowers ~1.4x slower at these shapes).

    mask: batch-to-space halo mask (see _trunk_scan) — re-zeroes the
    1-px tile rings before every conv so the mosaic-plane conv is
    exactly the per-image SAME-pad conv (ring outputs are cross-tile
    garbage and get re-zeroed before the next conv)."""
    nf = p["conv1"]["w"].shape[2]
    gc = p["conv1"]["w"].shape[3]
    couts = [gc, gc, gc, gc, nf]
    cins = [nf, gc, gc, gc, gc]
    offs = [0, nf, nf + gc, nf + 2 * gc, nf + 3 * gc]
    # source tensor j feeds convs j+1..5: one weight of shape (3,3,Cj,Nj)
    ws = [jnp.concatenate(
        [p[f"conv{k+1}"]["w"][:, :, offs[j]:offs[j] + cins[j], :]
         for k in range(j, 5)], axis=-1) for j in range(5)]
    bs = [p[f"conv{k+1}"].get("b") for k in range(5)]

    acc = [None] * 5  # pre-activation accumulator of conv k

    def spread(j, y):
        off = 0
        for k in range(j, 5):
            v = y[..., off:off + couts[k]]
            acc[k] = v if acc[k] is None else acc[k] + v
            off += couts[k]

    spread(0, fnn.conv3x3_y3(x if mask is None else x * mask, ws[0]))
    for j in range(1, 5):
        t = acc[j - 1] if bs[j - 1] is None else acc[j - 1] + bs[j - 1]
        # name the pre-activations so the training remat policy can save
        # them (no-op identity otherwise): with these saved, the block
        # backward recomputes only pad/concat glue, never the forward
        # matmuls (see _trunk_scan)
        t = checkpoint_name(t, "rrdb_act")
        a = fnn.leaky_relu(t)
        spread(j, fnn.conv3x3_y3(a if mask is None else a * mask, ws[j]))
    x5 = acc[4] if bs[4] is None else acc[4] + bs[4]
    x5 = checkpoint_name(x5, "rrdb_act")
    return x5 * 0.2 + x


def _rrdb_block(x, p, mask=None):
    out = _dense_block(x, p["rdb1"], mask)
    out = _dense_block(out, p["rdb2"], mask)
    out = _dense_block(out, p["rdb3"], mask)
    return out * 0.2 + x


def _b2s_plan(shape):
    """Batch-to-space plan for small-extent multi-image trunks: pack the
    B images into one plane of (H+2)x(W+2) tiles with a 1-px zero ring
    each.  The trunk convs then run at a large extent (b12 40^2: fwd
    10.6 -> ~14 TF/s, bwd 1.55x — profiling/trunk_train_form_probe.py
    --b2s-only; output is bit-exact because rings are re-zeroed before
    every conv).  Returns (pack, unpack, mask); MAC overhead is
    (H+2)(W+2)/HW (~10% at 40^2) + one mask multiply per conv."""
    import numpy as np

    b, h, w = shape[0], shape[1], shape[2]
    cols = int(np.ceil(np.sqrt(b)))
    rows = -(-b // cols)
    th, tw = h + 2, w + 2
    m = np.zeros((rows * th, cols * tw, 1), np.float32)
    for r in range(rows):
        for c in range(cols):
            m[r * th + 1: r * th + th - 1, c * tw + 1: c * tw + tw - 1] = 1.0
    mask = jnp.asarray(m)[None]

    def pack(x):
        ch = x.shape[-1]
        y = jnp.pad(x, ((0, rows * cols - b), (1, 1), (1, 1), (0, 0)))
        y = y.reshape(rows, cols, th, tw, ch).transpose(0, 2, 1, 3, 4)
        return y.reshape(1, rows * th, cols * tw, ch)

    def unpack(y):
        ch = y.shape[-1]
        z = y.reshape(y.shape[:-4] + (rows, th, cols, tw, ch))
        z = jnp.moveaxis(z, -3, -4)  # rows, cols, th, tw, ch
        z = z.reshape(y.shape[:-4] + (rows * cols, th, tw, ch))
        return z[..., :b, 1:-1, 1:-1, :]

    return pack, unpack, mask


def _use_b2s_trunk(x):
    """Gate the batch-to-space trunk: multi-image batches at small
    extents (the training regime; measured b12 40^2).  B=1 eval extents
    already run at the form ceiling.  BFSR_RRDB_B2S=0 disables."""
    if os.environ.get("BFSR_RRDB_B2S", "1") == "0":
        return False
    return x.shape[0] >= 4 and x.shape[1] <= 64 and x.shape[2] <= 64


def _trunk_scan(trunk_params, fea, mask=None):
    """Run the 23 identical RRDB blocks as a lax.scan: one compiled block
    body instead of 23 unrolled copies (the scatter-form block is ~135
    matmul ops; unrolling all blocks made XLA compiles take minutes).
    Returns (trunk_out, per_block_outputs stacked on axis 0).  mask:
    batch-to-space halo mask threaded to every conv (see _b2s_plan)."""
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                     *trunk_params)

    # remat each block under autodiff: the half-im2col buffers (3C wide)
    # otherwise get saved per scan step for backward — 23 x ~430 MB blew
    # HBM at the reference train config (batch 12, GT 160).  Free for
    # forward-only eval.  Remat mode (BFSR_RRDB_REMAT, read at trace
    # time):
    #   acts (default) — save only the named "rrdb_act" pre-activations
    #     (~15 MB/dense-block, ~1 GB over the 23-step scan): the block
    #     backward then recomputes only lrelu/pad/concat glue, never the
    #     forward matmuls.
    #   full — plain jax.checkpoint (recompute the whole block forward);
    #     the minimum-memory fallback.
    blk = _rrdb_block if mask is None else (
        lambda x, p: _rrdb_block(x, p, mask))
    if os.environ.get("BFSR_RRDB_REMAT", "acts") == "acts":
        ckpt_fn = jax.checkpoint(
            blk,
            policy=jax.checkpoint_policies.save_only_these_names("rrdb_act"))
    else:
        ckpt_fn = jax.checkpoint(blk)

    def body(t, bp):
        t2 = ckpt_fn(t, bp)
        return t2, t2

    return jax.lax.scan(body, fea, stacked)


def _trunk_scan_b2s(trunk_params, fea):
    """Batch-to-space trunk scan: (trunk_out unpacked, packed per-block
    outputs + their unpack fn) — taps are unpacked lazily by the caller
    so unused blocks cost nothing."""
    pack, unpack, mask = _b2s_plan(fea.shape)
    t, ys = _trunk_scan(trunk_params, pack(fea), mask)
    return unpack(t), ys, unpack


# -- space-to-depth Pallas trunk (B=1 TPU inference) -------------------------
#
# Every dense-block conv has <=64 output channels (gc=32 / nf=64): the
# 3-17 TF/s narrow-conv regime on this chip.  conv3x3_s2d computes them in
# the 2x2 space-to-depth domain (4*Cout >= 128 output lanes) and takes the
# dense block's channel concats as free input lists.  The whole trunk stays
# in the s2d layout; only the ends convert.


def _dense_block_s2d(xs, p, interpret=False):
    """xs: (1, Hs, Ws, 4nf) unpadded s2d.  Each produced tensor is
    prepadded ONCE into the kernel layout (it feeds up to 4 later convs)."""
    nf = p["conv1"]["w"].shape[2]
    gc = p["conv1"]["w"].shape[3]

    def conv(inputs, cp, k, act):
        split = [nf] + [gc] * (k - 1)
        w = s2d.s2d_weight(cp["w"], cin_split=split)
        return s2d.conv3x3_s2d(inputs, w, bias=cp.get("b"), act=act,
                               interpret=interpret)

    xp = s2d.prepad(xs)
    x1 = s2d.prepad(conv([xp], p["conv1"], 1, "lrelu"))
    x2 = s2d.prepad(conv([xp, x1], p["conv2"], 2, "lrelu"))
    x3 = s2d.prepad(conv([xp, x1, x2], p["conv3"], 3, "lrelu"))
    x4 = conv([xp, x1, x2, x3], p["conv4"], 4, "lrelu")
    x5 = conv([xp, x1, x2, x3, s2d.prepad(x4)], p["conv5"], 5, None)
    return x5 * 0.2 + xs


def _trunk_s2d(params, fea, interpret=False):
    """fea (1, H, W, nf) -> last_lr_fea-style trunk output, s2d inside."""
    xs = s2d.space_to_depth(fea)
    t = xs
    for blk in params["trunk"]:
        o = _dense_block_s2d(t, blk["rdb1"], interpret)
        o = _dense_block_s2d(o, blk["rdb2"], interpret)
        o = _dense_block_s2d(o, blk["rdb3"], interpret)
        t = o * 0.2 + t
    w = s2d.s2d_weight(params["trunk_conv"]["w"])
    trunk = s2d.conv3x3_s2d([t], w, bias=params["trunk_conv"].get("b"),
                            interpret=interpret)
    return s2d.depth_to_space(xs + trunk)


def _use_s2d_trunk(x, fast):
    # OPT-IN (fast=True): the scatter-form XLA trunk (now the default
    # path) measured 35.3 ms at 128^2 vs ~57 for both the narrow XLA
    # order and this dense-s2d Pallas chain.  Kept for the passes=1
    # serving mode, where the 4x-MAC single-pass bf16 trade differs.
    if fast is None:
        fast = False
    # tiny spatial extents fault Mosaic DMA on hardware (selfcheck's 4x4
    # smoke shapes); real SRFlow/LINF LR inputs are >=64^2
    return (fast and x.shape[0] == 1
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
            and x.shape[1] >= 32 and x.shape[2] >= 32)


def init_rrdb(key, in_nc=3, out_nc=3, nf=64, nb=23, gc=32, scale=4, upsampling=True):
    keys = jax.random.split(key, nb + 10)
    p = {
        "conv_first": fnn.init_conv(keys[0], 3, 3, in_nc, nf),
        "trunk": [
            {
                "rdb1": _init_dense_block(jax.random.fold_in(keys[1 + i], 0), nf, gc),
                "rdb2": _init_dense_block(jax.random.fold_in(keys[1 + i], 1), nf, gc),
                "rdb3": _init_dense_block(jax.random.fold_in(keys[1 + i], 2), nf, gc),
            }
            for i in range(nb)
        ],
        "trunk_conv": fnn.init_conv(keys[nb + 1], 3, 3, nf, nf),
    }
    if upsampling:
        p["upconv1"] = fnn.init_conv(keys[nb + 2], 3, 3, nf, nf)
        p["upconv2"] = fnn.init_conv(keys[nb + 3], 3, 3, nf, nf)
        k = nb + 4
        if scale >= 8:
            p["upconv3"] = fnn.init_conv(keys[k], 3, 3, nf, nf); k += 1
        if scale >= 16:
            p["upconv4"] = fnn.init_conv(keys[k], 3, 3, nf, nf); k += 1
        if scale >= 32:
            p["upconv5"] = fnn.init_conv(keys[k], 3, 3, nf, nf); k += 1
        p["hr_conv"] = fnn.init_conv(keys[k], 3, 3, nf, nf)
        p["conv_last"] = fnn.init_conv(keys[k + 1], 3, 3, nf, out_nc)
    return p


def rrdb_encode(params, x, fast=None):
    """LINF encoder mode: trunk features only (rrdb.py:105-111)."""
    fea = fnn.conv2d(x, params["conv_first"])
    if _use_s2d_trunk(x, fast):
        return _trunk_s2d(params, fea)
    if _use_b2s_trunk(fea):
        t, _, _ = _trunk_scan_b2s(params["trunk"], fea)
    else:
        t, _ = _trunk_scan(params["trunk"], fea)
    trunk = fnn.conv2d(t, params["trunk_conv"])
    return fea + trunk


def rrdb_apply_steps(params, x, scale=4, block_idxs=(), fea_up0=False, fea_upm1=False,
                     fast=None, interpret=False):
    """SRFlow conditioning mode: dict of per-block taps + fea_up* pyramid
    (RRDBNet_arch.py:89-148)."""
    lrelu = fnn.leaky_relu
    fea = fnn.conv2d(x, params["conv_first"])
    block_results = {}
    if interpret or _use_s2d_trunk(x, fast):
        xs = s2d.space_to_depth(fea)
        t = xs
        for idx, blk in enumerate(params["trunk"]):
            o = _dense_block_s2d(t, blk["rdb1"], interpret)
            o = _dense_block_s2d(o, blk["rdb2"], interpret)
            o = _dense_block_s2d(o, blk["rdb3"], interpret)
            t = o * 0.2 + t
            if idx in block_idxs:
                block_results[f"block_{idx}"] = s2d.depth_to_space(t)
        w = s2d.s2d_weight(params["trunk_conv"]["w"])
        trunk_s = s2d.conv3x3_s2d([t], w, bias=params["trunk_conv"].get("b"),
                                  interpret=interpret)
        last_lr_fea = s2d.depth_to_space(xs + trunk_s)
    elif _use_b2s_trunk(fea):
        t, ys, unpack = _trunk_scan_b2s(params["trunk"], fea)
        for idx in block_idxs:
            block_results[f"block_{idx}"] = unpack(ys[idx])
        trunk = fnn.conv2d(t, params["trunk_conv"])
        last_lr_fea = fea + trunk
    else:
        t, ys = _trunk_scan(params["trunk"], fea)
        for idx in block_idxs:
            block_results[f"block_{idx}"] = ys[idx]
        trunk = fnn.conv2d(t, params["trunk_conv"])
        last_lr_fea = fea + trunk

    h, w = x.shape[1], x.shape[2]
    fea_up2 = fnn.conv2d(resize_nearest(last_lr_fea, (h * 2, w * 2)), params["upconv1"])
    f = lrelu(fea_up2)
    fea_up4 = fnn.conv2d(resize_nearest(f, (h * 4, w * 4)), params["upconv2"])
    f = lrelu(fea_up4)
    results = {
        "last_lr_fea": last_lr_fea,
        "fea_up1": last_lr_fea,
        "fea_up2": fea_up2,
        "fea_up4": fea_up4,
    }
    if scale >= 8:
        fea_up8 = fnn.conv2d(resize_nearest(f, (h * 8, w * 8)), params["upconv3"])
        f = lrelu(fea_up8)
        results["fea_up8"] = fea_up8
    if scale >= 16:
        fea_up16 = fnn.conv2d(resize_nearest(f, (h * 16, w * 16)), params["upconv4"])
        f = lrelu(fea_up16)
        results["fea_up16"] = fea_up16
    out = fnn.conv2d(lrelu(fnn.conv2d(f, params["hr_conv"])), params["conv_last"])
    results["out"] = out
    if fea_up0:
        results["fea_up0"] = resize_bilinear(last_lr_fea, (h // 2, w // 2))
    if fea_upm1:
        results["fea_up-1"] = resize_bilinear(last_lr_fea, (h // 4, w // 4))
    results.update(block_results)
    return results


@register("rrdb")
class RRDBNet(Model):
    registry_name = "rrdb"

    def __init__(self, in_nc=3, out_nc=3, nf=64, nb=23, gc=32, no_upsampling=True):
        super().__init__()
        self.args = dict(in_nc=in_nc, out_nc=out_nc, nf=nf, nb=nb, gc=gc,
                         no_upsampling=no_upsampling)
        self.no_upsampling = no_upsampling
        self.out_dim = nf if no_upsampling else out_nc
        self.params = init_rrdb(jax.random.PRNGKey(0), in_nc, out_nc, nf, nb, gc,
                                scale=4, upsampling=not no_upsampling)

    def apply(self, params, x):
        if self.no_upsampling:
            return rrdb_encode(params, x)
        h, w = x.shape[1], x.shape[2]
        fea = rrdb_encode(params, x)
        f = fnn.leaky_relu(fnn.conv2d(resize_nearest(fea, (h * 2, w * 2)), params["upconv1"]))
        f = fnn.leaky_relu(fnn.conv2d(resize_nearest(f, (h * 4, w * 4)), params["upconv2"]))
        return fnn.conv2d(fnn.leaky_relu(fnn.conv2d(f, params["hr_conv"])), params["conv_last"])

    def __call__(self, x):
        return self.apply(self.params, x)
