"""UNet latent (prior) module — the paper's only trainable component.

Reference: LINF-LP/models/unet.py.  Takes the flow-encoded LR latent
``z_lr`` (3 or 3*ps^2 channels) plus the normalized LR image and predicts a
better latent.  Structure: DenseBlock_5C input projection + stride-3 conv LR
projection -> concat -> depth-3 UNet (maxpool down / bilinear-up +
skip-concat, DoubleConv = [conv3x3 -> BN -> lrelu] x2) -> 1x1 out conv.

BatchNorm runs in batch-stats mode during training (torch semantics);
``apply(..., training=True)`` additionally returns the freshly observed
(mean, var) per BN layer so the optimizer step can update running stats with
torch's 0.1 momentum.
"""

import jax
import jax.numpy as jnp

from bfsr_tpu.models.base import Model
from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.ops.interp import resize_bilinear
from bfsr_tpu.registry import register


# -- DenseBlock_5C (unet.py:10-36): kaiming-normal x0.1 init ----------------


def init_dense_block5c(key, nf, gc, out_dim):
    ks = jax.random.split(key, 5)
    cins = [nf, nf + gc, nf + 2 * gc, nf + 3 * gc, nf + 4 * gc]
    couts = [gc, gc, gc, gc, out_dim]
    return {
        f"conv{i+1}": fnn.init_conv(ks[i], 3, 3, cins[i], couts[i],
                                    mode="kaiming_normal_fan_in", gain=0.1)
        for i in range(5)
    }


def dense_block5c(x, p):
    """Reference-order dense block: 5 narrow gather convs over growing
    concats (unet.py:10-36).  XLA's conv tiling wins at large extents
    (512^2 runs the dense5c_s2d Pallas path instead) and at the odd-sized
    lr_proj resolution; ``dense_block5c_scatter`` below wins at the
    SRFlow prior's 256^2/64^2 shapes — both compute identical sums."""
    lrelu = fnn.leaky_relu
    x1 = lrelu(fnn.conv2d(x, p["conv1"]))
    x2 = lrelu(fnn.conv2d(jnp.concatenate([x, x1], -1), p["conv2"]))
    x3 = lrelu(fnn.conv2d(jnp.concatenate([x, x1, x2], -1), p["conv3"]))
    x4 = lrelu(fnn.conv2d(jnp.concatenate([x, x1, x2, x3], -1), p["conv4"]))
    return fnn.conv2d(jnp.concatenate([x, x1, x2, x3, x4], -1), p["conv5"])


def dense_block5c_scatter(x, p):
    """Scatter-form dense block (same sums as the reference's 5 narrow
    gather convs over growing concats, reassociated): each produced tensor
    does ONE wide conv to all of its future consumers — <=64-out convs run
    at 3-17 TF/s on this chip vs ~40 at >=128 out.  Each wide conv is a
    half-im2col (lane-concat of the 3 row shifts, then 3 accumulated
    column-shift matmuls); see rrdb._dense_block for the same treatment of
    the ESRGAN trunk."""
    cin = p["conv1"]["w"].shape[2]
    couts = [p[f"conv{k+1}"]["w"].shape[-1] for k in range(5)]
    sizes = [cin] + couts[:4]          # channel width of source tensor j
    offs = [0]
    for s in sizes[:-1]:
        offs.append(offs[-1] + s)      # its offset in the reference concat
    ws = [jnp.concatenate(
        [p[f"conv{k+1}"]["w"][:, :, offs[j]:offs[j] + sizes[j], :]
         for k in range(j, 5)], axis=-1) for j in range(5)]
    bs = [p[f"conv{k+1}"].get("b") for k in range(5)]

    acc = [None] * 5  # pre-activation accumulator of conv k

    def spread(j, y):
        off = 0
        for k in range(j, 5):
            v = y[..., off:off + couts[k]]
            acc[k] = v if acc[k] is None else acc[k] + v
            off += couts[k]

    spread(0, fnn.conv3x3_y3(x, ws[0]))
    for j in range(1, 5):
        t = acc[j - 1] if bs[j - 1] is None else acc[j - 1] + bs[j - 1]
        spread(j, fnn.conv3x3_y3(fnn.leaky_relu(t), ws[j]))
    return acc[4] if bs[4] is None else acc[4] + bs[4]


# -- DoubleConv / Down / Up --------------------------------------------------


def init_double_conv(key, cin, cout, mid=None):
    mid = mid or cout
    k1, k2 = jax.random.split(key)
    return {
        "conv1": fnn.init_conv(k1, 3, 3, cin, mid, bias=False),
        "bn1": fnn.init_batch_norm(mid),
        "conv2": fnn.init_conv(k2, 3, 3, mid, cout, bias=False),
        "bn2": fnn.init_batch_norm(cout),
    }


def double_conv(x, p, training, bn_updates, path):
    h = fnn.conv2d(x, p["conv1"])
    if training:
        h, stats = fnn.batch_norm(h, p["bn1"], training=True)
        bn_updates[path + ("bn1",)] = stats
    else:
        h = fnn.batch_norm(h, p["bn1"])
    h = fnn.leaky_relu(h)
    h = fnn.conv2d(h, p["conv2"])
    if training:
        h, stats = fnn.batch_norm(h, p["bn2"], training=True)
        bn_updates[path + ("bn2",)] = stats
    else:
        h = fnn.batch_norm(h, p["bn2"])
    return fnn.leaky_relu(h)


def _up_merge(x1, x2, p, training, bn_updates, path, bilinear=True):
    """Up block: upsample x1, pad to x2, concat [x2, x1], DoubleConv
    (unet.py:84-96)."""
    h2, w2 = x2.shape[1], x2.shape[2]
    if bilinear:
        x1 = resize_bilinear(x1, (x1.shape[1] * 2, x1.shape[2] * 2), align_corners=True)
    else:
        raise NotImplementedError("transposed-conv Up is not used by shipped configs")
    dh = h2 - x1.shape[1]
    dw = w2 - x1.shape[2]
    x1 = jnp.pad(x1, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)))
    return double_conv(jnp.concatenate([x2, x1], -1), p, training, bn_updates, path)


# -- UNet --------------------------------------------------------------------


def init_unet(key, in_chans, depth=3, dim=64, bilinear=True):
    factor = 2 if bilinear else 1
    keys = iter(jax.random.split(key, depth * 2 + 8))
    p = {
        "input_proj": init_dense_block5c(next(keys), in_chans, dim // 2, dim // 2),
        "lr_proj_conv": fnn.init_conv(next(keys), 3, 3, 3, in_chans),
        "lr_proj_dense": init_dense_block5c(next(keys), in_chans, dim // 2, dim // 2),
        "inc": init_double_conv(next(keys), dim, dim),
        "down": [],
        "up": [],
        "outc": fnn.init_conv(next(keys), 1, 1, dim, in_chans),
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


def unet_apply(params, z, lr, depth=3, training=False):
    """z: (B, H, W, in_chans) latent; lr: (B, h, w, 3) normalized LR.

    Returns logits (B, H, W, in_chans); with training=True also a dict of
    BN batch statistics keyed by parameter path.
    """
    bn_updates = {}
    x = dense_block5c(z, params["input_proj"])
    lr_embed = fnn.conv2d(lr, params["lr_proj_conv"], stride=3, padding=1)
    lr_embed = fnn.leaky_relu(lr_embed)
    lr_embed = dense_block5c(lr_embed, params["lr_proj_dense"])
    if lr_embed.shape[1:3] != x.shape[1:3]:
        lr_embed = resize_bilinear(lr_embed, x.shape[1:3], align_corners=False)
    x = jnp.concatenate([x, lr_embed], -1)

    feats = []
    x = double_conv(x, params["inc"], training, bn_updates, ("inc",))
    feats.append(x)
    for i, dp in enumerate(params["down"]):
        x = fnn.max_pool2d(x, 2)
        x = double_conv(x, dp, training, bn_updates, ("down", i))
        feats.append(x)
    for i, up in enumerate(params["up"]):
        x = _up_merge(x, feats[depth - 1 - i], up, training, bn_updates, ("up", i))
    logits = fnn.conv2d(x, params["outc"])
    if training:
        return logits, bn_updates
    return logits


def dense5c_s2d(xs_blocks, block_sizes, p, factors=(2, 2)):
    """dense_block5c over an implicit channel-concat, fused s2d Pallas.

    factors=(2, 1): the H-only domain — the right trade when the growth
    channels already fill the MXU lanes at 2 phases (gc=64 blocks)."""
    from bfsr_tpu.ops.pallas import s2d_conv as s2d

    P = factors[0] * factors[1]
    blocks = list(xs_blocks)
    sizes = list(block_sizes)
    for i in range(1, 6):
        cp = p[f"conv{i}"]
        w_blocks = s2d.s2d_weight(cp["w"], cin_split=sizes, factors=factors)
        out = s2d.conv3x3_s2d(blocks, w_blocks, bias=cp["b"],
                              act="lrelu" if i < 5 else None, phases=P)
        cout = cp["w"].shape[-1]
        blocks = blocks + [out]
        sizes = sizes + [cout]
    return blocks[-1]


def double_conv_s2d(xs_blocks, block_sizes, p, factors=(2, 2)):
    """Eval-mode DoubleConv (conv+BN+lrelu x2), fused s2d Pallas.

    factors=(2, 1) runs in the H-only s2d domain: for these Cout=64 convs
    2*Cout already fills the 128 MXU lanes, and the axis-only phase
    structure costs 2x MACs instead of the full 2x2 s2d's 4x."""
    from bfsr_tpu.ops.pallas.conv3x3 import fold_bn
    from bfsr_tpu.ops.pallas import s2d_conv as s2d

    P = factors[0] * factors[1]
    w1 = s2d.s2d_weight(p["conv1"]["w"], cin_split=list(block_sizes),
                        factors=factors)
    s1, b1 = fold_bn(p["conv1"], p["bn1"])
    h = s2d.conv3x3_s2d(list(xs_blocks), w1, scale=s1, bias=b1, act="lrelu",
                        phases=P)
    w2 = s2d.s2d_weight(p["conv2"]["w"], factors=factors)
    s2_, b2 = fold_bn(p["conv2"], p["bn2"])
    return s2d.conv3x3_s2d([h], w2, scale=s2_, bias=b2, act="lrelu",
                           phases=P)


def unet_apply_fused(params, z, lr, depth=3):
    """Inference-only UNet forward with the 512^2-resolution stages running
    as fused space-to-depth Pallas convs (ops/pallas/s2d_conv.py): the
    dense input projection, the inc DoubleConv, and the final up
    DoubleConv dominate the prior's latency at <=64 output channels where
    XLA's conv wastes most of the MXU.  Mid-resolution stages (>=128
    channels) stay on XLA convs, which already run near peak there.

    Numerics: 3-pass bf16 matmuls == XLA Precision.HIGH.  Requires even
    H/W and B=1; callers fall back to ``unet_apply`` otherwise.
    """
    from bfsr_tpu.ops.pallas import s2d_conv as s2d

    B, H, W, _ = z.shape
    assert B == 1 and H % 2 == 0 and W % 2 == 0

    # input projection + LR embedding (s2d Pallas for the 512^2 dense
    # block: the XLA scatter form that wins at 128^2 trunk shapes measured
    # SLOWER here — 8.62 -> 7.74 MP/s — the f32 accumulate traffic
    # dominates at 512^2 where the Pallas kernel keeps it in VMEM)
    zs = s2d.space_to_depth(z)
    in_chans = z.shape[-1]
    proj_s2d = dense5c_s2d([zs], [in_chans], params["input_proj"])

    lr_embed = fnn.conv2d(lr, params["lr_proj_conv"], stride=3, padding=1)
    lr_embed = fnn.leaky_relu(lr_embed)
    lr_embed = dense_block5c(lr_embed, params["lr_proj_dense"])
    if lr_embed.shape[1:3] != z.shape[1:3]:
        lr_embed = resize_bilinear(lr_embed, z.shape[1:3], align_corners=False)
    lr_s2d = s2d.space_to_depth_h(lr_embed)

    dim2 = proj_s2d.shape[-1] // 4  # dim // 2

    # inc DoubleConv on the implicit concat [proj, lr_embed] — H-only s2d:
    # these are Cout=64 convs, so 2*Cout fills the MXU lanes at a 2x MAC
    # trade (the full 2x2 domain costs 4x for no extra lane width)
    inc_s2d = double_conv_s2d([s2d.full_to_h_s2d(proj_s2d), lr_s2d],
                              [dim2, dim2], params["inc"], factors=(2, 1))
    inc_dim = inc_s2d.shape[-1] // 2

    # down path (XLA: >=128 channels after the first pool)
    feats = [None]  # feats[0] stays in s2d for the final up stage
    x = s2d.maxpool2x2_from_s2d_h(inc_s2d, inc_dim)
    bn_updates = {}
    for i, dp in enumerate(params["down"]):
        if i > 0:
            x = fnn.max_pool2d(x, 2)
        x = double_conv(x, dp, False, bn_updates, ("down", i))
        feats.append(x)

    # up path: all but the last stage on XLA.  (Running the 64-out up[1]
    # stage h-only s2d was measured SLOWER both at 512^2 and DIV2K — its
    # 384-channel input concat VMEM-starves the kernel to 2-row tiles and
    # the three relayouts eat the rest; XLA keeps it.)
    for i in range(depth - 1):
        up = params["up"][i]
        skip = feats[depth - 1 - i]
        x = _up_merge(x, skip, up, False, bn_updates, ("up", i))

    # final up stage at the full resolution: s2d fused (same resize-then-pad
    # semantics as _up_merge)
    x_up = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2),
                           align_corners=True)
    dh = H - x_up.shape[1]
    dw = W - x_up.shape[2]
    x_up = jnp.pad(x_up, ((0, 0), (dh // 2, dh - dh // 2),
                          (dw // 2, dw - dw // 2), (0, 0)))
    x_s2d = s2d.space_to_depth_h(x_up)
    out_s2d = double_conv_s2d([inc_s2d, x_s2d], [inc_dim, x_up.shape[-1]],
                              params["up"][depth - 1], factors=(2, 1))
    out = s2d.depth_to_space_h(out_s2d)
    return fnn.conv2d(out, params["outc"])


def apply_bn_updates(params, bn_updates, momentum=0.1):
    """Fold observed batch stats into running stats (torch momentum)."""
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    for path, (mean, var) in bn_updates.items():
        node = params
        for k in path[:-1]:
            node = node[k]
        bn = node[path[-1]]
        bn["mean"] = (1 - momentum) * bn["mean"] + momentum * mean
        bn["var"] = (1 - momentum) * bn["var"] + momentum * var
    return params


@register("unet")
class UNet(Model):
    registry_name = "unet"

    def __init__(self, in_chans, depth=3, dim=64, bilinear=True, cell_input=None):
        super().__init__()
        self.args = dict(in_chans=in_chans, depth=depth, dim=dim, bilinear=bilinear)
        self.in_chans = in_chans
        self.depth = depth
        self.dim = dim
        self.params = init_unet(jax.random.PRNGKey(0), in_chans, depth, dim, bilinear)

    def apply(self, params, z, lr, training=False, key=None):
        return unet_apply(params, z, lr, self.depth, training)

    def __call__(self, z, lr):
        return self.apply(self.params, z, lr)
