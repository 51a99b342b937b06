"""Prior-UNet sub-stage device times at 512^2 vs DIV2K extents.

The DIV2K-size LINF pipeline spends 325 ms in the prior UNet (vs 24 ms at
512^2 — 13.5x for 7.35x the pixels).  This times every internal stage of
``unet_apply_fused`` standalone at both extents to find the superlinear
stage.  Run: python profiling/unet_stages.py [--iters 5]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bfsr_tpu import registry
import bfsr_tpu.models  # noqa


def sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def timeit(fn, *args, iters=5):
    sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def profile(prior, H, W, h, w, iters=5):
    from bfsr_tpu.models.unet import (dense5c_s2d, double_conv_s2d,
                                      dense_block5c, double_conv, _up_merge)
    from bfsr_tpu.ops import nn as fnn
    from bfsr_tpu.ops.interp import resize_bilinear
    from bfsr_tpu.ops.pallas import s2d_conv as s2d

    params = prior.params
    depth = prior.depth
    rng = np.random.default_rng(0)
    z = jnp.asarray((rng.random((1, H, W, 3)) - 0.5).astype(np.float32))
    lr = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))
    print(f"\n== prior UNet: z {H}x{W}, lr {h}x{w} ==")
    res = {}

    zs = s2d.space_to_depth(z)
    f_proj = jax.jit(lambda p, x: dense5c_s2d([x], [3], p["input_proj"]))
    res["input proj (s2d dense5C)"] = timeit(f_proj, params, zs, iters=iters)
    proj_s2d = f_proj(params, zs)

    def lrp(p, lr):
        e = fnn.leaky_relu(fnn.conv2d(lr, p["lr_proj_conv"], stride=3,
                                      padding=1))
        e = dense_block5c(e, p["lr_proj_dense"])
        if e.shape[1:3] != (H, W):
            e = resize_bilinear(e, (H, W), align_corners=False)
        return s2d.space_to_depth(e)
    f_lrp = jax.jit(lrp)
    res["lr_proj (+resize +s2d)"] = timeit(f_lrp, params, lr, iters=iters)
    lr_s2d = f_lrp(params, lr)

    dim2 = proj_s2d.shape[-1] // 4
    f_inc = jax.jit(lambda p, a, b: double_conv_s2d([a, b], [dim2, dim2],
                                                    p["inc"]))
    res["inc DoubleConv (s2d)"] = timeit(f_inc, params, proj_s2d, lr_s2d,
                                         iters=iters)
    inc_s2d = f_inc(params, proj_s2d, lr_s2d)
    inc_dim = inc_s2d.shape[-1] // 4

    f_pool = jax.jit(lambda x: s2d.maxpool2x2_from_s2d(x, inc_dim))
    res["maxpool from s2d"] = timeit(f_pool, inc_s2d, iters=iters)
    x = f_pool(inc_s2d)

    feats = [None]
    for i, dp in enumerate(params["down"]):
        def dn(p, x, i=i, dp=dp):
            y = fnn.max_pool2d(x, 2) if i > 0 else x
            return double_conv(y, p["down"][i], False, {}, ("down", i))
        f = jax.jit(dn)
        res[f"down[{i}] (XLA {x.shape[1]}x{x.shape[2]})"] = timeit(
            f, params, x, iters=iters)
        x = f(params, x)
        feats.append(x)

    for i in range(depth - 1):
        skip = feats[depth - 1 - i]
        def up(p, x, s, i=i):
            return _up_merge(x, s, p["up"][i], False, {}, ("up", i))
        f = jax.jit(up)
        res[f"up[{i}] (XLA {skip.shape[1]}x{skip.shape[2]})"] = timeit(
            f, params, x, skip, iters=iters)
        x = f(params, x, skip)

    def final(p, x, inc_s2d):
        x_up = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2),
                               align_corners=True)
        dh, dw = H - x_up.shape[1], W - x_up.shape[2]
        x_up = jnp.pad(x_up, ((0, 0), (dh // 2, dh - dh // 2),
                              (dw // 2, dw - dw // 2), (0, 0)))
        x_s2d = s2d.space_to_depth(x_up)
        out_s2d = double_conv_s2d([inc_s2d, x_s2d], [inc_dim, x_up.shape[-1]],
                                  p["up"][depth - 1])
        out = s2d.depth_to_space(out_s2d)
        return fnn.conv2d(out, p["outc"])
    f_fin = jax.jit(final)
    res["final up DoubleConv (s2d) + outc"] = timeit(f_fin, params, x,
                                                     inc_s2d, iters=iters)

    from bfsr_tpu.models.unet import unet_apply_fused
    f_all = jax.jit(lambda p, z, lr: unet_apply_fused(p, z, lr, depth=depth))
    res["FULL unet_apply_fused"] = timeit(f_all, params, z, lr, iters=iters)

    tot = sum(v for k, v in res.items() if not k.startswith("FULL"))
    for k, v in res.items():
        print(f"  {k:<36} {v:>8.2f} ms")
    print(f"  {'sum of stages':<36} {tot:>8.2f} ms")
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--div2k-only", action="store_true")
    args = ap.parse_args()
    prior = registry.make({"name": "unet", "args": {"in_chans": 3, "depth": 3,
                                                    "dim": 64,
                                                    "bilinear": True}})
    if not args.div2k_only:
        profile(prior, 512, 512, 128, 128, iters=args.iters)
    profile(prior, 2040, 1356, 510, 339, iters=args.iters)


if __name__ == "__main__":
    main()
