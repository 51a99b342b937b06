"""LINF-LP per-stage device timings at 512^2 AND real DIV2K extents.

Round-2 verdict #5: the DIV2K-size number (6.42 MP/s at 2040x1356) sits
25% below the 512^2 headline (8.6) with no per-stage breakdown.  This
profiles every stage of the fused Pallas predictor path standalone at
both shapes (chained applications inside one jit; host-fetch sync):

    python profiling/linf_stages.py [--shape 510 339] [--iters 8]

Stages: encode (EDSR-baseline at LR), coef/freq convs, fused affine-info
kernel, flow forward+inverse (channel-major Pallas), prior UNet (fused
s2d path), LR add-back, plus the full fused program for reference.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bfsr_tpu.utils.coords import make_coord_np, make_cell

from __graft_entry__ import _flagship


def sync(out):
    # device-side index first: a full-leaf np.asarray would fetch the whole
    # array over the ~5 MB/s tunnel and dominate the measurement
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def timeit(fn, *args, iters=8):
    sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def profile_shape(model, prior, h, w, s=4, iters=8):
    from bfsr_tpu.ops import nn as fnn
    from bfsr_tpu.ops.pallas.linf_flow import (flow_forward_cm,
                                               flow_inverse_cm, cm_rows)
    from bfsr_tpu.ops.pallas.linf_info import fused_affine_info_cm, T_R, WT
    from bfsr_tpu.ops.interp import grid_sample_bilinear_separable
    from bfsr_tpu.pipelines.linf_eval import LINFPredictor

    H, W = h * s, w * s
    d = model.dim
    rows = 8
    Hp8 = -(-H // T_R) * T_R
    Wp = -(-W // WT) * WT
    n = Hp8 * Wp

    rng = np.random.default_rng(0)
    inp = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))
    gt_lr_up = jnp.asarray((rng.random((1, H, W, d)) - 0.5).astype(np.float32))
    coord = jnp.asarray(make_coord_np((H, W), flatten=False)[None])
    cell = jnp.asarray(make_cell((H, W))[None])
    coord_y = jnp.pad(coord[0, :, 0, 0], (0, Hp8 - H), mode="edge")
    coord_x = jnp.pad(coord[0, 0, :, 1], (0, Wp - W), mode="edge")

    print(f"\n== LR {h}x{w} -> HR {H}x{W}  (padded {Hp8}x{Wp}) ==")
    res = {}

    enc = jax.jit(lambda p, x: model.gen_feat(p, x))
    res["encode (EDSR)"] = timeit(enc, model.params, inp, iters=iters)
    feat = enc(model.params, inp)

    cf = jax.jit(lambda p, f: (fnn.conv2d(f, p["coef"]),
                               fnn.conv2d(f, p["freq"])))
    res["coef/freq convs"] = timeit(cf, model.params, feat, iters=iters)
    coef, freq = cf(model.params, feat)

    info = jax.jit(lambda p, c, f: fused_affine_info_cm(
        p, c, f, coord_y, coord_x, cell, model.hidden_dim))
    res["fused info kernel"] = timeit(info, model.params, coef, freq,
                                      iters=iters)
    info_cm = info(model.params, coef, freq)

    x_cm = jnp.pad(gt_lr_up, ((0, 0), (0, Hp8 - H), (0, Wp - W), (0, 0)))
    x_cm = jnp.pad(x_cm.reshape(n, d).T, ((0, rows - d), (0, 0)))
    ffwd = jax.jit(lambda p, x, i: flow_forward_cm(p["imnet"], x, i))
    res["flow forward (cm)"] = timeit(ffwd, model.params, x_cm, info_cm,
                                      iters=iters)
    finv = jax.jit(lambda p, x, i: flow_inverse_cm(p["imnet"], x, i))
    res["flow inverse (cm)"] = timeit(finv, model.params, x_cm, info_cm,
                                      iters=iters)

    from bfsr_tpu.models.unet import unet_apply_fused

    z_map = jnp.asarray((rng.random((1, H, W, d)) - 0.5).astype(np.float32))
    pr = jax.jit(lambda pp, z, x: unet_apply_fused(pp, z, x,
                                                   depth=prior.depth))
    res["prior UNet (fused s2d)"] = timeit(pr, prior.params, z_map, inp,
                                           iters=iters)

    ab = jax.jit(lambda x, r: r + grid_sample_bilinear_separable(
        x, coord[:, :, 0, 0], coord[:, 0, :, 1], padding_mode="border"))
    res["LR add-back"] = timeit(ab, inp, gt_lr_up, iters=iters)

    predictor = LINFPredictor(model, prior, tile_queries=65536)
    full = lambda: predictor.predict(model.params, prior.params, inp, coord,  # noqa: E731
                                     cell, gt_lr_up)
    res["FULL fused program"] = timeit(lambda: full(), iters=iters)

    total = sum(v for k, v in res.items() if k != "FULL fused program")
    for k, v in res.items():
        print(f"  {k:<26} {v:>8.2f} ms")
    print(f"  {'sum of stages':<26} {total:>8.2f} ms  (overlap/DCE makes "
          f"full < sum)")
    mps = H * W / res["FULL fused program"] / 1e3
    print(f"  throughput: {mps:.2f} MP/s")
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=2, default=None,
                    help="LR h w (default: profiles 128x128 AND 510x339)")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    model, prior = _flagship()
    shapes = [tuple(args.shape)] if args.shape else [(128, 128), (510, 339)]
    for (h, w) in shapes:
        profile_shape(model, prior, h, w, iters=args.iters)


if __name__ == "__main__":
    main()
