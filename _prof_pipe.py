"""Chained per-stage timing of the headline predictor at 128->512."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship
from bfsr_tpu.utils.coords import make_coord_np, make_cell
from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.ops.pallas.linf_info import fused_affine_info_cm
from bfsr_tpu.ops.pallas.linf_flow import flow_forward_cm, flow_inverse_cm
from bfsr_tpu.ops.interp import grid_sample_bilinear

model, prior = _flagship()
rng = np.random.default_rng(0)
h = w = 128; s = 4; H = h * s; W = w * s
inp = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))
gt = jnp.asarray((rng.random((1, H, W, 3)) - 0.5).astype(np.float32))
coord = jnp.asarray(make_coord_np((H, W), flatten=False)[None])
cell = jnp.asarray(make_cell((H, W))[None])
lp = model.params; pp = prior.params

def sync(x): np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])
def bench(f, *args, iters=5, warmup=2):
    jf = jax.jit(f)
    for _ in range(warmup): sync(jf(*args))
    t0 = time.perf_counter(); o = None
    for _ in range(iters): o = jf(*args)
    sync(o)
    return (time.perf_counter() - t0) / iters * 1e3

K = 10
def rep(fn, x0):
    # chain K applications, perturbing input to prevent CSE
    def f(*args):
        y = x0
        acc = 0.0
        for i in range(K):
            out = fn(y, *args)
            acc = acc + jax.tree_util.tree_leaves(out)[0].ravel()[0]
            y = x0 * (1 + acc * 1e-20)
        return acc
    return f

feat = model.gen_feat(lp, inp)
coef = fnn.conv2d(feat, lp["coef"]); freq = fnn.conv2d(feat, lp["freq"])
cy = jnp.asarray(make_coord_np((H, W), flatten=False)[:, 0, 0])
cx = jnp.asarray(make_coord_np((H, W), flatten=False)[0, :, 1])

ms = bench(rep(lambda x: model.gen_feat(lp, x), inp))
print(f"gen_feat (EDSR16 @128^2):   {ms/K:7.3f} ms")
ms = bench(rep(lambda f: (fnn.conv2d(f, lp["coef"]), fnn.conv2d(f, lp["freq"])), feat))
print(f"coef+freq convs:            {ms/K:7.3f} ms")
ms = bench(rep(lambda c: fused_affine_info_cm(lp, c, freq, cy, cx, cell, model.hidden_dim), coef))
print(f"fused info kernel:          {ms/K:7.3f} ms")
info_cm = fused_affine_info_cm(lp, coef, freq, cy, cx, cell, model.hidden_dim)
gcm = jnp.pad(gt.reshape(H * W, 3).T, ((0, 5), (0, 0)))
ms = bench(rep(lambda g: flow_forward_cm(lp["imnet"], g, info_cm), gcm))
print(f"flow forward cm:            {ms/K:7.3f} ms")
ms = bench(rep(lambda g: flow_inverse_cm(lp["imnet"], g, info_cm), gcm))
print(f"flow inverse cm:            {ms/K:7.3f} ms")
z = jnp.asarray(rng.random((1, H, W, 3)).astype(np.float32))
ms = bench(rep(lambda zz: prior.apply(pp, zz, inp), z))
print(f"prior UNet @512^2:          {ms/K:7.3f} ms")
ms = bench(rep(lambda i2: grid_sample_bilinear(i2, coord, padding_mode="border"), inp))
print(f"grid_sample_bilinear:       {ms/K:7.3f} ms")
