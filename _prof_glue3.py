import time
import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship
from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.ops.pallas.linf_info import fused_affine_info_cm
from bfsr_tpu.ops.pallas.linf_flow import flow_forward_cm, flow_inverse_cm
from bfsr_tpu.ops.interp import grid_sample_bilinear
from bfsr_tpu.utils.coords import make_coord_np, make_cell

model, prior = _flagship()
rng = np.random.default_rng(0)
h = w = 128; s = 4; H, W = h * s, w * s
n = H * W
inp = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))
gt = jnp.asarray((rng.random((1, H, W, 3)) - 0.5).astype(np.float32))
coord = jnp.asarray(make_coord_np((H, W), flatten=False)[None])
cell = jnp.asarray(make_cell((H, W))[None])
cy = coord[0, :, 0, 0]; cx = coord[0, 0, :, 1]
lp = model.params; pp = prior.params

def sync(x): np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])
def timeit(jf, *args, N=40):
    for _ in range(3): sync(jf(*args))
    t0 = time.perf_counter(); o = None
    for _ in range(N): o = jf(*args)
    sync(o)
    return (time.perf_counter() - t0) / N * 1e3

@jax.jit
def p_info(lp, inp):
    feat = model.gen_feat(lp, inp)
    coef = fnn.conv2d(feat, lp["coef"]); freq = fnn.conv2d(feat, lp["freq"])
    return fused_affine_info_cm(lp, coef, freq, cy, cx, cell, model.hidden_dim)

@jax.jit
def p_noprior(lp, inp):
    info = p_info.__wrapped__(lp, inp)
    res_cm = flow_inverse_cm(lp["imnet"], jnp.zeros((8, n), jnp.float32), info)
    res = res_cm[:3].T.reshape(1, H, W, 3)
    return res + grid_sample_bilinear(inp, coord, padding_mode="border")

@jax.jit
def p_fwd(lp, inp, gt):
    info = p_info.__wrapped__(lp, inp)
    gcm = jnp.pad(gt.reshape(n, 3).T, ((0, 5), (0, 0)))
    z_cm = flow_forward_cm(lp["imnet"], gcm, info)
    return z_cm

@jax.jit
def p_full(lp, pp, inp, gt):
    info = p_info.__wrapped__(lp, inp)
    gcm = jnp.pad(gt.reshape(n, 3).T, ((0, 5), (0, 0)))
    z_cm = flow_forward_cm(lp["imnet"], gcm, info)
    z_map = z_cm[:3].T.reshape(1, H, W, 3)
    z_learned = prior.apply(pp, z_map, inp)
    zl = jnp.pad(z_learned.reshape(n, 3).T, ((0, 5), (0, 0)))
    res_cm = flow_inverse_cm(lp["imnet"], zl, info)
    res = res_cm[:3].T.reshape(1, H, W, 3)
    return res + grid_sample_bilinear(inp, coord, padding_mode="border")

print(f"info only:        {timeit(p_info, lp, inp):7.2f} ms")
print(f"no-prior full:    {timeit(p_noprior, lp, inp):7.2f} ms")
print(f"fwd (info+flow):  {timeit(p_fwd, lp, inp, gt):7.2f} ms")
print(f"full learned-prior: {timeit(p_full, lp, pp, inp, gt):7.2f} ms")
