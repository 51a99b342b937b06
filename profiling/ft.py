"""Micro-profile the precompute_ft pieces at level-1 size (256^2, 320ch)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from bfsr_tpu.ops import nn as fnn

rng = np.random.default_rng(0)
B, h, w, cft, n, hid, c2 = 1, 256, 256, 320, 16, 64, 24
ft = jnp.asarray(rng.random((B, h, w, cft)).astype(np.float32))
w1 = jnp.asarray((rng.random((3, 3, cft, 2 * n * hid)) - 0.5).astype(np.float32) * 0.05)
w2 = jnp.asarray((rng.random((n, hid, hid)) - 0.5).astype(np.float32) * 0.05)
wout = jnp.asarray((rng.random((3, 3, hid, n * c2)) - 0.5).astype(np.float32) * 0.05)
wout_step = jnp.asarray((rng.random((n, 3, 3, hid, c2)) - 0.5).astype(np.float32) * 0.05)

def sync(x): np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])
def timeit(jf, *args, N=20):
    for _ in range(2): sync(jf(*args))
    t0 = time.perf_counter(); o = None
    for _ in range(N): o = jf(*args)
    sync(o)
    return (time.perf_counter() - t0) / N * 1e3

bigconv = jax.jit(lambda ft, w1: fnn.conv2d(ft, {"w": w1}))
print(f"conv1 320->{2*n*hid}:   {timeit(bigconv, ft, w1):7.2f} ms")

z = jnp.asarray(rng.random((B, h, w, n, hid)).astype(np.float32))
ein = jax.jit(lambda z, w2: jnp.einsum("bhwnc,ncd->bhwnd", z, w2,
                                       preferred_element_type=jnp.float32,
                                       precision=fnn.default_precision()))
print(f"conv2 einsum n-batch: {timeit(ein, z, w2):7.2f} ms")

zf = jnp.asarray(rng.random((B, h, w, n * hid)).astype(np.float32))
grp = jax.jit(lambda zf, wout: jax.lax.conv_general_dilated(
    zf, wout, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    feature_group_count=n, preferred_element_type=jnp.float32,
    precision=fnn.default_precision()))
print(f"out grouped conv:     {timeit(grp, zf, wout):7.2f} ms")

def per_step(zf, wout_step):
    outs = []
    for s in range(n):
        outs.append(fnn.conv2d(zf[..., s * hid:(s + 1) * hid], {"w": wout_step[s]}))
    return jnp.stack(outs, -2)
ps = jax.jit(per_step)
print(f"out 16x per-step conv:{timeit(ps, zf, wout_step):7.2f} ms")

# per-step conv1s for comparison (the old path's dominant cost)
w1s = w1.reshape(3, 3, cft, 2 * n, hid)
def conv1_per_step(ft, w1s):
    return [fnn.conv2d(ft, {"w": w1s[:, :, :, s]}) for s in range(2 * n)]
c1s = jax.jit(conv1_per_step)
print(f"conv1 32x 320->64:    {timeit(c1s, ft, w1s):7.2f} ms")
