"""Micro-profile cond_affine_cache_batched_nearest parts at level-1 size."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from bfsr_tpu.ops import flows, flows_s2d as fs2d, nn as fnn

rng = np.random.default_rng(0)
h = w = 128
n, hid, c = 16, 64, 12
base = jnp.asarray(rng.random((1, h, w, 64)).astype(np.float32))
stack = jnp.asarray(rng.random((1, h, w, 256)).astype(np.float32))
upconv = {"w": jnp.asarray((rng.random((3, 3, 64, 64)) - 0.5).astype(np.float32) * 0.05),
          "b": jnp.asarray(rng.random(64).astype(np.float32) * 0.05)}
ps = []
for s in range(n):
    p = flows.init_cond_affine(jax.random.PRNGKey(s), c, 320, hid)
    p["fFeatures"]["out"]["w"] = jax.random.normal(jax.random.PRNGKey(100 + s),
                                                   p["fFeatures"]["out"]["w"].shape) * 0.05
    ps.append(p)

def sync(r): np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
def timeit(jf, *args, N=10):
    for _ in range(2): sync(jf(*args))
    t0 = time.perf_counter(); o = None
    for _ in range(N): o = jf(*args)
    sync(o)
    return (time.perf_counter() - t0) / N * 1e3

full = jax.jit(lambda b, s, u, ps: fs2d.cond_affine_cache_batched_nearest(b, s, u, ps))
print(f"full lvl1 cache (nearest): {timeit(full, base, stack, upconv, ps):7.2f} ms")

# parts
w1 = jnp.concatenate([p["fFeatures"]["conv1"]["w"] for p in ps]
                     + [p["fAffine"]["conv1"]["w"][:, :, -320:, :] for p in ps], -1)
w_a, w_b = w1[:, :, :64], w1[:, :, 64:]

def phases_a(base, w_a, wu):
    return [fnn.conv2d(base, {"w": fs2d._composed_phase_kernel(wu, w_a, a, b)})
            for a in (0, 1) for b in (0, 1)]
pa = jax.jit(phases_a)
print(f"4x composed-A convs 64->2048:  {timeit(pa, base, w_a, upconv['w']):7.2f} ms")

def phases_b(stack, w_b):
    return [fs2d._phase_conv(stack, *fs2d._nearest_phase_kernels(w_b, a, b))
            for a in (0, 1) for b in (0, 1)]
pb = jax.jit(phases_b)
print(f"4x phase-B convs 2x2 256->2048:{timeit(pb, stack, w_b):7.2f} ms")

ys = [jnp.asarray(rng.random((1, h, w, 2 * n * hid)).astype(np.float32)) for _ in range(4)]
def tails(ys, ps):
    hh = jnp.stack([y[..., : n * hid] for y in ys], axis=-2).reshape(1, h, w, 4, n, hid)
    w2 = jnp.stack([p["fFeatures"]["conv2"]["w"][0, 0] for p in ps])
    hh = jnp.einsum("bhwqnc,ncd->bhwqnd", hh, w2, preferred_element_type=jnp.float32,
                    precision=fnn.default_precision())
    outs = []
    for s in range(n):
        h_s2d = hh[..., s, :].reshape(1, h, w, 4 * hid)
        o = fs2d.conv2d_s2d(h_s2d, ps[s]["fFeatures"]["out"]["w"])
        outs.append(o)
    return outs
tl = jax.jit(tails)
print(f"tails (stack+einsum+16 out convs): {timeit(tl, ys, ps):7.2f} ms")
