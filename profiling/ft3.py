"""Phase-conv alternatives: lax.conv vs im2col matmul at level-1 sizes."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from bfsr_tpu.ops import nn as fnn

rng = np.random.default_rng(0)
h = w = 128
base = jnp.asarray(rng.random((1, h, w, 64)).astype(np.float32))
stack = jnp.asarray(rng.random((1, h, w, 256)).astype(np.float32))
ka = jnp.asarray((rng.random((3, 3, 64, 8192)) - 0.5).astype(np.float32) * 0.02)
kb = jnp.asarray((rng.random((2, 2, 256, 2048)) - 0.5).astype(np.float32) * 0.02)

def sync(r): np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
def timeit(jf, *args, N=10):
    for _ in range(2): sync(jf(*args))
    t0 = time.perf_counter(); o = None
    for _ in range(N): o = jf(*args)
    sync(o)
    return (time.perf_counter() - t0) / N * 1e3

# A-term as ONE conv 64 -> 8192 (4 phases share the im2col)
conv_a = jax.jit(lambda x, k: fnn.conv2d(x, {"w": k}))
print(f"one conv 64->8192 3x3:     {timeit(conv_a, base, ka):7.2f} ms")

# A-term as im2col + one matmul (16384, 576) @ (576, 8192)
def im2col_mm(x, k):
    pads = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [pads[:, dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)], -1)
    return jnp.einsum("bhwk,ko->bhwo", cols, k.reshape(9 * 64, 8192),
                      preferred_element_type=jnp.float32,
                      precision=fnn.default_precision())
mm_a = jax.jit(im2col_mm)
print(f"im2col+matmul 576->8192:   {timeit(mm_a, base, ka):7.2f} ms")

# B-term: 4 convs 2x2 vs 4 im2col matmuls (1024 -> 2048)
def convs_b(x, k):
    outs = []
    for py in ((1, 0), (0, 1)):
        for px in ((1, 0), (0, 1)):
            outs.append(jax.lax.conv_general_dilated(
                x, k, (1, 1), (py, px), dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
                precision=fnn.default_precision()))
    return outs
cb = jax.jit(convs_b)
print(f"4x lax.conv 2x2 256->2048: {timeit(cb, stack, kb):7.2f} ms")

def mm_b(x, k):
    pads = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    km = k.reshape(4 * 256, 2048)
    outs = []
    for oy in (0, 1):
        for ox in (0, 1):
            cols = jnp.concatenate(
                [pads[:, oy + u:oy + u + h, ox + v:ox + v + w]
                 for u in range(2) for v in range(2)], -1)
            outs.append(jnp.einsum("bhwk,ko->bhwo", cols, km,
                                   preferred_element_type=jnp.float32,
                                   precision=fnn.default_precision()))
    return outs
mb = jax.jit(mm_b)
print(f"4x im2col+matmul 1024->2048:{timeit(mb, stack, kb):6.2f} ms")
