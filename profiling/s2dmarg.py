"""Marginal cost of conv3x3_s2d launches at trunk shapes (64^2 s2d)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from bfsr_tpu.ops.pallas import s2d_conv as s2d

rng = np.random.default_rng(0)
nf, gc = 64, 32


def sync(r):
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def timeit(jf, *args, N=20):
    for _ in range(2):
        sync(jf(*args))
    t0 = time.perf_counter()
    o = None
    for _ in range(N):
        o = jf(*args)
    sync(o)
    return (time.perf_counter() - t0) / N * 1e3


xs = jnp.asarray(rng.random((1, 64, 64, 4 * nf)).astype(np.float32))
w_raw = jnp.asarray((rng.random((3, 3, nf, nf)) - 0.5).astype(np.float32) * 0.05)

# K identical 256->256 s2d convs chained, K = 1, 4, 16
for K in (1, 4, 16):
    def run(x, K=K):
        w = s2d.s2d_weight(w_raw)
        for _ in range(K):
            x = s2d.conv3x3_s2d([x], w, act="lrelu")
        return x
    t = timeit(jax.jit(run), xs)
    # useful bf16 GFLOP incl 3-pass + 4x s2d MACs
    g = K * 2 * 128 * 128 * 9 * nf * nf * 12 / 1e9
    print(f"chain K={K:2d}: {t:8.3f} ms  {t/K:7.3f} ms/conv  ({g/t:5.1f} TF/s bf16-equiv)")
