import time
import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship
from bfsr_tpu.pipelines.linf_eval import LINFPredictor
from bfsr_tpu.utils.coords import make_coord_np, make_cell

model, prior = _flagship()
predictor = LINFPredictor(model, prior, tile_queries=65536)
rng = np.random.default_rng(0)
h = w = 128; s = 4; H, W = h * s, w * s
inp = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))
gt = jnp.asarray((rng.random((1, H, W, 3)) - 0.5).astype(np.float32))
coord = jnp.asarray(make_coord_np((H, W), flatten=False)[None])
cell = jnp.asarray(make_cell((H, W))[None])

def sync(x): np.asarray(x.ravel()[0])

def once():
    return predictor.predict(model.params, prior.params, inp, coord, cell, gt)

for _ in range(3): sync(once())
t0 = time.perf_counter()
N = 20
o = None
for _ in range(N): o = once()
sync(o)
dt = (time.perf_counter() - t0) / N * 1e3
print(f"full predictor: {dt:.2f} ms/img -> {H*W/dt/1e3:.2f} MP/s")

# transpose cost: (n,3) -> (8,n) cm and back
n = H * W
x = jnp.asarray(rng.random((1, H, W, 3)).astype(np.float32))
def cm_roundtrip(img):
    xcm = jnp.pad(img.reshape(n, 3).T, ((0, 5), (0, 0)))
    back = xcm[:3].T.reshape(1, H, W, 3)
    return back

def bench(f, *args, iters=10, warmup=2):
    jf = jax.jit(f)
    for _ in range(warmup): sync(jf(*args))
    t0 = time.perf_counter(); o = None
    for _ in range(iters): o = jf(*args)
    sync(o)
    return (time.perf_counter() - t0) / iters * 1e3

K = 10
def rep(fn, x0):
    def f(x0):
        y = x0; acc = 0.0
        for i in range(K):
            out = fn(y)
            acc = acc + out.ravel()[0]
            y = x0 * (1 + acc * 1e-20)
        return acc
    return f

ms = bench(rep(cm_roundtrip, x), x)
print(f"cm roundtrip ((n,3).T pad + back): {ms/K:.3f} ms")
