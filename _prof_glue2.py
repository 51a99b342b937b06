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

def timeit(fn, N=20):
    for _ in range(3): sync(fn())
    t0 = time.perf_counter(); o = None
    for _ in range(N): o = fn()
    sync(o)
    return (time.perf_counter() - t0) / N * 1e3

# no-prior path (temperature-0): everything except flow-forward + UNet
ms0 = timeit(lambda: predictor.predict(model.params, None, inp, coord, cell))
print(f"no-prior predict: {ms0:.2f} ms")
ms1 = timeit(lambda: predictor.predict(model.params, prior.params, inp, coord,
                                       cell, gt))
print(f"with-prior predict: {ms1:.2f} ms (delta {ms1-ms0:.2f})")
