"""Profile the SRFlow-LP pipeline stages at LR 128 -> HR 512."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import bfsr_tpu.models  # noqa
from bfsr_tpu import registry
from bfsr_tpu.models.srflow.srflow_net import SRFlowNet, standardize_epses
from bfsr_tpu.ops.interp import resize_bilinear

model = registry.make({"name": "srflow", "args": {
    "in_nc": 3, "out_nc": 3, "nf": 64, "nb": 23, "scale": 4,
    "K": 16, "L": 3, "hidden_channels": 64,
    "additional_steps": 2, "split_enable": True,
    "stack_blocks": [1, 8, 15, 22], "stack_concat": True,
    "fea_up0": True}})
prior = registry.make({"name": "srflow-unet", "args": {"depth": 3, "dim": 64}})
rng = np.random.default_rng(0)
lr = jnp.asarray(rng.random((1, 128, 128, 3)).astype(np.float32))
params = model.params

def sync(x): np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])
def timeit(jf, *args, N=10):
    for _ in range(2): sync(jf(*args))
    t0 = time.perf_counter(); o = None
    for _ in range(N): o = jf(*args)
    sync(o)
    return (time.perf_counter() - t0) / N * 1e3

pre = jax.jit(lambda p, lr: model.preprocess(p, lr))
lr_enc = pre(params, lr)
print(f"RRDB preprocess:  {timeit(pre, params, lr):7.2f} ms")

ftc = jax.jit(lambda p, e: model.precompute_ft(p, e))
ft_cache = ftc(params, lr_enc)
print(f"precompute_ft:    {timeit(ftc, params, lr_enc):7.2f} ms")

lr_up = resize_bilinear(lr, (512, 512))
nf = jax.jit(lambda p, up, lr, enc, ftc: model.normal_flow(
    p, up, lr, add_gt_noise=False, lr_enc=enc, ft_cache=ftc))
epses, _, _ = nf(params, lr_up, lr, lr_enc, ft_cache)
print(f"normal_flow (enc):{timeit(nf, params, lr_up, lr, lr_enc, ft_cache):7.2f} ms")

epses_s = standardize_epses(epses)
pr = jax.jit(lambda pp, e: prior.apply(pp, e))
learned = pr(prior.params, epses_s)
print(f"two-branch prior: {timeit(pr, prior.params, epses_s):7.2f} ms")

rf = jax.jit(lambda p, lr, e, enc, ftc: model.reverse_flow(
    p, lr, epses=e, add_gt_noise=False, lr_enc=enc, ft_cache=ftc))
sr, _ = rf(params, lr, learned, lr_enc, ft_cache)
print(f"reverse_flow (dec):{timeit(rf, params, lr, learned, lr_enc, ft_cache):6.2f} ms")
