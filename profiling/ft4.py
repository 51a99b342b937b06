"""Per-level breakdown of precompute_ft at LR 128 -> HR 512."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import bfsr_tpu.models  # noqa
from bfsr_tpu import registry
from bfsr_tpu.ops import flows
from bfsr_tpu.ops import flows_s2d as fs2d

model = registry.make({"name": "srflow", "args": {
    "in_nc": 3, "out_nc": 3, "nf": 64, "nb": 23, "scale": 4,
    "K": 16, "L": 3, "hidden_channels": 64,
    "additional_steps": 2, "split_enable": True,
    "stack_blocks": [1, 8, 15, 22], "stack_concat": True,
    "fea_up0": True}})
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

lr_enc = jax.jit(lambda p, lr: model.preprocess(p, lr))(params, lr)

plan = model.plan
by_level = {}
for i, entry in enumerate(plan):
    if entry["kind"] == "step_cond":
        by_level.setdefault(entry["level"], []).append(i)

fparams = model.flow_params(params) if hasattr(model, "flow_params") else params
layers = params["flow"]["layers"] if "flow" in params else params["layers"]

for lvl, idxs in sorted(by_level.items()):
    step_ps = [layers[i]["affine"] for i in idxs]
    if lvl == 1:
        parts = model.lvl1_parts(params, lr_enc) if hasattr(model, "lvl1_parts") else None
        if parts is not None:
            f = jax.jit(lambda ps=step_ps, pt=parts:
                        fs2d.cond_affine_cache_batched_nearest(
                            pt["base"], pt["stack"], pt["upconv"], ps))
            print(f"level {lvl} (s2d nearest): {timeit(f):7.2f} ms")
            continue
    cond = lr_enc[model.level_name(lvl)] if hasattr(model, "level_name") else None
    f = jax.jit(lambda c=cond, ps=step_ps: flows.cond_affine_cache_batched(c, ps))
    print(f"level {lvl} (batched):     {timeit(f):7.2f} ms   cond {cond.shape}")
