"""Time the RRDB trunk (nb=23, nf=64, gc=32) at 128^2: XLA vs s2d Pallas."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from bfsr_tpu.models.rrdb import init_rrdb, rrdb_apply_steps

rng = np.random.default_rng(0)
params = init_rrdb(jax.random.PRNGKey(0), nf=64, nb=23, gc=32, scale=4, upsampling=True)
x = jnp.asarray(rng.random((1, 128, 128, 3)).astype(np.float32))

def sync(r): np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
def timeit(jf, *args, N=10):
    for _ in range(2): sync(jf(*args))
    t0 = time.perf_counter(); o = None
    for _ in range(N): o = jf(*args)
    sync(o)
    return (time.perf_counter() - t0) / N * 1e3

kw = dict(scale=4, block_idxs=(1, 8, 15, 22), fea_up0=True)
xla = jax.jit(lambda p, x: rrdb_apply_steps(p, x, fast=False, **kw))
print(f"XLA trunk+pyramid: {timeit(xla, params, x):7.2f} ms")
s2d = jax.jit(lambda p, x: rrdb_apply_steps(p, x, fast=True, **kw))
print(f"s2d trunk+pyramid: {timeit(s2d, params, x):7.2f} ms")
a = xla(params, x); b = s2d(params, x)
for k in a:
    d = float(jnp.max(jnp.abs(a[k] - b[k])))
    assert d < 5e-3, (k, d)  # 23 blocks of 3-pass-vs-XLA-HIGH drift
print("parity ok")
