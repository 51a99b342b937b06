"""Per-level cost of the SRFlow cond-step chains (encode direction)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from bfsr_tpu.ops import flows

rng = np.random.default_rng(0)

def sync(r): np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
def timeit(jf, *args, N=10):
    for _ in range(2): sync(jf(*args))
    t0 = time.perf_counter(); o = None
    for _ in range(N): o = jf(*args)
    sync(o)
    return (time.perf_counter() - t0) / N * 1e3

for lvl, (hw, c) in {1: (256, 12), 2: (128, 24), 3: (64, 96)}.items():
    k = jax.random.PRNGKey(lvl)
    p = {
        "actnorm": {"bias": jnp.zeros((c,)), "logs": jnp.zeros((c,))},
        "invconv": flows.invconv_cache(np.linalg.qr(rng.standard_normal((c, c)))[0].astype(np.float32)),
        "affine": flows.init_cond_affine(k, c, 320, 64),
    }
    # randomize zero-init convs so nothing folds away
    p["affine"]["fAffine"]["out"]["w"] = jax.random.normal(k, p["affine"]["fAffine"]["out"]["w"].shape) * 0.05
    x = jnp.asarray(rng.random((1, hw, hw, c)).astype(np.float32))
    ftp = {
        "scale_ft": jnp.asarray(rng.random((1, hw, hw, c)).astype(np.float32) + 0.5),
        "shift_ft": jnp.asarray(rng.random((1, hw, hw, c)).astype(np.float32)),
        "aff1_ft": jnp.asarray(rng.random((1, hw, hw, 64)).astype(np.float32)),
    }

    def chain(x, p, ftp, n=16):
        ld = jnp.zeros((1,))
        for _ in range(n):
            x, ld = flows.actnorm(x, p["actnorm"], ld)
            x, ld = flows.invconv1x1(x, p["invconv"], ld)
            x, ld = flows.cond_affine(x, None, p["affine"], ld, ft_params=ftp)
        return x, ld

    jf = jax.jit(chain)
    t = timeit(jf, x, p, ftp)
    print(f"level {lvl} ({hw}^2, C={c}): 16 cond steps = {t:6.2f} ms")
