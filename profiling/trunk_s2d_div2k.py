"""RRDB trunk scatter-XLA vs dense-s2d Pallas at the SRFlow DIV2K LR
extent (r3 verdict #7: 510x338 is unmeasured middle ground between the
s2d win at 512^2 and the scatter win at odd 171^2).

Interleaved A/B, both compiled in one process (CLAUDE.md methodology).

    python profiling/trunk_s2d_div2k.py [--hw 510 338] [--nb 23]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=(510, 338))
    ap.add_argument("--nb", type=int, default=23)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bfsr_tpu.models import rrdb as R

    H, W = args.hw
    key = jax.random.PRNGKey(0)
    # build on CPU, ship once (CLAUDE.md: on-device init degrades the
    # process's subsequent dispatch path)
    with jax.default_device(jax.devices("cpu")[0]):
        params = R.init_rrdb(key, nb=args.nb, upsampling=False)
    params = jax.device_put(params, jax.devices()[0])
    rng = np.random.default_rng(0)
    fea = jnp.asarray(rng.random((1, H, W, 64), dtype=np.float32) - 0.5)

    @jax.jit
    def scatter(fea):
        t, _ = R._trunk_scan(params["trunk"], fea)
        from bfsr_tpu.ops import nn as fnn

        return fea + fnn.conv2d(t, params["trunk_conv"])

    @jax.jit
    def s2d(fea):
        return R._trunk_s2d(params, fea)

    def sync(o):
        np.asarray(o[0, 0, 0])

    t0 = time.perf_counter()
    a = scatter(fea)
    sync(a)
    print(f"A (scatter XLA) compile {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    b = s2d(fea)
    sync(b)
    print(f"B (dense s2d)  compile {time.perf_counter()-t0:.1f}s", flush=True)
    d = np.abs(np.asarray(a) - np.asarray(b))
    print(f"agree: max {d.max():.3e}", flush=True)

    def timed(fn):
        t0 = time.perf_counter()
        o = None
        for _ in range(args.iters):
            o = fn(fea)
        sync(o)
        return (time.perf_counter() - t0) / args.iters * 1e3

    for r in range(args.rounds):
        ta, tb = timed(scatter), timed(s2d)
        print(f"round {r}: scatter {ta:7.1f} ms   s2d {tb:7.1f} ms   "
              f"ratio {ta/tb:.2f}x", flush=True)


if __name__ == "__main__":
    main()
