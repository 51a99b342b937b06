"""SRFlow-LP per-stage MFU table (round-2 verdict #6: floors as numbers).

For each pipeline stage at LR 128 -> HR 512: measured device time,
logical FLOPs, achieved TF/s, MFU vs the measured ~60 TF/s
Precision.HIGH matmul roofline, and the flops-only floor ms — so "this
stage is at its floor" is a measured ratio, not a narrative.

FLOP sources: XLA cost_analysis for the unrolled stages; the RRDB trunk
runs under lax.scan whose body cost_analysis counts ONCE, so the trunk
is corrected analytically (nb * 3 dense blocks * the 5-conv MAC sum).
cost_analysis 'bytes accessed' counts fusion-internal traffic (it
reports >roofline GB/s), so no bandwidth floor is derived — the flops
floor is the optimistic bound.  Run: python profiling/srflow_mfu.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bfsr_tpu.models  # noqa
from bfsr_tpu import registry
from bfsr_tpu.models.srflow.srflow_net import standardize_epses
from bfsr_tpu.ops.interp import resize_bilinear

HIGH_TFS = 60e12     # measured HIGH-precision matmul roofline

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


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(jf, *args, N=10):
    for _ in range(2):
        sync(jf(*args))
    t0 = time.perf_counter()
    o = None
    for _ in range(N):
        o = jf(*args)
    sync(o)
    return (time.perf_counter() - t0) / N * 1e3


def cost(jf, *args):
    c = jf.lower(*args).compile().cost_analysis()
    return float(c.get("flops", 0.0))


def trunk_flops_analytic(nf=64, gc=32, nb=23, h=128, w=128):
    """Logical trunk FLOPs: nb RRDBs x 3 dense blocks x 5 convs (the scan
    body that cost_analysis counts once)."""
    macs_px = 9 * sum((nf + i * gc) * (gc if i < 4 else nf)
                      for i in range(5)) * 3 * nb
    return macs_px * h * w * 2


rows = []


def stage(name, jf, *args, extra_flops=0.0):
    ms = timeit(jf, *args)
    fl = cost(jf, *args) + extra_flops
    tfs = fl / (ms / 1e3) / 1e12
    floor_ms = fl / HIGH_TFS * 1e3
    rows.append((name, ms, fl / 1e9, tfs, tfs * 1e12 / HIGH_TFS,
                 floor_ms, ms / floor_ms if floor_ms > 0 else float("inf")))
    return jf(*args)


pre = jax.jit(lambda p, x: model.preprocess(p, x))
# scan body counted once by cost_analysis: add the other nb-1 iterations
lr_enc = stage("RRDB preprocess", pre, params, lr,
               extra_flops=trunk_flops_analytic() * 22 / 23)

ftc = jax.jit(lambda p, e: model.precompute_ft(p, e))
ft_cache = stage("precompute_ft", ftc, params, lr_enc)

lr_up = resize_bilinear(lr, (512, 512))
nf = jax.jit(lambda p, up, x, enc, fc: model.normal_flow(
    p, up, x, add_gt_noise=False, lr_enc=enc, ft_cache=fc))
epses, _, _ = stage("normal_flow (enc)", nf, params, lr_up, lr, lr_enc,
                    ft_cache)

epses_s = standardize_epses(epses)
pr = jax.jit(lambda pp, e: prior.apply(pp, e))
learned = stage("two-branch prior", pr, prior.params, epses_s)

rf = jax.jit(lambda p, x, e, enc, fc: model.reverse_flow(
    p, x, epses=e, add_gt_noise=False, lr_enc=enc, ft_cache=fc))
stage("reverse_flow (dec)", rf, params, lr, learned, lr_enc, ft_cache)

print(f"\n{'stage':<20}{'ms':>8}{'GF':>9}{'TF/s':>8}{'MFU':>7}"
      f"{'floor ms':>10}{'x floor':>9}")
tot_ms = tot_fl = tot_floor = 0.0
for (name, ms, gf, tfs, mfu, fms, ratio) in rows:
    print(f"{name:<20}{ms:>8.2f}{gf:>9.1f}{tfs:>8.1f}{mfu:>6.0%}"
          f"{fms:>10.2f}{ratio:>9.2f}")
    tot_ms += ms
    tot_fl += gf
    tot_floor += fms
print(f"{'TOTAL':<20}{tot_ms:>8.2f}{tot_fl:>9.1f}{tot_fl / tot_ms:>8.1f}"
      f"{tot_fl / tot_ms / 60:>6.0%}{tot_floor:>10.2f}"
      f"{tot_ms / tot_floor:>9.2f}")
print("\nMFU = achieved TF/s / the 60 TF/s HIGH matmul roofline; floor ms"
      " = flops/60TF (optimistic: ignores bandwidth, lane waste, VPU work)")
