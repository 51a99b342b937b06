"""SRFlow-LP per-stage MFU table (round-2 verdict #6: floors as numbers).

For each pipeline stage at LR 128 -> HR 512: measured device time, XLA
logical FLOPs + HBM bytes (compiled cost_analysis), achieved TF/s and
GB/s, and the roofline floor  max(flops/HIGH_TFs, bytes/STREAM_GBs)  so
"this stage is at its floor" is a measured ratio, not a narrative.

Rooflines are the chip numbers measured in round 1 (BENCH_NOTES):
~60 TF/s at Precision.HIGH (logical flops; the 3-pass bf16 split costs
3x the 158 TF/s bf16 peak) and ~295 GB/s HBM streaming.

Caveat: cost_analysis counts custom calls (Pallas) as 0 flops; the
SRFlow path is XLA-only (scatter trunk, im2col matmuls), so counts are
complete here.  Run: python profiling/srflow_mfu.py
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
STREAM_GBS = 295e9   # measured HBM streaming roofline

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
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


rows = []


def stage(name, jf, *args):
    ms = timeit(jf, *args)
    fl, by = cost(jf, *args)
    t = ms / 1e3
    tfs = fl / t / 1e12
    gbs = by / t / 1e9
    floor_ms = max(fl / HIGH_TFS, by / STREAM_GBS) * 1e3
    rows.append((name, ms, fl / 1e9, by / 1e9, tfs, gbs, floor_ms,
                 ms / floor_ms if floor_ms > 0 else float("inf")))
    return jf(*args)


pre = jax.jit(lambda p, x: model.preprocess(p, x))
lr_enc = stage("RRDB preprocess", pre, params, lr)

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

print(f"\n{'stage':<20}{'ms':>8}{'GF':>9}{'GB':>8}{'TF/s':>8}{'GB/s':>8}"
      f"{'floor ms':>10}{'x floor':>9}")
tot_ms = tot_fl = tot_by = tot_floor = 0.0
for (name, ms, gf, gb, tfs, gbs, fms, ratio) in rows:
    print(f"{name:<20}{ms:>8.2f}{gf:>9.1f}{gb:>8.2f}{tfs:>8.1f}{gbs:>8.0f}"
          f"{fms:>10.2f}{ratio:>9.2f}")
    tot_ms += ms
    tot_fl += gf
    tot_by += gb
    tot_floor += fms
print(f"{'TOTAL':<20}{tot_ms:>8.2f}{tot_fl:>9.1f}{tot_by:>8.2f}"
      f"{tot_fl / tot_ms:>8.1f}{tot_by / tot_ms * 1e3:>8.0f}"
      f"{tot_floor:>10.2f}{tot_ms / tot_floor:>9.2f}")
print("\nMFU vs HIGH roofline = TF/s / 60;  floor ms = "
      "max(flops/60TF, bytes/295GB)")
