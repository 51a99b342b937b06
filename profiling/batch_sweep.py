"""Batch>1 single-chip serving throughput (r4 verdict #3).

Every headline number so far is one 512^2 image per dispatch; the stages
pinned at 11-33% MFU by lane waste and odd extents (SRFlow flow steps on
12/24/96-ch states, Cout<=64 convs) are exactly the shapes batching
amortizes.  This probe measures LINF 512^2 and SRFlow 512^2 at
B in {1, 2, 4, 8} under HIGH and mixed, MP/s/chip per row.

    python profiling/batch_sweep.py [--pipeline linf|srflow|both]

Methodology per CLAUDE.md: params built on CPU and shipped once; timing
synced by a host fetch; both precision modes compiled in ONE process and
the B-rounds interleaved so host-load drift hits both equally.  Run solo
on an idle host.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LR = 128
SCALE = 4
WARMUP = 2
ITERS = 8
ROUNDS = 3


def _time(fn, sync, iters=ITERS, rounds=ROUNDS):
    for _ in range(WARMUP):
        sync(fn())
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


def sweep_srflow(batches):
    import jax
    import jax.numpy as jnp

    import bfsr_tpu.models  # noqa: F401
    from bfsr_tpu import registry
    from bfsr_tpu.ops import nn as fnn
    from bfsr_tpu.pipelines.srflow_eval import SRFlowLPPredictor
    from bench import _SRFLOW_ARGS

    with jax.default_device(jax.devices("cpu")[0]):
        model = registry.make({"name": "srflow",
                               "args": dict(_SRFLOW_ARGS)}).freeze()
        prior = registry.make({"name": "srflow-unet",
                               "args": {"depth": 3, "dim": 64}})
    dev = jax.devices()[0]
    model.params = jax.device_put(model.params, dev)
    prior.params = jax.device_put(prior.params, dev)

    rng = np.random.default_rng(0)
    rows = []
    for mode in ("high", "mixed"):
        fnn.set_default_precision(mode)
        pred = SRFlowLPPredictor(model, prior)
        for B in batches:
            lr = jnp.asarray(rng.random((B, LR, LR, 3)).astype(np.float32))
            try:
                dt = _time(lambda: pred._fn(model.params, prior.params, lr),
                           lambda o: np.asarray(o[0, 0, 0, 0]))
            except Exception as e:  # noqa: BLE001 - OOM rows are data
                rows.append(("srflow", mode, B, None, None, type(e).__name__))
                print(f"srflow {mode:5s} B={B}: FAILED {type(e).__name__}",
                      flush=True)
                continue
            mps = B * (LR * SCALE) ** 2 / dt / 1e6
            rows.append(("srflow", mode, B, dt * 1e3, mps, ""))
            print(f"srflow {mode:5s} B={B}: {dt * 1e3:7.1f} ms/call  "
                  f"{mps:6.2f} MP/s  ({mps / B:5.2f} MP/s/img)", flush=True)
    fnn.set_default_precision("high")
    return rows


def sweep_linf(batches):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from bfsr_tpu.ops import nn as fnn
    from bfsr_tpu.pipelines.linf_eval import LINFPredictor
    from bfsr_tpu.utils.coords import make_coord_np, make_cell

    with jax.default_device(jax.devices("cpu")[0]):
        model, prior = _flagship()
    dev = jax.devices()[0]
    model.params = jax.device_put(model.params, dev)
    prior.params = jax.device_put(prior.params, dev)

    H = W = LR * SCALE
    rng = np.random.default_rng(0)
    coord1 = make_coord_np((H, W), flatten=False)[None]
    cell1 = make_cell((H, W))[None]
    rows = []
    for mode in ("high", "mixed"):
        fnn.set_default_precision(mode)
        pred = LINFPredictor(model, prior, tile_queries=65536)
        for B in batches:
            inp = jnp.asarray(rng.random((B, LR, LR, 3)).astype(np.float32))
            gt = jnp.asarray((rng.random((B, H, W, 3)) - 0.5)
                             .astype(np.float32))
            coord = jnp.asarray(np.broadcast_to(coord1, (B, H, W, 2)).copy())
            cell = jnp.asarray(np.broadcast_to(cell1, (B, 2)).copy())
            try:
                dt = _time(lambda: pred.predict(model.params, prior.params,
                                                inp, coord, cell, gt),
                           lambda o: np.asarray(o[0, 0, 0, 0]))
            except Exception as e:  # noqa: BLE001
                rows.append(("linf", mode, B, None, None, type(e).__name__))
                print(f"linf   {mode:5s} B={B}: FAILED {type(e).__name__}",
                      flush=True)
                continue
            mps = B * H * W / dt / 1e6
            rows.append(("linf", mode, B, dt * 1e3, mps, ""))
            print(f"linf   {mode:5s} B={B}: {dt * 1e3:7.1f} ms/call  "
                  f"{mps:6.2f} MP/s  ({mps / B:5.2f} MP/s/img)", flush=True)
    fnn.set_default_precision("high")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipeline", choices=["linf", "srflow", "both"],
                    default="both")
    ap.add_argument("--batches", default="1,2,4,8")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]
    if args.pipeline in ("linf", "both"):
        sweep_linf(batches)
    if args.pipeline in ("srflow", "both"):
        sweep_srflow(batches)


if __name__ == "__main__":
    main()
