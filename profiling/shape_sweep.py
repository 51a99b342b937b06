#!/usr/bin/env python
"""Hardware shape-hazard sweep: run the DEFAULT predictor paths at
adversarial real-dataset LR extents on the real chip.

Mosaic tiling/DMA hazards (128-lane alignment, sublane %8, scoped-VMEM
budget) do NOT reproduce in interpret mode or on CPU (see CLAUDE.md) —
two shipped bugs (the non-8-multiple single-tile DMA fault, the patch
VMEM compile OOM) were only ever visible on hardware at odd extents.
This sweep pins the default LINF / patch / SRFlow predictors at the LR
shapes the reference's own eval sets produce (Set5 / B100 / Urban100 /
DIV2K, plus known-nasty synthetic extents) and checks the outputs are
finite with the right shape.

    python profiling/shape_sweep.py [--family linf|patch|srflow|all] [--quick]

Each (family, shape) is one jitted compile; the persistent compile cache
makes re-runs cheap.  Results print one line per case; a non-OK line or
a crash is a real shipped-path bug.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# LR extents (h, w) after x4 downsampling of the reference eval sets:
#   Set5 woman 344x228 -> 86x57; B100 321x481 -> 80x120; Urban100
#   644x1024 -> 161x256; DIV2K 2040x1356 -> 510x339 (the headline real
#   shape); plus synthetic extents hitting known Mosaic edges: width with
#   no 8-mult divisor (255), single-tile non-8-multiple widths (57, 63),
#   prime-ish odd extents (123x117).
SHAPES = [
    (86, 57),     # Set5 woman
    (80, 120),    # B100
    (161, 256),   # Urban100
    (123, 117),   # odd/odd, no alignment anywhere
    (63, 255),    # no 8-mult divisor in either extent
    (170, 339),   # tall DIV2K-like odd width
]
SHAPES_FULL = SHAPES + [
    (510, 339),   # DIV2K real shape (slow compile; skipped by --quick)
]


def _sync(out):
    np.asarray(out[..., 0, 0, 0])


def sweep_linf(shapes):
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from bfsr_tpu.pipelines.linf_eval import LINFPredictor
    from bfsr_tpu.utils.coords import make_coord_np, make_cell

    model, prior = _flagship()
    predictor = LINFPredictor(model, prior, tile_queries=65536)
    rng = np.random.default_rng(0)
    ok = True
    for h, w in shapes:
        H, W = h * 4, w * 4
        inp = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))
        gt = jnp.asarray((rng.random((1, H, W, 3)) - 0.5).astype(np.float32))
        coord = jnp.asarray(make_coord_np((H, W), flatten=False)[None])
        cell = jnp.asarray(make_cell((H, W))[None])
        t0 = time.time()
        try:
            out = predictor.predict(model.params, prior.params, inp, coord,
                                    cell, gt)
            _sync(out)
            t_compile = time.time() - t0
            t0 = time.time()
            out = predictor.predict(model.params, prior.params, inp, coord,
                                    cell, gt)
            _sync(out)
            dt = time.time() - t0
            host = np.asarray(out)
            good = host.shape == (1, H, W, 3) and np.isfinite(host).all()
            ok &= good
            print(f"linf   {h:4d}x{w:<4d} -> {H}x{W}: "
                  f"{'OK ' if good else 'BAD'} {dt*1e3:7.1f} ms "
                  f"({H*W/dt/1e6:5.2f} MP/s, compile {t_compile:.0f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            ok = False
            print(f"linf   {h:4d}x{w:<4d}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    return ok


def sweep_patch(shapes):
    import jax.numpy as jnp

    from bfsr_tpu import registry
    import bfsr_tpu.models  # noqa: F401
    from bfsr_tpu.pipelines.linf_eval import LINFPredictor
    from bfsr_tpu.utils.coords import make_coord_np, make_cell

    model = registry.make({"name": "linf-patch", "args": {
        "encoder_spec": {"name": "edsr-baseline",
                         "args": {"no_upsampling": True}},
        "imnet_spec": {"name": "flow", "args": {"name": "flow"}},
        "flow_layers": 10, "num_layer": 3, "hidden_dim": 256,
        "patch_size": 3}})
    model.params["imnet"]["w"] = (model.params["imnet"]["w"] * 0.05
                                  + jnp.eye(27)[None])
    model.freeze()
    prior = registry.make({"name": "unet", "args": {"in_chans": 27, "depth": 3,
                                                    "dim": 64,
                                                    "bilinear": True}})
    predictor = LINFPredictor(model, prior, tile_queries=65536)
    rng = np.random.default_rng(0)
    ok = True
    for h, w in shapes:
        # patch-center grid exactly as the shipped eval builds it (the
        # wrapper always pads, even at %ps==0 — linf_eval.py warmup path)
        H, W = h * 4, w * 4
        Hq = (H + (3 - H % 3)) // 3
        Wq = (W + (3 - W % 3)) // 3
        inp = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))
        gt = jnp.asarray((rng.random((1, Hq, Wq, 27)) - 0.5).astype(np.float32))
        coord = jnp.asarray(make_coord_np((Hq, Wq), flatten=False)[None])
        # cell is 2/H of the UNPADDED HR target — matching the shipped
        # warmup_predictor patch branch (ADVICE r3: (Hq*3, Wq*3) compiled a
        # slightly different scale-conditioning than production)
        cell = jnp.asarray(make_cell((H, W))[None])
        t0 = time.time()
        try:
            out = predictor.predict(model.params, prior.params, inp, coord,
                                    cell, gt)
            _sync(out)
            t_compile = time.time() - t0
            t0 = time.time()
            out = predictor.predict(model.params, prior.params, inp, coord,
                                    cell, gt)
            _sync(out)
            dt = time.time() - t0
            host = np.asarray(out)
            good = (host.shape == (1, Hq * 3, Wq * 3, 3)
                    and np.isfinite(host).all())
            ok &= good
            print(f"patch  {h:4d}x{w:<4d} -> {Hq*3}x{Wq*3}: "
                  f"{'OK ' if good else 'BAD'} {dt*1e3:7.1f} ms "
                  f"({Hq*3*Wq*3/dt/1e6:5.2f} MP/s, compile {t_compile:.0f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            ok = False
            print(f"patch  {h:4d}x{w:<4d}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    return ok


def sweep_srflow(shapes):
    import jax.numpy as jnp

    from bench import _SRFLOW_ARGS
    from bfsr_tpu import registry
    import bfsr_tpu.models  # noqa: F401
    from bfsr_tpu.pipelines.srflow_eval import SRFlowLPPredictor

    model = registry.make({"name": "srflow", "args": dict(_SRFLOW_ARGS)}).freeze()
    prior = registry.make({"name": "srflow-unet", "args": {"depth": 3,
                                                           "dim": 64}})
    predictor = SRFlowLPPredictor(model, prior)
    rng = np.random.default_rng(0)
    ok = True
    for h, w in shapes:
        # predict() takes an UNBATCHED (h, w, 3) [0,1] image and handles
        # the %2 reflect pad + crop itself
        lr = rng.random((h, w, 3)).astype(np.float32)
        t0 = time.time()
        try:
            host = predictor.predict(lr)
            t_compile = time.time() - t0
            t0 = time.time()
            host = predictor.predict(lr)
            dt = time.time() - t0
            good = (host.shape == (h * 4, w * 4, 3)
                    and np.isfinite(host).all())
            ok &= good
            # NB: predict() returns numpy, so dt INCLUDES the full-image
            # host fetch over the ~5 MB/s tunnel — hazard check, not a
            # throughput number (bench.py --srflow times on-device)
            print(f"srflow {h:4d}x{w:<4d} -> {h*4}x{w*4}: "
                  f"{'OK ' if good else 'BAD'} {dt*1e3:7.1f} ms e2e+fetch "
                  f"(compile {t_compile:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            ok = False
            print(f"srflow {h:4d}x{w:<4d}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    return ok


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="all",
                   choices=["linf", "patch", "srflow", "all"])
    p.add_argument("--quick", action="store_true",
                   help="skip the slow-compile DIV2K full shape")
    args = p.parse_args()
    shapes = SHAPES if args.quick else SHAPES_FULL

    ok = True
    if args.family in ("linf", "all"):
        ok &= sweep_linf(shapes)
    if args.family in ("patch", "all"):
        ok &= sweep_patch(shapes)
    if args.family in ("srflow", "all"):
        ok &= sweep_srflow(shapes)
    print("SWEEP", "PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
