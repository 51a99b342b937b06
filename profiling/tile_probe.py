#!/usr/bin/env python
"""Interleaved A/B: fixed-T row tiling (rows = tile_queries // W, last
tile padded) vs equalized row tiling (same tile count, least T covering
H) at real small eval extents.

At Set5-like shapes the fixed form pads up to 63% dead query rows
(344x228: T=280 -> Hp=560).  Equalizing keeps the tile count and trims
T to ceil(H / n_tiles) (8-aligned): 344 -> Hp=352.  Headline shapes are
unchanged by construction (512^2: T=128 either way; DIV2K: T=48 both).

Interleaved in ONE process per CLAUDE.md A/B methodology (tunnel
variance ~±8%).

    python profiling/tile_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = [(86, 57), (123, 117), (80, 120)]
ROUNDS = 6
ITERS = 4


def main():
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from bfsr_tpu.pipelines import linf_eval
    from bfsr_tpu.pipelines.linf_eval import LINFPredictor
    from bfsr_tpu.utils.coords import make_coord_np, make_cell

    model, prior = _flagship()

    fixed = LINFPredictor(model, prior, tile_queries=65536)
    # variant A: the pre-round-3 fixed-T behavior
    fixed._tile_rows = lambda W, H=None: max(
        8, ((65536 // max(W, 1)) // 8) * 8)
    eq = LINFPredictor(model, prior, tile_queries=65536)  # shipped form

    rng = np.random.default_rng(0)
    for h, w in SHAPES:
        H, W = h * 4, w * 4
        inp = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))
        gt = jnp.asarray((rng.random((1, H, W, 3)) - 0.5).astype(np.float32))
        coord = jnp.asarray(make_coord_np((H, W), flatten=False)[None])
        cell = jnp.asarray(make_cell((H, W))[None])

        def run(p):
            out = p.predict(model.params, prior.params, inp, coord, cell, gt)
            np.asarray(out[0, 0, 0, 0])
            return out

        ra = run(fixed)
        rb = run(eq)  # compile both before timing
        err = float(jnp.abs(ra - rb).max())
        ta, tb = [], []
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = run(fixed)
            ta.append((time.perf_counter() - t0) / ITERS)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = run(eq)
            tb.append((time.perf_counter() - t0) / ITERS)
        a, b = min(ta) * 1e3, min(tb) * 1e3
        print(f"{h:4d}x{w:<4d}: fixed {a:6.1f} ms | equalized {b:6.1f} ms "
              f"({a / b:.2f}x, max|diff| {err:.2e})", flush=True)


if __name__ == "__main__":
    main()
