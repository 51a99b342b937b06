"""Real-hardware SRFlow NLL training curve at the full reference config.

The reference ships SRFlow-LP training as "coming soon"
(SRFlow-LP/README.md:11-12); this framework implements it
(pipelines/srflow_train.py mirrors SRFlow_model.optimize_parameters,
SRFlow_model.py:136-170).  Complementing the CPU convergence test
(tests/test_convergence.py::test_srflow_nll_training_learns), this runs
the FULL-SIZE model (nf=64, nb=23, K=16, L=3) at the reference training
shape (batch 12, GT 160, quantization noise, RRDB gradient mask) on one
TPU chip against a synthetic-but-learnable task, and records NLL-vs-step
for BENCH_NOTES.

    python profiling/srflow_train_curve.py [--steps 400]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from bfsr_tpu import registry
import bfsr_tpu.models  # noqa: F401
from bfsr_tpu.pipelines.srflow_train import make_srflow_train_step


def _checker(H, W, period=4):
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pat = (((yy // period) + (xx // period)) % 2).astype(np.float32) * 2 - 1
    return pat[..., None] * np.asarray([1.0, -0.5, 0.25], np.float32)


def _smooth_lr(rng, n, h, w):
    from bfsr_tpu.data.wrappers import resize_bilinear_np

    coarse = rng.random((n, max(2, h // 4), max(2, w // 4), 3)).astype(np.float32)
    out = np.stack([resize_bilinear_np(c, (h, w)) for c in coarse])
    return (0.25 + 0.5 * out).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--gt", type=int, default=160)
    args = ap.parse_args()

    from bfsr_tpu.data.wrappers import resize_bilinear_np

    model = registry.make({"name": "srflow", "args": {
        "in_nc": 3, "out_nc": 3, "nf": 64, "nb": 23, "scale": 4,
        "K": 16, "L": 3, "hidden_channels": 64,
        "additional_steps": 2, "split_enable": True,
        "stack_blocks": [1, 8, 15, 22], "stack_concat": True,
        "fea_up0": True}})
    # reference optimizer: Adam lr 2.5e-4, grad clip
    optimizer = optax.chain(optax.clip_by_global_norm(10.0),
                            optax.adam(2.5e-4))
    opt_state = optimizer.init(model.params)
    step = make_srflow_train_step(model, optimizer, weight_fl=1.0,
                                  rrdb_unfreeze_step=None)

    G, B = args.gt, args.batch
    h = w = G // 4
    rng = np.random.default_rng(0)
    lq = _smooth_lr(rng, B, h, w)
    up = np.stack([resize_bilinear_np(x, (G, G)) for x in lq])
    gt = np.clip(up + 0.08 * _checker(G, G), 0.0, 1.0).astype(np.float32)
    batch = {"GT": jnp.asarray(gt), "LQ": jnp.asarray(lq)}

    params = model.params
    marks = sorted({0, 1, 2, 5, 10, 20, 50, 100, 200, 300, args.steps - 1}
                   | set(range(5))
                   | set(range(max(0, args.steps - 10), args.steps)))
    kept = {}
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    t_first = None
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, mets = step(params, opt_state, batch, sub,
                                       jnp.asarray(i))
        if i in marks:
            kept[i] = mets["loss"]
        if t_first is None:
            np.asarray(kept[0])
            t_first = time.perf_counter() - t0
    np.asarray(jax.tree_util.tree_leaves(params)[0].ravel()[0])
    dt = time.perf_counter() - t0 - t_first
    print(f"\ncompile+first step {t_first:.1f}s; then "
          f"{dt / max(1, args.steps - 1) * 1e3:.0f} ms/step "
          f"(batch {B}, GT {G})")
    losses = {i: float(v) for i, v in kept.items()}
    print("NLL (bits/dim) vs step:")
    for mk in sorted(losses):
        print(f"  step {mk:>5}: {losses[mk]:.3f}")
    first5 = np.mean([losses[i] for i in range(5)])
    last10 = np.mean([losses[i] for i in sorted(losses)[-10:]])
    print(f"  mean first 5: {first5:.3f}   mean last 10: {last10:.3f}   "
          f"drop {first5 - last10:.3f} bits/dim")

    # held-out: heat-0 decode PSNR, trained vs init
    elq = _smooth_lr(np.random.default_rng(99), 2, h, w)
    eup = np.stack([resize_bilinear_np(x, (G, G)) for x in elq])
    egt = np.clip(eup + 0.08 * _checker(G, G), 0.0, 1.0).astype(np.float32)
    z0 = model.sample_z(None, 0.0, 2, (h, w))

    def psnr(p):
        sr, _ = jax.jit(lambda p, lq: model.reverse_flow(
            p, lq, z=z0, eps_std=0.0, key=jax.random.PRNGKey(1)))(
                p, jnp.asarray(elq))
        err = np.clip(np.asarray(sr), 0, 1).astype(np.float64) - egt
        return -10 * np.log10(np.mean(err ** 2) + 1e-12)

    print("held-out heat-0 PSNR (2 unseen images):")
    print(f"  init params:    {psnr(model.params):.2f} dB")
    print(f"  trained params: {psnr(params):.2f} dB")


if __name__ == "__main__":
    main()
