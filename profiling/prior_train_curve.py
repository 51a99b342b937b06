"""Real-hardware SRFlow-LP prior (latent-module) training curve, full size.

The reference ships this trainer as "coming soon" (SRFlow-LP/README.md:11);
pipelines/srflow_prior_train.py implements it.  Complementing the CPU
convergence test (tests/test_convergence.py::test_srflow_prior_training_
learns), this runs the FULL-SIZE stack — frozen SRFlowNet (nf=64, nb=23,
K=16, L=3, actnorms primed from the first batch) + two-branch UNet prior
(depth 3, dim 64) — at the reference training shape (batch 12, GT 160) on
one TPU chip against the synthetic-but-learnable task (GT = bilinear-up(LQ)
+ fixed checker; FRESH pairs each step so the prior learns the rule, not
the images), and records loss-vs-step + held-out decode PSNR for
BENCH_NOTES.

    python profiling/prior_train_curve.py [--steps 400]
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
from bfsr_tpu.pipelines.srflow_prior_train import make_srflow_prior_train_step


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
    ap.add_argument("--amp", type=float, default=0.12)
    args = ap.parse_args()

    from bfsr_tpu.data.wrappers import resize_bilinear_np

    # build on CPU, ship one device_put (CLAUDE.md: on-device tree builds
    # over the tunnel degrade the process dispatch path)
    with jax.default_device(jax.devices("cpu")[0]):
        model = registry.make({"name": "srflow", "args": {
            "in_nc": 3, "out_nc": 3, "nf": 64, "nb": 23, "scale": 4,
            "K": 16, "L": 3, "hidden_channels": 64,
            "additional_steps": 2, "split_enable": True,
            "stack_blocks": [1, 8, 15, 22], "stack_concat": True,
            "fea_up0": True}})
        prior = registry.make({"name": "srflow-unet",
                               "args": {"depth": 3, "dim": 64}})
    G, B = args.gt, args.batch
    h = w = G // 4
    rng = np.random.default_rng(0)
    pat = args.amp * _checker(G, G)

    def make_pair(g, n):
        lq = _smooth_lr(g, n, h, w)
        up = np.stack([resize_bilinear_np(x, (G, G)) for x in lq])
        gt = np.clip(up + pat, 0.0, 1.0).astype(np.float32)
        return {"GT": jnp.asarray(gt), "LQ": jnp.asarray(lq)}

    batch0 = make_pair(rng, B)
    # data-dependent actnorm init from the first batch (the trained-flow
    # regime: whitened epses make the eval contract's per-pixel
    # standardization near-lossless), then freeze — all on CPU
    with jax.default_device(jax.devices("cpu")[0]):
        model.params = model.prime_actnorms(
            model.params,
            jax.device_put(batch0["GT"], jax.devices("cpu")[0]),
            jax.device_put(batch0["LQ"], jax.devices("cpu")[0]))
        model.freeze()
    dev = jax.devices()[0]
    model.params = jax.device_put(model.params, dev)
    prior.params = jax.device_put(prior.params, dev)

    optimizer = optax.adam(2e-4)
    opt_state = optimizer.init(prior.params)
    step = make_srflow_prior_train_step(model, prior, optimizer,
                                        eps_weight=1.0, image_weight=2.0)

    params = prior.params
    marks = sorted({0, 1, 2, 5, 10, 20, 50, 100, 200, 300, args.steps - 1}
                   | set(range(5))
                   | set(range(max(0, args.steps - 10), args.steps)))
    kept = {}
    t0 = time.perf_counter()
    t_first = None
    for i in range(args.steps):
        b = make_pair(rng, B)  # fresh pairs: learn the rule
        params, opt_state, mets = step(params, opt_state, model.params, b)
        if i in marks:
            kept[i] = mets["loss"]
        if t_first is None:
            np.asarray(kept[0])
            t_first = time.perf_counter() - t0
    np.asarray(jax.tree_util.tree_leaves(params)[0].ravel()[0])
    dt = time.perf_counter() - t0 - t_first
    print(f"\ncompile+first step {t_first:.1f}s; then "
          f"{dt / max(1, args.steps - 1) * 1e3:.0f} ms/step incl. host "
          f"datagen (batch {B}, GT {G})")
    losses = {i: float(v) for i, v in kept.items()}
    print("prior loss (eps L1 + 2*img L1) vs step:")
    for mk in sorted(losses):
        print(f"  step {mk:>5}: {losses[mk]:.4f}")
    first5 = np.mean([losses[i] for i in range(5)])
    last10 = np.mean([losses[i] for i in sorted(losses)[-10:]])
    print(f"  mean first 5: {first5:.4f}   mean last 10: {last10:.4f}   "
          f"ratio {last10 / first5:.3f}")

    # held-out eval through the EVAL contract (srflow_eval._impl data
    # path): encode lr_up -> standardize -> prior -> decode
    from bfsr_tpu.models.srflow.srflow_net import standardize_epses
    from bfsr_tpu.ops.interp import resize_bilinear

    eb = make_pair(np.random.default_rng(99), 2)
    egt = np.asarray(eb["GT"])

    @jax.jit
    def eval_decode(prior_params, lq):
        lr_up = resize_bilinear(lq, (lq.shape[1] * 4, lq.shape[2] * 4))
        epses_lr, _, _ = model.normal_flow(model.params, lr_up, lq,
                                           add_gt_noise=False,
                                           want_logdet=False)
        eps_in = standardize_epses(epses_lr)
        learned = prior.apply(prior_params, eps_in)
        sr_l, _ = model.reverse_flow(model.params, lq, epses=learned,
                                     add_gt_noise=False, want_logdet=False)
        sr_np, _ = model.reverse_flow(model.params, lq, epses=epses_lr,
                                      add_gt_noise=False, want_logdet=False)
        return sr_l, sr_np

    def psnr(x):
        err = np.clip(np.asarray(x), 0, 1).astype(np.float64) - egt
        return -10 * np.log10(np.mean(err ** 2) + 1e-12)

    sr_tr, sr_np = eval_decode(params, eb["LQ"])
    sr_in, _ = eval_decode(prior.params, eb["LQ"])
    print("held-out decode PSNR (2 unseen images, eval contract):")
    print(f"  no prior (decode raw lr epses): {psnr(sr_np):.2f} dB")
    print(f"  init prior:                     {psnr(sr_in):.2f} dB")
    print(f"  trained prior:                  {psnr(sr_tr):.2f} dB")


if __name__ == "__main__":
    main()
