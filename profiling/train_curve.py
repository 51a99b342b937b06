"""Real-hardware LINF-LP latent-module training curve (round-2 verdict #1).

Trains the flagship-size latent prior (UNet depth 3, dim 64) against the
frozen flagship LINF on one TPU chip at the reference training shape
(batch 16, 48x48 LR crops), on a synthetic-but-learnable task: GT is the
LR bilinear upsample plus a fixed high-frequency checker pattern (same
family as tests/test_convergence.py, scaled up).  Records loss-vs-step
and held-out PSNR (init prior vs trained prior vs no-prior) for
BENCH_NOTES.

    python profiling/train_curve.py [--steps 2000]

Loss is latent-only: the reference adds a VGG perceptual term, but real
VGG19 weights are environment-blocked and a random-VGG loss would just
add noise to the curve (train.py refuses it by default for the same
reason).
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
from bfsr_tpu.ops.interp import grid_sample_bilinear
from bfsr_tpu.pipelines.linf_train import make_train_step
from bfsr_tpu.utils.coords import make_coord_np, make_cell

from __graft_entry__ import _flagship


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return -10.0 * np.log10(mse + 1e-12)


def _smooth_lr(rng, n, h, w):
    from bfsr_tpu.data.wrappers import resize_bilinear_np

    coarse = rng.random((n, max(2, h // 3), max(2, w // 3), 3)).astype(np.float32)
    out = np.stack([resize_bilinear_np(c, (h, w)) for c in coarse])
    return (0.25 + 0.5 * out).astype(np.float32)


def _checker(H, W, period=3):
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pat = (((yy // period) + (xx // period)) % 2).astype(np.float32) * 2.0 - 1.0
    return pat[..., None] * np.asarray([1.0, -0.5, 0.25], np.float32)


def _batch(lr01, coord_np, cell_np, pattern, amp=0.15):
    from bfsr_tpu.data.wrappers import resize_bilinear_np

    B = lr01.shape[0]
    H, W = coord_np.shape[:2]
    inp_norm = jnp.asarray((lr01 - 0.5) / 0.5)
    coord = jnp.broadcast_to(jnp.asarray(coord_np)[None], (B, H, W, 2))
    lr_up = np.asarray(grid_sample_bilinear(inp_norm, coord, padding_mode="border"))
    delta = np.broadcast_to(amp * pattern, lr_up.shape).astype(np.float32)
    gt_norm = lr_up + delta
    gt01 = np.clip(gt_norm * 0.5 + 0.5, 0.0, 1.0)
    gt_lr_up = np.empty_like(lr_up)
    for b in range(B):
        down = resize_bilinear_np(lr_up[b], lr01.shape[1:3])
        gt_lr_up[b] = lr_up[b] - resize_bilinear_np(down, (H, W))
    return {
        "inp": jnp.asarray(lr01),
        "coord": coord,
        "cell": jnp.broadcast_to(jnp.asarray(cell_np)[None], (B, 2)),
        "gt": jnp.asarray(gt01),
        "gt_pixel": jnp.asarray(delta),
        "gt_lr_up": jnp.asarray(gt_lr_up),
    }, gt_norm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr_size", type=int, default=48)
    ap.add_argument("--scale", type=int, default=2)
    ap.add_argument("--n_train", type=int, default=64,
                    help="distinct training crops cycled through")
    ap.add_argument("--precision", default=None,
                    choices=["default", "high", "highest", "mixed"],
                    help="mixed = bf16 prior fwd+bwd (stage scope in "
                         "linf_train), rest HIGH — the training-side "
                         "counterpart of the eval mixed mode")
    args = ap.parse_args()

    if args.precision:
        from bfsr_tpu.ops.nn import set_default_precision

        set_default_precision(args.precision)

    h = w = args.lr_size
    H, W = h * args.scale, w * args.scale
    model, _ = _flagship()
    prior = registry.make({"name": "unet", "args": {"in_chans": 3, "depth": 3,
                                                    "dim": 64, "bilinear": True}})
    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(prior.params)
    step = make_train_step(model, prior, None, optimizer, vgg_weight=0.0,
                           latent_weight=1.0)

    coord_np = make_coord_np((H, W), flatten=False)
    cell_np = make_cell((H, W))
    pattern = _checker(H, W)
    rng = np.random.default_rng(0)
    lrs = _smooth_lr(rng, args.n_train, h, w)
    n_batches = args.n_train // args.batch
    batches = [
        _batch(lrs[i * args.batch: (i + 1) * args.batch], coord_np, cell_np,
               pattern)[0]
        for i in range(n_batches)
    ]

    init_params = prior.params
    params = prior.params
    marks = sorted({0, 1, 2, 5, 10, 20, 50, 100, 200, 500, 1000, 1500,
                    args.steps - 1} & set(range(args.steps))
                   | set(range(5)) | set(range(max(0, args.steps - 20),
                                               args.steps)))
    kept = {}  # device scalars; fetched AFTER timing (host round-trip ~29ms)
    t0 = time.perf_counter()
    t_first = None
    for i in range(args.steps):
        params, opt_state, mets = step(params, opt_state, model.params, {},
                                       batches[i % n_batches])
        if i in marks:
            kept[i] = mets["latent_l"]
        if t_first is None:
            np.asarray(mets["latent_l"])  # force compile+first-step sync
            t_first = time.perf_counter() - t0
    # params depend on every step: one host fetch syncs the whole chain
    np.asarray(jax.tree_util.tree_leaves(params)[0]).ravel()[0]
    dt = time.perf_counter() - t0 - t_first
    per_step = dt / max(1, args.steps - 1) * 1e3
    losses = {i: float(v) for i, v in kept.items()}

    print(f"\ncompile+first step {t_first:.1f}s; then {per_step:.1f} ms/step "
          f"(batch {args.batch}, LR {h}x{w} -> GT {H}x{W})")
    print("loss-vs-step (latent L1):")
    for mk in sorted(losses):
        print(f"  step {mk:>5}: {losses[mk]:.4f}")
    first5 = np.mean([losses[i] for i in range(5)])
    last20 = np.mean([losses[i] for i in sorted(losses)[-20:]])
    print(f"  mean first 5: {first5:.4f}   mean last 20: {last20:.4f}   "
          f"ratio {last20 / first5:.3f}")

    # held-out eval
    eval_lr = _smooth_lr(np.random.default_rng(999), 4, h, w)
    ebatch, egt_norm = _batch(eval_lr, coord_np, cell_np, pattern)
    inp_norm = (ebatch["inp"] - 0.5) / 0.5
    feat = model.gen_feat(model.params, inp_norm)
    _, z_lr = model.query_log_p(model.params, inp_norm, feat, ebatch["coord"],
                                ebatch["cell"], ebatch["gt_lr_up"])

    def psnr_with(pp):
        z = prior.apply(pp, z_lr, inp_norm, training=False)
        if isinstance(z, tuple):
            z = z[0]
        pred = model.query_rgb(model.params, inp_norm, feat, ebatch["coord"],
                               ebatch["cell"], zmap=z)
        return _psnr(pred, egt_norm)

    pred_np = model.query_rgb(model.params, inp_norm, feat, ebatch["coord"],
                              ebatch["cell"], zmap=z_lr)
    print("held-out PSNR (4 unseen images, same family):")
    print(f"  no-prior (invert z_lr):   {_psnr(pred_np, egt_norm):.2f} dB")
    print(f"  init prior params:        {psnr_with(init_params):.2f} dB")
    print(f"  trained prior params:     {psnr_with(params):.2f} dB")


if __name__ == "__main__":
    main()
