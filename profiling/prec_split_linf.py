"""Which LINF-LP stage loses serving-mode (bf16) quality? (r3 verdict #2)

Per-stage precision attribution for the LINF learned-prior pipeline via
the stage scopes in linf_eval (fnn.stage) + the mixed-mode policy table:
each row traces the predictor with exactly ONE stage at DEFAULT (bf16)
precision and everything else HIGH, and measures the output delta vs the
all-HIGH program.  Then times HIGH vs MIXED (encoder+prior bf16) vs
full serving, interleaved, at the bench extent and (--div2k) the real
DIV2K frame.

    python profiling/prec_split_linf.py [--div2k]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--div2k", action="store_true")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bfsr_tpu.models  # noqa: F401
    from bfsr_tpu.ops import nn as fnn
    from bfsr_tpu import registry
    from bfsr_tpu.pipelines.linf_eval import LINFPredictor
    from bfsr_tpu.utils.coords import make_cell, make_coord_np
    from __graft_entry__ import _flagship

    model, _ = _flagship()
    prior = registry.make({"name": "unet", "args": {"in_chans": 3, "depth": 3,
                                                    "dim": 64,
                                                    "bilinear": True}})
    if args.div2k:
        h, w = 510, 338
    else:
        h = w = 128
    s = 4
    H, W = h * s, w * s
    rng = np.random.default_rng(0)
    inp = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))
    coord = jnp.asarray(make_coord_np((H, W), flatten=False)[None])
    cell = jnp.asarray(make_cell((H, W))[None])
    gt_lr_up = jnp.asarray((rng.random((1, H, W, 3)) - 0.5).astype(np.float32))

    D = jax.lax.Precision.DEFAULT
    stages = ["encoder", "head", "prior", "addback"]

    def run(mode, policy):
        fnn.set_default_precision(mode)
        fnn.MIXED_POLICY.clear()
        fnn.MIXED_POLICY.update(policy)
        pred = LINFPredictor(model, prior)
        out = pred.predict(model.params, prior.params, inp, coord, cell,
                           gt_lr_up)
        np.asarray(out[0, 0, 0, 0])
        return pred, np.asarray(out)

    _, ref = run("high", {})
    print(f"{'bf16 stage(s)':<24} {'maxabs':>10} {'rms':>10} {'dB':>7}",
          flush=True)

    def row(name, out):
        d = np.abs(out - ref)
        rms = float(np.sqrt((d ** 2).mean()))
        db = -20 * np.log10(rms + 1e-12)
        print(f"{name:<24} {d.max():>10.3e} {rms:>10.3e} {db:>7.1f}",
              flush=True)

    for st in stages:
        _, out = run("mixed", {st: D})
        row(st, out)
    pred_mixed, out = run("mixed", {"encoder": D, "prior": D})
    row("MIXED (encoder+prior)", out)
    _, out = run("default", {})
    row("serving (all)", out)

    # interleaved timing: HIGH vs MIXED variants vs serving
    preds = {}
    for mode, policy in (("high", {}), ("mixed", {"encoder": D, "prior": D}),
                         ("prior-only", {"prior": D}),
                         ("default", {})):
        fnn.set_default_precision("mixed" if policy else mode)
        fnn.MIXED_POLICY.clear()
        fnn.MIXED_POLICY.update(policy)
        p = LINFPredictor(model, prior)
        o = p.predict(model.params, prior.params, inp, coord, cell, gt_lr_up)
        np.asarray(o[0, 0, 0, 0])
        preds[mode] = p

    def timed(p):
        t0 = time.perf_counter()
        o = None
        for _ in range(args.iters):
            o = p.predict(model.params, prior.params, inp, coord, cell,
                          gt_lr_up)
        np.asarray(o[0, 0, 0, 0])
        return (time.perf_counter() - t0) / args.iters * 1e3

    for r in range(args.rounds):
        line = f"round {r}:"
        for mode in ("high", "mixed", "prior-only", "default"):
            ms = timed(preds[mode])
            line += f"  {mode} {ms:7.1f} ms ({H*W/ms/1e3:5.2f} MP/s)"
        print(line, flush=True)
    fnn.set_default_precision("high")
    fnn.MIXED_POLICY.clear()
    fnn.MIXED_POLICY.update({"prior": D})  # the shipped default policy


if __name__ == "__main__":
    main()
