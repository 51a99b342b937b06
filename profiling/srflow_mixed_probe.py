"""SRFlow-LP BFSR_PRECISION=mixed (prior-only bf16) A/B. (round 4)

The r3 per-stage attribution (profiling/prec_split.py) measured the
two-branch prior numerically benign at bf16 (102.0 dB vs all-HIGH)
while the three conditioning stages are fragile (~43-47 dB each).  With
the stage scope now wired into SRFlowLPPredictor (srflow_eval.py),
`mixed` runs just the prior at DEFAULT — this probe measures what that
buys at the bench extent (LR 128 -> HR 512) and re-checks fidelity.

Interleaved timing per CLAUDE.md (tunnel variance ~±8%): all variants
compiled first, then alternate timed rounds in ONE process.

    python profiling/srflow_mixed_probe.py [--iters 8 --rounds 3]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--modes", default="high,mixed,default",
                    help="comma list; single mode = differential for "
                         "multi-program process effects")
    args = ap.parse_args()
    modes = tuple(args.modes.split(","))

    import jax
    import jax.numpy as jnp

    import bfsr_tpu.models  # noqa: F401
    from bench import _SRFLOW_ARGS, _balance_flow, _dezero
    from bfsr_tpu import registry
    from bfsr_tpu.ops import nn as fnn
    from bfsr_tpu.pipelines.srflow_eval import SRFlowLPPredictor

    # build + dezero on CPU, ship once (CLAUDE.md: on-device tree builds
    # degrade the process dispatch path ~13x)
    with jax.default_device(jax.devices("cpu")[0]):
        model = registry.make({"name": "srflow", "args": dict(_SRFLOW_ARGS)})
        model.params = _balance_flow(_dezero(model.params))
        model.freeze()
        prior = registry.make({"name": "srflow-unet",
                               "args": {"depth": 3, "dim": 64}})
        prior.params = _dezero(prior.params)
    dev = jax.devices()[0]
    model.params = jax.device_put(model.params, dev)
    prior.params = jax.device_put(prior.params, dev)

    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((1, 128, 128, 3)).astype(np.float32))

    preds, outs = {}, {}
    for mode in modes:
        fnn.set_default_precision(mode)
        p = SRFlowLPPredictor(model, prior)
        o = p._fn(model.params, prior.params, lr)
        np.asarray(o[0, 0, 0, 0])
        preds[mode] = p
        outs[mode] = np.asarray(o)
    fnn.set_default_precision("high")

    if "high" in modes:
        ref = outs["high"].astype(np.float64)
        print(f"{'mode':<10} {'maxabs':>10} {'rms':>10} {'dB':>7}", flush=True)
        for mode in modes:
            if mode == "high":
                continue
            d = np.abs(outs[mode].astype(np.float64) - ref)
            rms = float(np.sqrt((d ** 2).mean()))
            db = -20 * np.log10(rms + 1e-12)
            print(f"{mode:<10} {d.max():>10.3e} {rms:>10.3e} {db:>7.1f}",
                  flush=True)

    def timed(p):
        t0 = time.perf_counter()
        o = None
        for _ in range(args.iters):
            o = p._fn(model.params, prior.params, lr)
        np.asarray(o[0, 0, 0, 0])
        return (time.perf_counter() - t0) / args.iters * 1e3

    for r in range(args.rounds):
        line = f"round {r}:"
        for mode in modes:
            ms = timed(preds[mode])
            line += f"  {mode} {ms:6.1f} ms ({512*512/ms/1e3:5.2f} MP/s)"
        print(line, flush=True)


if __name__ == "__main__":
    main()
