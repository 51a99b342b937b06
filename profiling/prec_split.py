"""Which SRFlow-LP stage loses the serving-mode (bf16) quality?

bench.py --precision-delta srflow measured 28.3 dB agreement vs HIGH
(LINF: 67.8) — the bf16 error compounds through the 54-step affine chain.
This probe traces the predictor body with PER-STAGE precision (the global
mode is read at trace time, and stages trace sequentially), measuring the
output delta when exactly one stage runs bf16:

    python profiling/prec_split.py

Stages: trunk (RRDB preprocess), ft (precompute_ft conditioning),
flows (normal_flow+reverse_flow step NNs), prior (two-branch UNet).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bfsr_tpu.models  # noqa: F401
from bfsr_tpu import registry
from bfsr_tpu.models.srflow.srflow_net import standardize_epses
from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.ops.interp import resize_bilinear

ARGS = {"in_nc": 3, "out_nc": 3, "nf": 64, "nb": 23, "scale": 4,
        "K": 16, "L": 3, "hidden_channels": 64, "additional_steps": 2,
        "split_enable": True, "stack_blocks": (1, 8, 15, 22),
        "stack_concat": True, "fea_up0": True}
LR = 128


class _prec:
    def __init__(self, mode):
        self.mode = mode

    def __enter__(self):
        self.saved = fnn.default_precision()
        fnn.set_default_precision(self.mode)

    def __exit__(self, *a):
        fnn.set_default_precision("high" if self.saved == jax.lax.Precision.HIGH
                                  else "default" if self.saved == jax.lax.Precision.DEFAULT
                                  else "highest")


def build_impl(model, prior, bf16_stages):
    def impl(params, prior_params, lr):
        s = model.scale
        h, w = lr.shape[1], lr.shape[2]
        lr_up = resize_bilinear(lr, (h * s, w * s))
        with _prec("default" if "trunk" in bf16_stages else "high"):
            lr_enc = model.preprocess(params, lr)
        with _prec("default" if "ft" in bf16_stages else "high"):
            ft_cache = model.precompute_ft(params, lr_enc)
        with _prec("default" if "flows" in bf16_stages else "high"):
            epses, _, _ = model.normal_flow(params, lr_up, lr,
                                            add_gt_noise=False,
                                            lr_enc=lr_enc, ft_cache=ft_cache)
        epses = standardize_epses(epses)
        with _prec("default" if "prior" in bf16_stages else "high"):
            learned = prior.apply(prior_params, epses)
        with _prec("default" if "flows" in bf16_stages else "high"):
            sr, _ = model.reverse_flow(params, lr, epses=learned,
                                       add_gt_noise=False, lr_enc=lr_enc,
                                       ft_cache=ft_cache)
        return sr

    return jax.jit(impl)


def main():
    from bench import _dezero, _balance_flow

    model = registry.make({"name": "srflow", "args": dict(ARGS)})
    # random-init nets have ZERO-init out convs (reference Conv2dZeros) that
    # make the whole conditioning constant, and an unbalanced reverse pass
    # that amplifies 1/sigmoid(2) per coupling — de-zero + balance so every
    # stage is precision-live AND the decode stays O(1) (see bench._dezero,
    # bench._balance_flow)
    model.params = _balance_flow(_dezero(model.params))
    model.freeze()
    prior = registry.make({"name": "srflow-unet", "args": {"depth": 3, "dim": 64}})
    prior.params = _dezero(prior.params)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((1, LR, LR, 3)).astype(np.float32))

    ref = np.asarray(build_impl(model, prior, ())(model.params, prior.params, lr))

    configs = [("trunk",), ("ft",), ("flows",), ("prior",),
               ("trunk", "ft", "flows", "prior"),
               ("trunk", "ft", "prior"),       # flows stay HIGH
               ("trunk", "prior"),             # conditioning + flows HIGH
               ("ft", "flows", "prior")]       # trunk HIGH
    print(f"{'bf16 stages':<28} {'maxabs':>9} {'rms':>9} {'dB':>6} {'ms':>7}")
    for cfg in configs:
        fn = build_impl(model, prior, cfg)
        out = fn(model.params, prior.params, lr)
        np.asarray(out[0, 0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(8):
            out = fn(model.params, prior.params, lr)
        np.asarray(out[0, 0, 0, 0])
        ms = (time.perf_counter() - t0) / 8 * 1e3
        o = np.asarray(out)
        d = (ref.astype(np.float64) - o.astype(np.float64))
        mse = float(np.mean(d * d))
        db = 10 * np.log10(1.0 / max(mse, 1e-30))
        print(f"{'+'.join(cfg):<28} {np.abs(d).max():>9.3g} "
              f"{np.sqrt(mse):>9.3g} {db:>6.1f} {ms:>7.1f}")


if __name__ == "__main__":
    main()
