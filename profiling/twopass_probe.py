"""2-pass bf16 middle precision point for SRFlow conditioning (r4 #6).

SRFlow has a fidelity cliff: HIGH = exact at 82.4 ms, serving = 48.7 ms
at 39.7 dB, and the three conditioning stages sit at ~43-47 dB each in
1-pass bf16.  The hypothesis: a 2-pass split (hi@hi + hi@lo — keep the
weights' low bits) for trunk/ft recovers fidelity at ~2/3 the HIGH cost
of those stages.  Expectation math to test: 1-pass error ~ sqrt(2)*2^-9
relative vs 2-pass ~ 2^-9 (only ~3 dB better; the big jump is 2->3 pass
at ~2^-18), so the probe may refute the >=55 dB target — measured either
way.

Modes (prior always 1-pass DEFAULT except all-HIGH):
  high     : everything HIGH (fidelity reference + in-process ms anchor)
  serving  : everything DEFAULT (1-pass)
  cond2    : trunk+ft+flows TWO_PASS
  cond2b   : trunk+ft TWO_PASS, flows HIGH

dB = agreement of the full SR output vs all-HIGH on the dezero+balanced
synthetic model (zero-init couplings make conditioning constant).  ms =
interleaved in-process timing (valid A/B; absolutes need solo runs).

    python profiling/twopass_probe.py
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

LR = 128
ITERS = 8
ROUNDS = 3

MODES = {
    "high": {},
    "serving": {"trunk": jax.lax.Precision.DEFAULT,
                "ft": jax.lax.Precision.DEFAULT,
                "flows": jax.lax.Precision.DEFAULT,
                "prior": jax.lax.Precision.DEFAULT},
    "cond2": {"trunk": fnn.TWO_PASS, "ft": fnn.TWO_PASS,
              "flows": fnn.TWO_PASS,
              "prior": jax.lax.Precision.DEFAULT},
    "cond2b": {"trunk": fnn.TWO_PASS, "ft": fnn.TWO_PASS,
               "prior": jax.lax.Precision.DEFAULT},
    # the complementary split (keep the ACTIVATIONS' low bits, drop the
    # weights') — the cond2 refutation diagnosed the dropped activation
    # bits as the dominant error term, so this one should recover most
    # of the 3-pass fidelity at the same 2-pass cost
    "cond2a": {"trunk": fnn.TWO_PASS_ACT, "ft": fnn.TWO_PASS_ACT,
               "flows": fnn.TWO_PASS_ACT,
               "prior": jax.lax.Precision.DEFAULT},
}


def build_impl(model, prior):
    def impl(params, prior_params, lr):
        s = model.scale
        h, w = lr.shape[1], lr.shape[2]
        lr_up = resize_bilinear(lr, (h * s, w * s))
        with fnn.stage("trunk"):
            lr_enc = model.preprocess(params, lr)
        with fnn.stage("ft"):
            ft_cache = model.precompute_ft(params, lr_enc)
        with fnn.stage("flows"):
            epses, _, _ = model.normal_flow(params, lr_up, lr,
                                            add_gt_noise=False,
                                            lr_enc=lr_enc, ft_cache=ft_cache,
                                            want_logdet=False)
        epses = standardize_epses(epses)
        with fnn.stage("prior"):
            learned = prior.apply(prior_params, epses)
        with fnn.stage("flows"):
            sr, _ = model.reverse_flow(params, lr, epses=learned,
                                       add_gt_noise=False, lr_enc=lr_enc,
                                       ft_cache=ft_cache, want_logdet=False)
        return sr

    return impl


def main():
    from bench import _SRFLOW_ARGS, _dezero, _balance_flow

    # --modes high,serving,cond2a limits which pipelines compile (each
    # mode is a full fresh SRFlow compile — minutes each when the remote
    # compile service is slow)
    modes = dict(MODES)
    if "--modes" in sys.argv:
        sel = sys.argv[sys.argv.index("--modes") + 1].split(",")
        unknown = [m for m in sel if m not in MODES]
        if unknown:
            raise SystemExit(f"unknown modes {unknown}; have {list(MODES)}")
        if "high" not in sel:
            sel.insert(0, "high")  # the dB reference is always needed
        modes = {k: MODES[k] for k in sel}

    with jax.default_device(jax.devices("cpu")[0]):
        model = registry.make({"name": "srflow",
                               "args": dict(_SRFLOW_ARGS)})
        model.params = _balance_flow(_dezero(model.params))
        model.freeze()
        prior = registry.make({"name": "srflow-unet",
                               "args": {"depth": 3, "dim": 64}})
        prior.params = _dezero(prior.params)
    dev = jax.devices()[0]
    model.params = jax.device_put(model.params, dev)
    prior.params = jax.device_put(prior.params, dev)

    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((1, LR, LR, 3)).astype(np.float32))

    fns, outs = {}, {}
    for name, policy in modes.items():
        fnn.MIXED_POLICY.clear()
        fnn.MIXED_POLICY.update(policy)
        fnn.set_default_precision("mixed" if policy else "high")
        # fresh closure per mode: jax.jit on the SAME function object
        # shares one trace cache, so every mode would silently reuse the
        # first mode's compiled program (observed: 4 identical outputs)
        f = jax.jit(build_impl(model, prior))
        o = f(model.params, prior.params, lr)
        np.asarray(o[0, 0, 0, 0])
        fns[name] = f
        outs[name] = np.asarray(o)
    fnn.MIXED_POLICY.clear()
    fnn.MIXED_POLICY["prior"] = jax.lax.Precision.DEFAULT
    fnn.set_default_precision("high")

    ref = outs["high"].astype(np.float64)
    print(f"{'mode':<9}{'ms (interleaved)':>18}{'agreement':>12}")
    times = {n: [] for n in fns}
    for _ in range(ROUNDS):
        for name, f in fns.items():
            t0 = time.perf_counter()
            o = None
            for _ in range(ITERS):
                o = f(model.params, prior.params, lr)
            np.asarray(o[0, 0, 0, 0])
            times[name].append((time.perf_counter() - t0) / ITERS * 1e3)
    for name in fns:
        d = outs[name].astype(np.float64) - ref
        rms = float(np.sqrt(np.mean(d ** 2)))
        db = float("inf") if rms == 0 else -20 * np.log10(rms)
        ms = min(times[name])
        print(f"{name:<9}{ms:>14.1f} ms  {db:>9.1f} dB")


if __name__ == "__main__":
    main()
