"""Interleaved A/B of the fused FlowStep Pallas kernel vs the XLA flow path.

Full-size SRFlow-LP pipeline (nb=23, K=16, L=3, two-branch prior), LR
128x128 -> HR 512x512 on one chip, both variants compiled in ONE process
and timed in alternating rounds (tunnel variance is ~±8%; CLAUDE.md A/B
methodology).  Also checks numeric agreement between the two programs.

Usage: python profiling/flowstep_probe.py [--lr 128] [--iters 12]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lr", type=int, default=128)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--levels", default="auto",
                    help="kernel levels for arm B: 'auto' (measured-win "
                         "set), 'all', or comma ints e.g. '2,3'.  NOTE: "
                         "'all' compiles 96 Mosaic instances (~10+ min "
                         "cold; the level probe is the per-level signal)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bfsr_tpu.models  # noqa: F401
    from bench import _SRFLOW_ARGS, _balance_flow, _dezero
    from bfsr_tpu import registry
    from bfsr_tpu.pipelines.srflow_eval import SRFlowLPPredictor

    # Build + transform the params entirely on the CPU backend, then ship
    # the finished trees to the TPU in one transfer.  Building on-device
    # costs MINUTES over the ~5 MB/s tunnel (_dezero round-trips every
    # leaf at ~29 ms each) and leaves the process's dispatch path degraded
    # for the timed rounds (measured: 1.2 s/iter vs 94 ms for the same
    # program in a clean process — r4).
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model = registry.make({"name": "srflow", "args": dict(_SRFLOW_ARGS)})
        model.params = _balance_flow(_dezero(model.params))
        model.freeze()  # AFTER the swap: freeze caches anic/invconv folds
        prior = registry.make({"name": "srflow-unet",
                               "args": {"depth": 3, "dim": 64}})
    dev = jax.devices()[0]
    model.params = jax.device_put(model.params, dev)
    prior.params = jax.device_put(prior.params, dev)
    print("params built (cpu) and shipped", flush=True)
    if args.levels == "auto":
        lv = True
    elif args.levels == "all":
        lv = (1, 2, 3)
    else:
        lv = tuple(int(x) for x in args.levels.split(","))
    pred_a = SRFlowLPPredictor(model, prior, use_step_kernel=False)
    pred_b = SRFlowLPPredictor(model, prior, use_step_kernel=lv)

    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((1, args.lr, args.lr, 3)).astype(np.float32))
    H = args.lr * 4

    def sync(out):
        np.asarray(out[0, 0, 0, 0])

    print("compiling A (XLA flows)...", flush=True)
    t0 = time.perf_counter()
    a = pred_a._fn(model.params, prior.params, lr)
    sync(a)
    print(f"  {time.perf_counter() - t0:.1f}s", flush=True)
    print("compiling B (fused FlowStep kernel)...", flush=True)
    t0 = time.perf_counter()
    b = pred_b._fn(model.params, prior.params, lr)
    sync(b)
    print(f"  {time.perf_counter() - t0:.1f}s", flush=True)

    d = np.abs(np.asarray(a) - np.asarray(b))
    ref = np.abs(np.asarray(a)) + 1e-6
    print(f"agreement: max abs {d.max():.3e}  rms {np.sqrt((d**2).mean()):.3e}"
          f"  max rel {np.max(d / ref):.3e}", flush=True)

    def timed(fn):
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = fn(model.params, prior.params, lr)
        sync(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    for _ in range(2):  # warm
        sync(pred_a._fn(model.params, prior.params, lr))
        sync(pred_b._fn(model.params, prior.params, lr))
    for r in range(args.rounds):
        ta = timed(pred_a._fn)
        tb = timed(pred_b._fn)
        print(f"round {r}: A(xla) {ta:7.2f} ms ({H*H/ta/1e3:.2f} MP/s)   "
              f"B(kernel) {tb:7.2f} ms ({H*H/tb/1e3:.2f} MP/s)   "
              f"speedup {ta/tb:.3f}x", flush=True)


if __name__ == "__main__":
    main()
