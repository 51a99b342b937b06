"""SwinIR-LINF hardware throughput (r3 verdict #4: the composition has
e2e golden parity, tests/test_swinir_linf.py, but no bench line).

Full-size SwinIR encoder (reference fixed config: embed_dim 180,
depths/heads (6,)*6, window 8 — LINF-LP/models/swinir.py:862-864) inside
the flagship LINF + UNet learned prior, x4 at a window-multiple LR
extent (the eval protocol pads to window multiples anyway), predictor
surface (pipelines/linf_eval.LINFPredictor).

    python profiling/swinir_linf_bench.py [--lr 128] [--iters 6]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lr", type=int, default=128)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax.numpy as jnp

    import bfsr_tpu.models  # noqa: F401
    from bfsr_tpu import registry
    from bfsr_tpu.pipelines.linf_eval import LINFPredictor
    from bfsr_tpu.utils.coords import make_cell, make_coord_np

    enc = {"name": "swinir", "args": {"no_upsampling": True}}
    model = registry.make({"name": "linf", "args": {
        "encoder_spec": enc,
        "imnet_spec": {"name": "flow", "args": {"name": "flow"}},
        "flow_layers": 10, "num_layer": 3, "hidden_dim": 256}})
    model.params["imnet"]["w"] = model.params["imnet"]["w"] + jnp.eye(
        model.params["imnet"]["w"].shape[-1])[None]
    model.freeze()
    prior = registry.make({"name": "unet", "args": {
        "in_chans": 3, "depth": 3, "dim": 64, "bilinear": True}})

    h = w = args.lr
    s = 4
    H, W = h * s, w * s
    rng = np.random.default_rng(0)
    inp = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))
    coord = jnp.asarray(make_coord_np((H, W), flatten=False)[None])
    cell = jnp.asarray(make_cell((H, W))[None])
    gt_lr_up = jnp.asarray((rng.random((1, H, W, 3)) - 0.5).astype(np.float32))

    pred = LINFPredictor(model, prior)

    def once():
        return pred.predict(model.params, prior.params, inp, coord, cell,
                            gt_lr_up)

    t0 = time.perf_counter()
    o = once()
    np.asarray(o[0, 0, 0, 0])
    print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)

    # encoder-only timing for the attribution split
    import jax

    enc_fn = jax.jit(lambda p, x: model.encoder.apply(p, x))
    eo = enc_fn(model.params["encoder"], inp)
    np.asarray(eo[0, 0, 0, 0])

    def timed(fn, sync):
        t0 = time.perf_counter()
        o = None
        for _ in range(args.iters):
            o = fn()
        sync(o)
        return (time.perf_counter() - t0) / args.iters * 1e3

    for r in range(args.rounds):
        ms = timed(once, lambda o: np.asarray(o[0, 0, 0, 0]))
        ems = timed(lambda: enc_fn(model.params["encoder"], inp),
                    lambda o: np.asarray(o[0, 0, 0, 0]))
        print(f"round {r}: e2e {ms:7.1f} ms ({H*W/ms/1e3:5.2f} MP/s)   "
              f"encoder {ems:7.1f} ms ({100*ems/ms:4.1f}%)", flush=True)


if __name__ == "__main__":
    main()
