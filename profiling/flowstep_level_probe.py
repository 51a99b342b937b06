"""Per-level FlowStep kernel vs XLA chain timing (interleaved A/B).

Times ONE level's 16-step conditional chain (fwd and rev) in both forms at
the 512^2 bench extents, per level.  Small programs (16 Mosaic kernels
each) — the full-pipeline A/B compile (96 instances) OOM-killed the
chipless compile helper, so the per-level signal comes first.

    python profiling/flowstep_level_probe.py [--level 1|2|3|all]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

LEVELS = {
    # level: (state H, W, orig c, phases)   [512^2 bench extents]
    1: (128, 128, 12, 4),   # s2d domain of the 256^2 C=12 state
    2: (128, 128, 24, 1),
    3: (64, 64, 96, 1),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", default="all")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bfsr_tpu.ops import flows
    from bfsr_tpu.ops import flows_s2d as fs2d
    from bfsr_tpu.models.srflow import flow_upsampler as fup
    from bfsr_tpu.ops.pallas import flow_step as fsk

    levels = [int(args.level)] if args.level != "all" else [1, 2, 3]
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    for lvl in levels:
        H, W, c, P = LEVELS[lvl]
        C = P * c
        print(f"--- level {lvl}: state ({H},{W},{C}) P={P} "
              f"x{args.steps} steps ---", flush=True)
        steps = []
        for i in range(args.steps):
            k = jax.random.fold_in(key, lvl * 100 + i)
            k1, k2, k3 = jax.random.split(k, 3)
            p = {"actnorm": {"bias": jax.random.normal(k1, (c,)) * 0.05,
                             "logs": jax.random.normal(k2, (c,)) * 0.05},
                 "invconv": {"w": np.linalg.qr(
                     rng.standard_normal((c, c)))[0].astype(np.float32)},
                 "affine": flows.init_cond_affine(k3, c, 320, 64)}
            for tower in ("fFeatures", "fAffine"):
                out = p["affine"][tower]["out"]
                out["w"] = jax.random.normal(k1, out["w"].shape) * 0.02
                out["b"] = jax.random.normal(k2, out["b"].shape) * 0.01
            p["invconv"] = flows.invconv_cache(p["invconv"]["w"])
            p["anic"] = flows.fold_actnorm_invconv(p["actnorm"], p["invconv"])
            steps.append(p)

        # conditioning map at the level extent (NHWC; s2d for level 1)
        if P == 4:
            ho, wo = H * 2, W * 2
        else:
            ho, wo = H, W
        ft = jnp.asarray(rng.random((1, ho, wo, 320), dtype=np.float32))
        caches = [flows.cond_affine_cache(ft, p["affine"]) for p in steps]
        if P == 4:
            caches = [fs2d.cache_to_s2d(cc) for cc in caches]
        x0 = jnp.asarray(rng.random((1, H, W, C), dtype=np.float32) - 0.5)

        @jax.jit
        def chain_xla(x, cs):
            for p, cc in zip(steps, cs):
                if P == 4:
                    x, _ = fs2d.step_forward(x, p, None, cond=True,
                                             ft_params=cc)
                else:
                    x, _ = fup._step_forward(x, p, ft, None, cond=True,
                                             ft_params=cc)
            return x

        preps = [fsk.prep_step(p, c, phases=P) for p in steps]
        conds = [fsk.pack_cache(cc, H, W) for cc in caches]

        @jax.jit
        def chain_kernel(x, cds):
            zp = fsk.pad_state(x)
            for pr, cd in zip(preps, cds):
                zp = fsk.step_apply(zp, cd, pr, H, W)
            return fsk.unpad_state(zp, H, W, C)

        def sync(o):
            np.asarray(o[0, 0, 0, 0] if o.ndim == 4 else o[0, 0, 0])

        t0 = time.perf_counter()
        a = chain_xla(x0, caches)
        sync(a)
        print(f"  A compile {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        b = chain_kernel(x0, conds)
        sync(b)
        print(f"  B compile {time.perf_counter() - t0:.1f}s", flush=True)
        d = np.abs(np.asarray(a) - np.asarray(b))
        print(f"  agree: max {d.max():.3e} rms {np.sqrt((d**2).mean()):.3e}",
              flush=True)

        def timed(fn, arg):
            t0 = time.perf_counter()
            o = None
            for _ in range(args.iters):
                o = fn(x0, arg)
            sync(o)
            return (time.perf_counter() - t0) / args.iters * 1e3

        for r in range(args.rounds):
            ta = timed(chain_xla, caches)
            tb = timed(chain_kernel, conds)
            print(f"  round {r}: A(xla) {ta:7.2f} ms   B(kernel) {tb:7.2f} ms"
                  f"   speedup {ta/tb:.2f}x", flush=True)


if __name__ == "__main__":
    main()
