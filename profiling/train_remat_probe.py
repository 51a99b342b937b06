"""A/B: unfrozen SRFlow train step with full-block remat vs the
save-named-activations policy (BFSR_RRDB_REMAT=full|acts).

With the "rrdb_act" pre-activations saved (~1 GB over the 23-step scan)
the trunk backward recomputes only lrelu/pad/concat glue instead of all
forward matmuls.  Interleaved at the reference config (batch 12, GT 160).

Run: python profiling/train_remat_probe.py [--iters 5 --rounds 4]
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


def sync(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--gt", type=int, default=160)
    args = ap.parse_args()

    model = registry.make({"name": "srflow", "args": {
        "in_nc": 3, "out_nc": 3, "nf": 64, "nb": 23, "scale": 4,
        "K": 16, "L": 3, "hidden_channels": 64,
        "additional_steps": 2, "split_enable": True,
        "stack_blocks": [1, 8, 15, 22], "stack_concat": True,
        "fea_up0": True}})
    optimizer = optax.chain(optax.clip_by_global_norm(10.0),
                            optax.adam(2.5e-4))

    G, B = args.gt, args.batch
    rng = np.random.default_rng(0)
    batch = {"GT": jnp.asarray(rng.random((B, G, G, 3), dtype=np.float32)),
             "LQ": jnp.asarray(rng.random((B, G // 4, G // 4, 3),
                                          dtype=np.float32))}
    key = jax.random.PRNGKey(0)

    # env is read at trace time inside _trunk_scan: set it, build, call
    # once to force the trace, then move on to the next variant.
    variants = []
    state = {}
    for mode in ["full", "acts"]:
        os.environ["BFSR_RRDB_REMAT"] = mode
        step = make_srflow_train_step(model, optimizer, weight_fl=1.0,
                                      rrdb_unfreeze_step=0)
        t0 = time.perf_counter()
        p, o, m = step(model.params, optimizer.init(model.params), batch,
                       key, jnp.asarray(1))
        sync(m["loss"])
        print(f"{mode}: compile+first {time.perf_counter() - t0:.1f}s "
              f"loss {float(m['loss']):.4f}")
        variants.append((mode, step))
        state[mode] = (p, o)

    times = {mode: [] for mode, _ in variants}
    for _ in range(args.rounds):
        for mode, step in variants:
            p, o = state[mode]
            t0 = time.perf_counter()
            for i in range(args.iters):
                p, o, m = step(p, o, batch, key, jnp.asarray(i + 1))
            sync(m["loss"])
            times[mode].append((time.perf_counter() - t0) / args.iters * 1e3)
            state[mode] = (p, o)
    for mode, _ in variants:
        print(f"  {mode:<6} {min(times[mode]):7.1f} ms/step "
              f"(rounds: {[f'{t:.0f}' for t in times[mode]]})")

    # parity: same step from identical state
    ps = []
    for mode, step in variants:
        p, _, _ = step(model.params, optimizer.init(model.params), batch,
                       key, jnp.asarray(1))
        ps.append(p)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), ps[0], ps[1])
    print(f"  max param diff after 1 step: "
          f"{max(jax.tree_util.tree_leaves(diffs)):.3e}")


if __name__ == "__main__":
    main()
