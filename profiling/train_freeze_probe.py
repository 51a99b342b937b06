"""A/B: frozen-RRDB SRFlow train step as grad-mask (current) vs
stop_gradient on the conditioning (lets XLA drop the trunk backward).

The reference freezes the RRDB for the first train_RRDB_delay*niter
steps (SRFlow_model.py:138-142, delay 0.5 => HALF the run) by excluding
the params from the optimizer; the grad-mask form keeps one jitted step
but still *computes* the trunk backward and multiplies it by zero.

Interleaved A/B at the reference config (batch 12, GT 160).
Run: python profiling/train_freeze_probe.py [--iters 5 --rounds 4]
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


def make_sg_step(model, optimizer):
    """stop_gradient variant: conditioning detached, rrdb grads are
    symbolic zeros, optimizer update otherwise identical."""

    def loss_fn(params, batch, key):
        gt, lq = batch["GT"], batch["LQ"]
        lr_enc = jax.tree_util.tree_map(
            jax.lax.stop_gradient, model.preprocess(params, lq))
        _, nll, _ = model.normal_flow(params, gt, lq, key=key,
                                      add_gt_noise=True, lr_enc=lr_enc,
                                      collect_epses=False)
        return jnp.mean(nll)

    @jax.jit
    def step(params, opt_state, batch, key, step_idx):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss}

    return step


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
    gt = jnp.asarray(rng.random((B, G, G, 3), dtype=np.float32))
    lq = jnp.asarray(rng.random((B, G // 4, G // 4, 3), dtype=np.float32))
    batch = {"GT": gt, "LQ": lq}
    key = jax.random.PRNGKey(0)

    step_mask = make_srflow_train_step(model, optimizer, weight_fl=1.0,
                                       rrdb_unfreeze_step=None)
    step_sg = make_sg_step(model, optimizer)

    variants = [("grad-mask (current)", step_mask), ("stop-grad", step_sg)]
    state = {}
    for name, step in variants:
        t0 = time.perf_counter()
        p, o, m = step(model.params, optimizer.init(model.params), batch,
                       key, jnp.asarray(0))
        sync(m["loss"])
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s "
              f"loss {float(m['loss']):.4f}")
        state[name] = (p, o)

    times = {name: [] for name, _ in variants}
    for _ in range(args.rounds):
        for name, step in variants:
            p, o = state[name]
            t0 = time.perf_counter()
            for i in range(args.iters):
                p, o, m = step(p, o, batch, key, jnp.asarray(i))
            sync(m["loss"])
            times[name].append((time.perf_counter() - t0) / args.iters * 1e3)
            state[name] = (p, o)
    for name, _ in variants:
        print(f"  {name:<22} {min(times[name]):7.1f} ms/step "
              f"(rounds: {[f'{t:.0f}' for t in times[name]]})")

    # correctness: one step from identical init must match (Adam on zero
    # grads is a no-op update, so mask == stop-grad exactly)
    p1, _, _ = step_mask(model.params, optimizer.init(model.params), batch,
                         key, jnp.asarray(0))
    p2, _, _ = step_sg(model.params, optimizer.init(model.params), batch,
                       key, jnp.asarray(0))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p1, p2)
    print(f"  max param diff after 1 step: "
          f"{max(jax.tree_util.tree_leaves(diffs)):.3e}")


if __name__ == "__main__":
    main()
