"""Trunk (RRDB dense block) form probe AT THE TRAINING EXTENT (r5).

train_mfu.py measured the scatter-form trunk forward at 10.6 TF/s for the
b12/GT160 training shape (LR 40x40) — well below the same form's 19.6 TF/s
ceiling at eval extents (B=1, 128^2+).  The scatter reassociation was
form-probed at eval shapes only (CLAUDE.md); this probe re-runs the form
race at the training shape, fwd AND fwd+bwd (vjp wrt params+input, the
unfrozen-trainer pull), interleaved in one process:

  scatter     — current _dense_block (wide conv per source tensor as
                y-concat half-im2col + 3 x-shift matmuls)
  scatter-lax — same reassociation, lax.conv per wide conv
  narrow-lax  — reference order (5 narrow gather convs), lax.conv
  narrow-y3   — reference order via the half-im2col matmul form

All forms run the full 23-block trunk as the production lax.scan with the
same named-activation remat policy (save pre-activations; backward
recomputes only glue).  Run solo:
    python profiling/trunk_train_form_probe.py [--b 12] [--hw 40]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.models.rrdb import _dense_block, _init_dense_block

NB = 23


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def _dense_block_scatter_lax(x, p):
    """Scatter reassociation, but each wide conv via lax.conv."""
    nf = p["conv1"]["w"].shape[2]
    gc = p["conv1"]["w"].shape[3]
    couts = [gc, gc, gc, gc, nf]
    cins = [nf, gc, gc, gc, gc]
    offs = [0, nf, nf + gc, nf + 2 * gc, nf + 3 * gc]
    ws = [jnp.concatenate(
        [p[f"conv{k+1}"]["w"][:, :, offs[j]:offs[j] + cins[j], :]
         for k in range(j, 5)], axis=-1) for j in range(5)]
    bs = [p[f"conv{k+1}"].get("b") for k in range(5)]
    acc = [None] * 5

    def spread(j, y):
        off = 0
        for k in range(j, 5):
            v = y[..., off:off + couts[k]]
            acc[k] = v if acc[k] is None else acc[k] + v
            off += couts[k]

    spread(0, fnn.conv2d(x, {"w": ws[0]}))
    for j in range(1, 5):
        t = acc[j - 1] if bs[j - 1] is None else acc[j - 1] + bs[j - 1]
        t = checkpoint_name(t, "rrdb_act")
        spread(j, fnn.conv2d(fnn.leaky_relu(t), {"w": ws[j]}))
    x5 = acc[4] if bs[4] is None else acc[4] + bs[4]
    x5 = checkpoint_name(x5, "rrdb_act")
    return x5 * 0.2 + x


def _make_narrow(conv):
    def block(x, p):
        feats = x
        outs = []
        for i in range(1, 6):
            y = conv(feats, p[f"conv{i}"])
            y = checkpoint_name(y, "rrdb_act")
            if i < 5:
                outs.append(fnn.leaky_relu(y))
                feats = jnp.concatenate([x] + outs, axis=-1)
        return y * 0.2 + x
    return block


def _narrow_y3_conv(x, p):
    y = fnn.conv3x3_y3(x, p["w"])
    b = p.get("b")
    return y if b is None else y + b


def _dense_block_masked(mask):
    """Production scatter block with every conv INPUT re-zeroed on the
    tile halo rings — the batch-to-space invariant: rings = 0 before a
    conv makes the big-plane conv exactly the per-image SAME-pad conv
    (ring outputs are garbage from neighboring tiles and get re-zeroed
    before the next conv; the final crop discards them)."""

    def block(x, p):
        nf = p["conv1"]["w"].shape[2]
        gc = p["conv1"]["w"].shape[3]
        couts = [gc, gc, gc, gc, nf]
        cins = [nf, gc, gc, gc, gc]
        offs = [0, nf, nf + gc, nf + 2 * gc, nf + 3 * gc]
        ws = [jnp.concatenate(
            [p[f"conv{k+1}"]["w"][:, :, offs[j]:offs[j] + cins[j], :]
             for k in range(j, 5)], axis=-1) for j in range(5)]
        bs = [p[f"conv{k+1}"].get("b") for k in range(5)]
        acc = [None] * 5

        def spread(j, y):
            off = 0
            for k in range(j, 5):
                v = y[..., off:off + couts[k]]
                acc[k] = v if acc[k] is None else acc[k] + v
                off += couts[k]

        spread(0, fnn.conv3x3_y3(x * mask, ws[0]))
        for j in range(1, 5):
            t = acc[j - 1] if bs[j - 1] is None else acc[j - 1] + bs[j - 1]
            t = checkpoint_name(t, "rrdb_act")
            spread(j, fnn.conv3x3_y3(fnn.leaky_relu(t) * mask, ws[j]))
        x5 = acc[4] if bs[4] is None else acc[4] + bs[4]
        x5 = checkpoint_name(x5, "rrdb_act")
        return x5 * 0.2 + x

    return block


def trunk_fn_b2s(b, hw, cols=4):
    """Batch-to-space: pack the b small images into one plane of
    (hw+2)^2 tiles (1-px zero ring each), run the production scatter
    trunk on the plane with ring re-zeroing, crop back.  Attacks the
    EXTENT (b12 40^2 runs the trunk at 10.6 TF/s vs 19.6 at 128^2+)
    at a (hw+2)^2/hw^2 ~ 10% MAC overhead + one mask multiply per conv."""
    rows = -(-b // cols)
    T = hw + 2
    m = np.zeros((rows * T, cols * T, 1), np.float32)
    for r in range(rows):
        for c in range(cols):
            m[r * T + 1: r * T + T - 1, c * T + 1: c * T + T - 1] = 1.0
    mask = jnp.asarray(m)[None]
    block = _dense_block_masked(mask)

    def rrdb(x, p):
        o = block(x, p["rdb1"])
        o = block(o, p["rdb2"])
        o = block(o, p["rdb3"])
        return o * 0.2 + x

    ckpt = jax.checkpoint(
        rrdb, policy=jax.checkpoint_policies.save_only_these_names("rrdb_act"))

    def run(params, fea):
        C = fea.shape[-1]
        x = jnp.pad(fea, ((0, rows * cols - b), (1, 1), (1, 1), (0, 0)))
        x = x.reshape(rows, cols, T, T, C).transpose(0, 2, 1, 3, 4)
        x = x.reshape(1, rows * T, cols * T, C)
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params)

        def body(t, bp):
            return ckpt(t, bp), None

        out, _ = jax.lax.scan(body, x, stacked)
        y = out.reshape(rows, T, cols, T, C).transpose(0, 2, 1, 3, 4)
        y = y.reshape(rows * cols, T, T, C)
        return y[:b, 1:-1, 1:-1, :]

    return run


def trunk_fn(block):
    def rrdb(x, p):
        o = block(x, p["rdb1"])
        o = block(o, p["rdb2"])
        o = block(o, p["rdb3"])
        return o * 0.2 + x

    ckpt = jax.checkpoint(
        rrdb, policy=jax.checkpoint_policies.save_only_these_names("rrdb_act"))

    def run(params, fea):
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params)

        def body(t, bp):
            t2 = ckpt(t, bp)
            return t2, None

        out, _ = jax.lax.scan(body, fea, stacked)
        return out
    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=12)
    ap.add_argument("--hw", type=int, default=40)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--b2s-only", action="store_true",
                    help="race only scatter vs b2s-mosaic (2 compiles)")
    args = ap.parse_args()

    rng = jax.random.PRNGKey(0)
    with jax.default_device(jax.devices("cpu")[0]):
        keys = jax.random.split(rng, NB * 3).reshape(NB, 3, 2)
        params = [{f"rdb{i+1}": _init_dense_block(keys[b, i], 64, 32)
                   for i in range(3)} for b in range(NB)]
        fea = jax.random.normal(jax.random.PRNGKey(1),
                                (args.b, args.hw, args.hw, 64), jnp.float32)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    fea = jax.device_put(fea, dev)

    forms = {
        "scatter   ": trunk_fn(_dense_block),
        "scatterlax": trunk_fn(_dense_block_scatter_lax),
        "narrow-lax": trunk_fn(_make_narrow(
            lambda x, p: fnn.conv2d(x, p))),
        "narrow-y3 ": trunk_fn(_make_narrow(_narrow_y3_conv)),
        "b2s-mosaic": trunk_fn_b2s(args.b, args.hw),
    }
    if args.b2s_only:
        forms = {k: v for k, v in forms.items()
                 if k in ("scatter   ", "b2s-mosaic")}

    jits = {}
    for name, fn in forms.items():
        fwd = jax.jit(fn)

        def vjp_tot(p, f, _fn=fn):
            y, pull = jax.vjp(_fn, p, f)
            return pull(jnp.ones_like(y))

        bwd = jax.jit(vjp_tot)
        jits[name] = (fwd, bwd)

    # parity check + warmup
    ref = None
    for name, (fwd, bwd) in jits.items():
        y = fwd(params, fea)
        sync(y)
        sync(bwd(params, fea))
        if ref is None:
            ref = y
        else:
            d = float(jnp.max(jnp.abs(y - ref)))
            print(f"{name} max|dy| vs scatter: {d:.2e}")

    res = {name: [[], []] for name in jits}
    for _ in range(args.rounds):
        for name, (fwd, bwd) in jits.items():
            t0 = time.perf_counter()
            o = None
            for _ in range(args.n):
                o = fwd(params, fea)
            sync(o)
            res[name][0].append((time.perf_counter() - t0) / args.n * 1e3)
            t0 = time.perf_counter()
            for _ in range(args.n):
                o = bwd(params, fea)
            sync(o)
            res[name][1].append((time.perf_counter() - t0) / args.n * 1e3)

    print(f"\n23-block trunk, b{args.b} {args.hw}x{args.hw}, HIGH, "
          f"median of {args.rounds} interleaved rounds (ms):")
    print(f"{'form':<12}{'fwd':>8}{'fwd+bwd':>9}{'bwd':>8}")
    for name, (f, t) in res.items():
        fm, tm = float(np.median(f)), float(np.median(t))
        print(f"{name:<12}{fm:>8.1f}{tm:>9.1f}{tm - fm:>8.1f}")


if __name__ == "__main__":
    main()
