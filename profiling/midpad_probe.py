"""Probe: are the DIV2K-extent UNet mid-stage XLA convs slow because of
the odd extents (1020x678 / 510x339 / 255x169), i.e. would pad-to-aligned
extents + crop run materially faster?

For a 3x3 SAME conv, zero-padding the input on the bottom/right and
cropping the output is EXACT for the original region (SAME already pads
zeros); chains only need the pad region re-zeroed between convs (one
fused mask multiply).  So if the aligned-extent conv is >20% faster the
pad-and-crop mid path is worth building.

Interleaved A/B in one process (tunnel variance ~8%): compile all
variants first, then alternate timed rounds.

Run: python profiling/midpad_probe.py [--iters 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bfsr_tpu.ops import nn as fnn


def sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def make_dc(cin, mid, cout):
    key = jax.random.PRNGKey(0)
    from bfsr_tpu.models.unet import init_double_conv
    return init_double_conv(key, cin, cout, mid=mid)


def dc_eval(x, p):
    from bfsr_tpu.models.unet import double_conv
    return double_conv(x, p, False, {}, ("probe",))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    # (label, H, W, cin, mid, cout) — the DIV2K mid stages; pad candidates
    # pad H to a multiple of 8 and W to a multiple of 128 (lane) or 8.
    cases = [
        ("down0 1020x678 64->128", 1020, 678, 64, 128, 128),
        ("down1 510x339 128->256", 510, 339, 128, 256, 256),
        ("down2 255x169 256->256", 255, 169, 256, 256, 256),
        ("up0   510x339 512->256/128", 510, 339, 512, 256, 128),
        ("up1   1020x678 256->128/64", 1020, 678, 256, 128, 64),
    ]
    pad_variants = [
        ("exact", lambda h, w: (h, w)),
        ("pad8", lambda h, w: (-(-h // 8) * 8, -(-w // 8) * 8)),
        ("pad8/128", lambda h, w: (-(-h // 8) * 8, -(-w // 128) * 128)),
        ("pad16/256", lambda h, w: (-(-h // 16) * 16, -(-w // 256) * 256)),
    ]

    rng = np.random.default_rng(0)
    for label, H, W, cin, mid, cout in cases:
        p = make_dc(cin, mid, cout)
        fns = []
        for vname, padfn in pad_variants:
            Hp, Wp = padfn(H, W)
            x = jnp.asarray(rng.random((1, Hp, Wp, cin), dtype=np.float32))
            f = jax.jit(lambda pp, xx: dc_eval(xx, pp))
            sync(f(p, x))  # compile
            fns.append((vname, Hp, Wp, f, x))
        times = {v[0]: [] for v in fns}
        for _ in range(args.rounds):
            for vname, Hp, Wp, f, x in fns:
                t0 = time.perf_counter()
                out = None
                for _ in range(args.iters):
                    out = f(p, x)
                sync(out)
                times[vname].append((time.perf_counter() - t0) / args.iters * 1e3)
        print(f"\n== {label} ==")
        base = None
        for vname, Hp, Wp, f, x in fns:
            ms = min(times[vname])
            px = Hp * Wp / (H * W)
            if vname == "exact":
                base = ms
            print(f"  {vname:<10} {Hp}x{Wp:<5} {ms:7.2f} ms"
                  f"  ({ms / base:4.2f}x exact, {px:4.2f}x pixels)")


if __name__ == "__main__":
    main()
