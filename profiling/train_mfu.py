"""Training-step MFU / floor table (r4 verdict #4).

Eval got profiling/srflow_mfu.py; the train steps never had a roofline
decomposition.  This probe measures, at the reference training shapes:

* step totals for all four trainers (LINF latent b16/48^2, SRFlow NLL
  frozen + unfrozen b12/GT160, SRFlow prior b12/GT160);
* a per-stage fwd/bwd split of the SRFlow NLL step — each stage timed as
  a standalone jit of its forward and of its VJP pull-back, with logical
  GF from XLA cost_analysis (unrolled stages) or analytically (the
  scanned RRDB trunk: cost_analysis counts a scan body ONCE; bwd = 2x fwd
  for dL/dx + dL/dW, +1x fwd for the jax.checkpoint recompute).

MFU vs the measured ~60 TF/s Precision.HIGH matmul roofline.  Floors are
optimistic (all-MXU, no bandwidth/lane-waste/VPU terms).  Run solo:
    python profiling/train_mfu.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

import bfsr_tpu.models  # noqa
from bfsr_tpu import registry

HIGH_TFS = 60e12
B, G = 12, 160
H = W = G // 4  # LR extent


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(jf, *args, N=10):
    for _ in range(2):
        sync(jf(*args))
    t0 = time.perf_counter()
    o = None
    for _ in range(N):
        o = jf(*args)
    sync(o)
    return (time.perf_counter() - t0) / N * 1e3


def cost(jf, *args):
    c = jf.lower(*args).compile().cost_analysis()
    return float(c.get("flops", 0.0))


def trunk_flops_analytic(nf=64, gc=32, nb=23, h=H, w=W, b=B):
    macs_px = 9 * sum((nf + i * gc) * (gc if i < 4 else nf)
                      for i in range(5)) * 3 * nb
    return macs_px * h * w * b * 2


def main():
    import argparse
    ap = argparse.ArgumentParser()
    # the per-stage vjp programs leave HBM fragmented enough that the
    # unfrozen full-step compile OOMs in the same process: run the parts
    # in separate processes (--part stages, then --part totals)
    ap.add_argument("--part", choices=["stages", "totals", "all"],
                    default="all")
    cli = ap.parse_args()
    rng = np.random.default_rng(0)

    with jax.default_device(jax.devices("cpu")[0]):
        model = registry.make({"name": "srflow", "args": {
            "in_nc": 3, "out_nc": 3, "nf": 64, "nb": 23, "scale": 4,
            "K": 16, "L": 3, "hidden_channels": 64,
            "additional_steps": 2, "split_enable": True,
            "stack_blocks": [1, 8, 15, 22], "stack_concat": True,
            "fea_up0": True}})
    dev = jax.devices()[0]
    model.params = jax.device_put(model.params, dev)
    params = model.params
    gt = jnp.asarray(rng.random((B, G, G, 3)).astype(np.float32))
    lq = jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32))

    trunk_fwd_gf = trunk_flops_analytic() / 1e9

    rows = []

    def stage(name, fwd_fn, fwd_args, vjp_wrt=None, fwd_gf=None,
              bwd_gf=None):
        """fwd_gf/bwd_gf None -> cost_analysis (+ scan-aware caller fixes)."""
        jf = jax.jit(fwd_fn)
        ms_f = timeit(jf, *fwd_args)
        gf_f = cost(jf, *fwd_args) / 1e9 if fwd_gf is None else fwd_gf

        ms_b = gf_b = None
        if vjp_wrt is not None:
            def vjp_once(*args):
                y, pull = jax.vjp(fwd_fn, *args)
                cot = jax.tree_util.tree_map(jnp.ones_like, y)
                return pull(cot)

            jb = jax.jit(vjp_once)
            ms_b = timeit(jb, *fwd_args) - ms_f  # vjp runs fwd too
            gf_b = (cost(jb, *fwd_args) / 1e9 - gf_f
                    if bwd_gf is None else bwd_gf)
        rows.append((name, ms_f, gf_f, ms_b, gf_b))

    # --- per-stage fwd/bwd: the three stages of the SRFlow NLL step ---
    if cli.part in ("stages", "all"):
        stage("RRDB preprocess", lambda p, x: model.preprocess(p, x),
              (params, lq), vjp_wrt=True,
              fwd_gf=trunk_fwd_gf,         # scan body counted once
              bwd_gf=3.0 * trunk_fwd_gf)   # 2x grads + 1x remat recompute

        lr_enc = jax.jit(lambda p, x: model.preprocess(p, x))(params, lq)
        lr_enc = jax.tree_util.tree_map(jax.lax.stop_gradient, lr_enc)
        stage("precompute_ft", lambda p, e: model.precompute_ft(p, e),
              (params, lr_enc), vjp_wrt=True)

        ft_cache = jax.jit(lambda p, e: model.precompute_ft(p, e))(
            params, lr_enc)

        def encode_nll(p, g, e, fc):
            _, nll, _ = model.normal_flow(p, g, None,
                                          key=jax.random.PRNGKey(0),
                                          add_gt_noise=True, lr_enc=e,
                                          ft_cache=fc)
            return jnp.mean(nll)

        stage("normal_flow+nll", encode_nll, (params, gt, lr_enc, ft_cache),
              vjp_wrt=True)

        print(f"\nSRFlow NLL step stages (b{B}, GT {G}, HIGH):")
        print(f"{'stage':<18}{'fwd ms':>8}{'fwd GF':>9}{'fwd TF/s':>9}"
              f"{'bwd ms':>8}{'bwd GF':>9}{'bwd TF/s':>9}{'x floor':>9}")
        tms = tgf = 0.0
        for name, ms_f, gf_f, ms_b, gf_b in rows:
            tf_f = gf_f / ms_f
            tf_b = (gf_b / ms_b) if ms_b else 0.0
            tot = ms_f + (ms_b or 0.0)
            fl = (gf_f + (gf_b or 0.0)) / (HIGH_TFS / 1e9) * 1e3
            print(f"{name:<18}{ms_f:>8.1f}{gf_f:>9.0f}{tf_f:>9.1f}"
                  f"{ms_b if ms_b else 0:>8.1f}{gf_b if gf_b else 0:>9.0f}"
                  f"{tf_b:>9.1f}{tot / fl if fl else 0:>9.2f}")
            tms += tot
            tgf += gf_f + (gf_b or 0.0)
        print(f"{'SUM':<18}{tms:>8.1f}{tgf:>9.0f}"
              f"{tgf / tms:>9.1f}  (x floor {tms / (tgf / 60):>5.2f})")

    if cli.part == "stages":
        return

    # --- step totals for all four trainers ---
    from bfsr_tpu.pipelines.srflow_train import make_srflow_train_step
    from bfsr_tpu.pipelines.srflow_prior_train import (
        make_srflow_prior_train_step,
    )

    batch = {"GT": gt, "LQ": lq}
    key = jax.random.PRNGKey(0)
    optimizer = optax.chain(optax.clip_by_global_norm(10.0),
                            optax.adam(2.5e-4))
    print(f"\nstep totals (b{B}, GT {G}):")
    for name, kw in (("NLL frozen", {"freeze_rrdb": True}),
                     ("NLL unfrozen", {"rrdb_unfreeze_step": None})):
        st = make_srflow_train_step(model, optimizer, weight_fl=1.0, **kw)
        o0 = optimizer.init(params)
        ms = timeit(lambda p, o, b: st(p, o, b, key, jnp.asarray(0)),
                    params, o0, batch, N=5)
        print(f"  srflow {name:<14} {ms:7.1f} ms/step")

    with jax.default_device(jax.devices("cpu")[0]):
        fmodel = registry.make({"name": "srflow", "args": {
            "in_nc": 3, "out_nc": 3, "nf": 64, "nb": 23, "scale": 4,
            "K": 16, "L": 3, "hidden_channels": 64,
            "additional_steps": 2, "split_enable": True,
            "stack_blocks": [1, 8, 15, 22], "stack_concat": True,
            "fea_up0": True}}).freeze()
        pr = registry.make({"name": "srflow-unet",
                            "args": {"depth": 3, "dim": 64}})
    fmodel.params = jax.device_put(fmodel.params, dev)
    pr.params = jax.device_put(pr.params, dev)
    popt = optax.adam(2.5e-4)
    pstep = make_srflow_prior_train_step(fmodel, pr, popt, eps_weight=1.0,
                                         image_weight=1.0)
    ms = timeit(lambda p, o, b: pstep(p, o, fmodel.params, b),
                pr.params, popt.init(pr.params), batch, N=5)
    print(f"  srflow prior          {ms:7.1f} ms/step")


def linf_part(shape="bench"):
    """Per-stage fwd/bwd decomposition of the LINF latent train step
    (latent-L1 loss).  shape='bench': b16, 48^2 LR, x2 (the bench
    --train linf program); shape='ref': b16, 32^2 LR, x4 — the reference
    LP train config's worst-case scale (train_edsr-baseline-linf-LP.yaml:
    inp_size 32, scale_max 4; scales are sampled <=4, so x4 is the
    per-step cost ceiling)."""
    rng = np.random.default_rng(0)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _flagship
    from bfsr_tpu.utils.coords import make_cell, make_coord_np

    Bl, h, scale = (16, 32, 4) if shape == "ref" else (16, 48, 2)
    Hh = h * scale
    with jax.default_device(jax.devices("cpu")[0]):
        model, _ = _flagship()
        prior = registry.make({"name": "unet", "args": {
            "in_chans": 3, "depth": 3, "dim": 64, "bilinear": True}})
    dev = jax.devices()[0]
    lp = jax.device_put(model.params, dev)
    pp = jax.device_put(prior.params, dev)
    inp = jnp.asarray(rng.random((Bl, h, h, 3), dtype=np.float32) - 0.5)
    coord = jnp.broadcast_to(
        jnp.asarray(make_coord_np((Hh, Hh), flatten=False))[None],
        (Bl, Hh, Hh, 2))
    cell = jnp.broadcast_to(jnp.asarray(make_cell((Hh, Hh)))[None], (Bl, 2))
    gt = jnp.asarray(rng.random((Bl, Hh, Hh, 3), dtype=np.float32) - 0.5)

    rows = []

    def add(name, fn, args, vjp_argnum=None):
        print(f"[stage] {name} ...", flush=True)
        jf = jax.jit(fn)
        ms_f = timeit(jf, *args)
        gf = cost(jf, *args) / 1e9
        print(f"  fwd {ms_f:.2f} ms, {gf:.1f} GF", flush=True)
        ms_b = None
        if vjp_argnum is not None:
            def vjp_once(*a):
                prefix = a[:vjp_argnum]
                suffix = a[vjp_argnum + 1:]
                y, pull = jax.vjp(
                    lambda v: fn(*prefix, v, *suffix), a[vjp_argnum])
                return pull(jax.tree_util.tree_map(jnp.ones_like, y))

            jb = jax.jit(vjp_once)
            ms_b = timeit(jb, *args) - ms_f
            print(f"  bwd {ms_b:.2f} ms", flush=True)
        rows.append((name, ms_f, gf, ms_b))

    if shape == "bench":
        add("gen_feat (frozen)", lambda p, x: model.gen_feat(p, x), (lp, inp))
        feat = jax.jit(lambda p, x: model.gen_feat(p, x))(lp, inp)
        add("query_log_p x2 (frozen)",
            lambda p, x, f, c, cl, g: model.query_log_p(p, x, f, c, cl, g)[1],
            (lp, inp, feat, coord, cell, gt))
        z_lr = jax.jit(
            lambda p, x, f, c, cl, g: model.query_log_p(p, x, f, c, cl, g)[1]
        )(lp, inp, feat, coord, cell, gt)
        add("prior UNet (fwd+bwd)",
            lambda q, z, x: prior.apply(q, z, x, training=True)[0],
            (pp, z_lr, inp), vjp_argnum=0)
        z_learned = jax.jit(
            lambda q, z, x: prior.apply(q, z, x, training=True)[0]
        )(pp, z_lr, inp)
        add("flow inverse (query_rgb, bwd wrt z)",
            lambda p, x, f, c, cl, z: model.query_rgb(p, x, f, c, cl, zmap=z),
            (lp, inp, feat, coord, cell, z_learned), vjp_argnum=5)

        print(f"\nLINF latent step stages (b{Bl}, {h}^2 LR x{scale}, HIGH):")
        print(f"{'stage':<36}{'fwd ms':>8}{'GF':>7}{'TF/s':>7}{'bwd ms':>8}")
        for name, ms_f, gf, ms_b in rows:
            print(f"{name:<36}{ms_f:>8.2f}{gf:>7.1f}{gf / ms_f:>7.1f}"
                  f"{ms_b if ms_b else 0:>8.2f}")
        # query_log_p runs twice per step (lr_up target + gt_pixel target)
        tot = sum(r[1] + (r[3] or 0.0) for r in rows) + rows[1][1]
        print(f"sum (query_log_p counted twice): {tot:.1f} ms "
              f"(bench --train linf total includes Adam + BN glue)")

    # the FUSED production step (bench --train linf recipe: latent-L1
    # only, so no flow inverse) in the same process — its cost_analysis
    # GF counts the shared per-query affine-parameter work ONCE, which
    # the standalone stages above each recompute
    from bfsr_tpu.pipelines.linf_train import make_train_step

    optimizer = optax.adam(1e-4)
    step0 = make_train_step(model, prior, None, optimizer,
                            vgg_weight=0.0, latent_weight=1.0)
    batch = {"inp": inp + 0.5, "coord": coord, "cell": cell,
             "gt_lr_up": gt, "gt_pixel": gt}
    o0 = optimizer.init(pp)
    print("[stage] fused step (latent-L1) ...", flush=True)

    def stepfn(p, o, b):
        return step0(p, o, lp, {}, b)

    js = jax.jit(stepfn)
    ms_s = timeit(js, pp, o0, batch)
    gf_s = cost(js, pp, o0, batch) / 1e9
    print(f"fused step (b{Bl}, {h}^2 LR x{scale}): {ms_s:.2f} ms, "
          f"{gf_s:.1f} GF logical -> {gf_s / ms_s:.1f} TF/s "
          f"({gf_s / ms_s / 60:.0%} of the ~60 TF/s HIGH roofline)")
    if rows:
        sum_nofi = sum(r[1] + (r[3] or 0.0) for r in rows[:3]) + rows[1][1]
        print(f"standalone sum of the SAME stages (no inverse): "
              f"{sum_nofi:.1f} ms -> fusion + shared-affine elision buys "
              f"{sum_nofi / ms_s:.1f}x")


if __name__ == "__main__":
    if "--part" in sys.argv and \
            sys.argv[sys.argv.index("--part") + 1].startswith("linf"):
        part = sys.argv[sys.argv.index("--part") + 1]
        linf_part(shape="ref" if part == "linfref" else "bench")
    else:
        main()
