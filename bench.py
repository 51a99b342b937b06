#!/usr/bin/env python
"""Benchmark: LINF-LP learned-prior 4x SR throughput (HR megapixels/sec/chip).

Workload (matches BASELINE.md's operative target): full learned-prior
inference — EDSR-baseline encode, flow-forward z on the LR-up residual,
UNet prior, flow inverse, LR add-back — LR 128x128 -> HR 512x512, batch 1,
single chip, steady state.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "MP/s/chip", "vs_baseline": N}

``vs_baseline`` compares against the PyTorch reference pipeline running the
identical workload on CPU (the reference is CUDA-only; its hot loops were
timed via the read-only mount with .cuda() no-op'ed — see
``--measure-baseline``).  The measured value is cached in
``bench_baseline.json``.
"""

import argparse
import json
import os
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")

LR_SIZE = 128
SCALE = 4
WARMUP = 2
ITERS = 16


def _workload(rng):
    h = w = LR_SIZE
    H, W = h * SCALE, w * SCALE
    inp = rng.random((1, h, w, 3)).astype(np.float32)
    gt_lr_up = (rng.random((1, H, W, 3)) - 0.5).astype(np.float32)
    return inp, gt_lr_up, H, W


def run_tpu_bench():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from bfsr_tpu.pipelines.linf_eval import LINFPredictor
    from bfsr_tpu.utils.coords import make_coord_np, make_cell

    model, prior = _flagship()
    predictor = LINFPredictor(model, prior, tile_queries=65536)

    rng = np.random.default_rng(0)
    inp, gt_lr_up, H, W = _workload(rng)
    inp_j = jnp.asarray(inp)
    gt_j = jnp.asarray(gt_lr_up)
    coord = jnp.asarray(make_coord_np((H, W), flatten=False)[None])
    cell = jnp.asarray(make_cell((H, W))[None])

    def once():
        return predictor.predict(model.params, prior.params, inp_j, coord, cell,
                                 gt_j)

    def sync(out):
        # force full device completion: block_until_ready can return early on
        # tunneled platforms; a host fetch of one element cannot
        np.asarray(out[0, 0, 0, 0])

    for _ in range(WARMUP):
        sync(once())
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = once()
    sync(out)
    dt = (time.perf_counter() - t0) / ITERS
    mps = (H * W) / dt / 1e6
    return mps, dt


def run_patch_bench():
    """Patch-model (ps=3, d=27) learned-prior throughput: LR 128x128 ->
    HR 516x516 (172x172 patch-center queries), fused Pallas path."""
    import jax.numpy as jnp

    from bfsr_tpu import registry
    import bfsr_tpu.models  # noqa: F401
    from bfsr_tpu.pipelines.linf_eval import LINFPredictor
    from bfsr_tpu.utils.coords import make_coord_np, make_cell

    model = registry.make({"name": "linf-patch", "args": {
        "encoder_spec": {"name": "edsr-baseline", "args": {"no_upsampling": True}},
        "imnet_spec": {"name": "flow", "args": {"name": "flow"}},
        "flow_layers": 10, "num_layer": 3, "hidden_dim": 256, "patch_size": 3}})
    model.params["imnet"]["w"] = (model.params["imnet"]["w"] * 0.05
                                  + jnp.eye(27)[None])
    model.freeze()
    prior = registry.make({"name": "unet", "args": {"in_chans": 27, "depth": 3,
                                                    "dim": 64, "bilinear": True}})
    predictor = LINFPredictor(model, prior, tile_queries=65536)

    rng = np.random.default_rng(0)
    h = w = LR_SIZE
    Hq = Wq = 172  # patch centers; HR = 516^2
    inp = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))
    gt = jnp.asarray((rng.random((1, Hq, Wq, 27)) - 0.5).astype(np.float32))
    coord = jnp.asarray(make_coord_np((Hq, Wq), flatten=False)[None])
    cell = jnp.asarray(make_cell((Hq * 3, Wq * 3))[None])

    def once():
        return predictor.predict(model.params, prior.params, inp, coord, cell, gt)

    def sync(out):
        np.asarray(out[0, 0, 0, 0])

    for _ in range(WARMUP):
        sync(once())
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = once()
    sync(out)
    dt = (time.perf_counter() - t0) / ITERS
    return (Hq * 3) * (Wq * 3) / dt / 1e6, dt


def run_multichip_bench(dp=None):
    """dp-sharded eval throughput over whatever devices exist: one image
    per device, batch sharded over a 1-D 'dp' mesh (SURVEY §5.8).  On a
    pod slice this needs zero new code; on one chip it degenerates to
    dp=1.  Returns (aggregate MP/s, per-device MP/s, n_devices)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from __graft_entry__ import _flagship
    from bfsr_tpu.parallel.mesh import make_mesh, replicate
    from bfsr_tpu.pipelines.linf_eval import LINFPredictor
    from bfsr_tpu.utils.coords import make_coord_np, make_cell

    n_dev = len(jax.devices())
    dp = dp or n_dev
    mesh = make_mesh({"dp": dp})

    model, prior = _flagship()
    # per-shard B=1 -> every device runs the fused Pallas path (the
    # batched XLA path measured ~4.8 MP/s/chip vs ~8.5 for Pallas)
    predictor = LINFPredictor(model, prior, tile_queries=65536)

    rng = np.random.default_rng(0)
    h = w = LR_SIZE
    H, W = h * SCALE, w * SCALE
    B = dp
    inp = rng.random((B, h, w, 3)).astype(np.float32)
    gt_lr_up = (rng.random((B, H, W, 3)) - 0.5).astype(np.float32)
    coord = np.broadcast_to(make_coord_np((H, W), flatten=False)[None],
                            (B, H, W, 2)).copy()
    cell = np.broadcast_to(make_cell((H, W))[None], (B, 2)).copy()

    import jax

    with mesh:
        sh = lambda v, spec: jax.device_put(v, NamedSharding(mesh, spec))  # noqa: E731
        inp_s = sh(inp, P("dp"))
        gt_s = sh(gt_lr_up, P("dp"))
        coord_s = sh(coord, P("dp"))
        cell_s = sh(cell, P("dp"))
        lp = replicate(model.params, mesh)
        pp = replicate(prior.params, mesh)

        from jax import shard_map

        def _shard_body(lp_, pp_, i, c, ce, g):
            return predictor._predict_impl(
                lp_, pp_, i, c, ce, g, jnp.float32(0.0),
                jax.random.PRNGKey(0), use_prior=True, sample=False)

        sharded_predict = jax.jit(shard_map(
            _shard_body, mesh=mesh,
            in_specs=(P(), P(), P("dp"), P("dp"), P("dp"), P("dp")),
            out_specs=P("dp"), check_vma=False))

        def once():
            return sharded_predict(lp, pp, inp_s, coord_s, cell_s, gt_s)

        out = once()
        # scaling evidence: the output must stay dp-sharded (each device
        # holds exactly B/dp images — no hidden gather)
        shard_batches = {s.data.shape[0] for s in out.addressable_shards}
        assert shard_batches == {B // dp}, shard_batches

        for _ in range(WARMUP):
            np.asarray(out[0, 0, 0, 0])
            out = once()
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = once()
        np.asarray(out[0, 0, 0, 0])
        dt = (time.perf_counter() - t0) / ITERS
    mps = B * H * W / dt / 1e6
    return mps, mps / dp, n_dev


def run_srflow_multichip_bench(dp=None):
    """dp-sharded SRFlow-LP eval: one LR 128x128 image per device via
    shard_map over the full predictor body (encode -> standardize -> prior
    -> decode).  Pod-slice ready; dp=1 on a single chip."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    import bfsr_tpu.models  # noqa: F401
    from bfsr_tpu import registry
    from bfsr_tpu.parallel.mesh import make_mesh, replicate
    from bfsr_tpu.pipelines.srflow_eval import SRFlowLPPredictor

    n_dev = len(jax.devices())
    dp = dp or n_dev
    mesh = make_mesh({"dp": dp})

    # build on CPU: on-device tree construction over the tunnel is slow
    # and degrades the process dispatch path (CLAUDE.md); replicate()
    # device_puts the finished tree below
    with jax.default_device(jax.devices("cpu")[0]):
        model = registry.make({"name": "srflow",
                               "args": dict(_SRFLOW_ARGS)}).freeze()
        prior = registry.make({"name": "srflow-unet",
                               "args": {"depth": 3, "dim": 64}})
    predictor = SRFlowLPPredictor(model, prior)

    rng = np.random.default_rng(0)
    B = dp
    lr = rng.random((B, LR_SIZE, LR_SIZE, 3)).astype(np.float32)

    with mesh:
        lr_s = jax.device_put(lr, NamedSharding(mesh, P("dp")))
        mp = replicate(model.params, mesh)
        pp = replicate(prior.params, mesh)
        sharded_predict = jax.jit(shard_map(
            predictor._impl, mesh=mesh, in_specs=(P(), P(), P("dp")),
            out_specs=P("dp"), check_vma=False))

        def once():
            return sharded_predict(mp, pp, lr_s)

        out = once()
        assert {s.data.shape[0] for s in out.addressable_shards} == {B // dp}
        for _ in range(WARMUP):
            np.asarray(out[0, 0, 0, 0])
            out = once()
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = once()
        np.asarray(out[0, 0, 0, 0])
        dt = (time.perf_counter() - t0) / ITERS
    H = LR_SIZE * SCALE
    mps = B * H * H / dt / 1e6
    return mps, mps / dp, n_dev


_SRFLOW_ARGS = {"in_nc": 3, "out_nc": 3, "nf": 64, "nb": 23, "scale": 4,
                "K": 16, "L": 3, "hidden_channels": 64, "additional_steps": 2,
                "split_enable": True, "stack_blocks": (1, 8, 15, 22),
                "stack_concat": True, "fea_up0": True}


def run_srflow_bench():
    """SRFlow-LP learned-prior pipeline (full size: nb=23, 2x54 flow steps,
    two-branch prior), LR 128x128 -> HR 512x512, single chip."""
    import jax
    import jax.numpy as jnp

    import bfsr_tpu.models  # noqa: F401
    from bfsr_tpu import registry
    from bfsr_tpu.pipelines.srflow_eval import SRFlowLPPredictor

    # build on CPU, ship ONE device_put (CLAUDE.md: on-device tree builds
    # over the tunnel degrade the process dispatch path ~13x)
    with jax.default_device(jax.devices("cpu")[0]):
        model = registry.make({"name": "srflow",
                               "args": dict(_SRFLOW_ARGS)}).freeze()
        prior = registry.make({"name": "srflow-unet",
                               "args": {"depth": 3, "dim": 64}})
    dev = jax.devices()[0]
    model.params = jax.device_put(model.params, dev)
    prior.params = jax.device_put(prior.params, dev)
    predictor = SRFlowLPPredictor(model, prior)

    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((1, LR_SIZE, LR_SIZE, 3)).astype(np.float32))

    def once():
        return predictor._fn(model.params, prior.params, lr)

    def sync(out):
        np.asarray(out[0, 0, 0, 0])

    for _ in range(WARMUP):
        sync(once())
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = once()
    sync(out)
    dt = (time.perf_counter() - t0) / ITERS
    H = LR_SIZE * SCALE
    return H * H / dt / 1e6, dt


def _dezero(params, seed=7, scale=0.05):
    """Replace all-zero >=2D param leaves (the flow's zero-initialized
    fFeatures/fAffine/split out-convs, Flow.py Conv2dZeros) with small
    random values.  On a random-init model those zeros make the entire
    conditioning CONSTANT (scale_ft = sigmoid(2), shift_ft = 0), so a
    precision sweep would measure only the prior UNet; de-zeroing makes
    every pipeline stage numerically live, approximating a trained
    checkpoint's sensitivity structure."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(seed)
    out = []
    for leaf in leaves:
        arr = np.asarray(leaf)
        if arr.ndim >= 2 and arr.size and not arr.any():
            # fan-in-normalized noise: conditioning features reach O(50-100)
            # on random-init RRDB, so unnormalized noise saturates the
            # affine scales / blows up the epses
            fan_in = int(np.prod(arr.shape[:-1]))
            arr = (rng.standard_normal(arr.shape) * scale
                   / np.sqrt(fan_in)).astype(arr.dtype)
            out.append(arr)
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def _balance_flow(params):
    """Set each coupling step's actnorm logs to cancel the mean coupling
    scale sigmoid(2) ~ 0.8808 (fFeatures full-channel + fAffine on half
    the channels -> 1.5x log per channel on average; the invconv rotation
    mixes channels, so a uniform compensation suffices).  Trained
    checkpoints LEARN this balance; a random init lacks it, so its
    reverse pass amplifies ~1/0.88 per step and overflows at K=16*3."""
    import jax.numpy as jnp

    comp = -1.5 * float(np.log(0.8808))
    layers = []
    for p in params["flow"]["layers"]:
        if "affine" in p and "actnorm" in p:
            p = dict(p)
            an = dict(p["actnorm"])
            an["logs"] = jnp.full_like(an["logs"], comp)
            p["actnorm"] = an
        layers.append(p)
    out = dict(params)
    out["flow"] = dict(params["flow"], layers=layers)
    return out


def run_precision_delta(which):
    """Serving-mode (bf16, BFSR_PRECISION=default) vs HIGH (f32-accurate)
    output delta for the full pipeline — the number that justifies the
    serving rows in BENCH_NOTES.  Builds the model fresh under each mode
    (precision is read at trace time) and runs the identical input.
    Returns (max_abs, rms, agreement_db) where agreement_db is the PSNR
    between the two outputs on the [0,1] pixel scale."""
    import jax.numpy as jnp

    from bfsr_tpu.ops.nn import set_default_precision, default_precision

    rng = np.random.default_rng(0)
    if which == "srflow":
        lr = rng.random((1, LR_SIZE, LR_SIZE, 3)).astype(np.float32)
    else:
        from bfsr_tpu.utils.coords import make_coord_np, make_cell

        inp, gt_lr_up, H, W = _workload(rng)
        coord = jnp.asarray(make_coord_np((H, W), flatten=False)[None])
        cell = jnp.asarray(make_cell((H, W))[None])

    saved = default_precision()
    outs = {}
    try:
        for mode in ("high", "default"):
            set_default_precision(mode)
            if which == "srflow":
                import jax

                import bfsr_tpu.models  # noqa: F401
                from bfsr_tpu import registry
                from bfsr_tpu.pipelines.srflow_eval import SRFlowLPPredictor

                # build + dezero on CPU, ship once (per-leaf on-device
                # round trips degrade the process dispatch path — CLAUDE.md)
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
                predictor = SRFlowLPPredictor(model, prior)
                outs[mode] = np.asarray(
                    predictor._fn(model.params, prior.params, jnp.asarray(lr)))
            else:
                from __graft_entry__ import _flagship
                from bfsr_tpu.pipelines.linf_eval import LINFPredictor

                model, prior = _flagship()
                predictor = LINFPredictor(model, prior, tile_queries=65536)
                outs[mode] = np.asarray(
                    predictor.predict(model.params, prior.params,
                                      jnp.asarray(inp), coord, cell,
                                      jnp.asarray(gt_lr_up)))
    finally:
        set_default_precision(saved)
    d = (outs["high"].astype(np.float64) - outs["default"].astype(np.float64))
    mse = float(np.mean(d * d))
    return float(np.abs(d).max()), float(np.sqrt(mse)), \
        float(10.0 * np.log10(1.0 / max(mse, 1e-30)))


def measure_srflow_torch_baseline():
    """Reference SRFlow-LP pipeline (torch, CPU): encode -> standardize ->
    two-branch prior -> decode on the identical LR 128x128 workload
    (SRFlow-LP/code/test.py:126-148)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    import torch
    import torch.nn.functional as F

    from ref_oracle import srflow_modules, reference_available

    if not reference_available():
        raise SystemExit("reference mount not available")
    opt = {
        "scale": 4,
        "datasets": {"train": {"quant": 32}},
        "network_G": {
            "train_RRDB_delay": 0.5,
            "flow": {"K": 16, "L": 3, "noInitialInj": True,
                     "coupling": "CondAffineSeparatedAndCond",
                     "additionalFlowNoAffine": 2, "split": {"enable": True},
                     "fea_up0": True,
                     "stackRRDB": {"blocks": [1, 8, 15, 22], "concat": True}},
        },
    }
    with srflow_modules("models.modules.SRFlowNet_arch", "models.unet") as m:
        torch.manual_seed(0)
        net = m["models.modules.SRFlowNet_arch"].SRFlowNet(
            in_nc=3, out_nc=3, nf=64, nb=23, gc=32, scale=4, K=16, opt=opt)
        net.eval()
        prior = m["models.unet"].UNet(depth=3, dim=64)
        prior.eval()
        rng = np.random.default_rng(0)
        lr_t = torch.from_numpy(
            rng.random((1, 3, LR_SIZE, LR_SIZE)).astype(np.float32))

        def once():
            with torch.no_grad():
                lr_up = F.interpolate(lr_t, scale_factor=SCALE, mode="bilinear",
                                      align_corners=False)
                epses = []
                net(gt=lr_up, lr=lr_t, reverse=False, epses=epses,
                    add_gt_noise=False)
                for i in range(len(epses)):
                    mean = torch.mean(epses[i], dim=[1], keepdim=True)
                    std = torch.std(epses[i], dim=[1], keepdim=True)
                    epses[i] = (epses[i] - mean) / (std + 1e-8)
                learned = prior(epses)
                sr, _ = net(lr=lr_t, reverse=True, epses=learned, eps_std=0)
                return sr

        t0 = time.perf_counter()
        once()
        dt = time.perf_counter() - t0
    H = LR_SIZE * SCALE
    return H * H / dt / 1e6, dt


def measure_torch_baseline():
    """Time the reference PyTorch pipeline (CPU, .cuda() no-op) on the same
    workload.  Requires the read-only reference mount."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    import torch

    from ref_oracle import linf_modules, patch_cuda_noop, reference_available

    if not reference_available():
        raise SystemExit("reference mount not available")
    patch_cuda_noop()
    torch.manual_seed(0)
    with linf_modules("edsr", "flow", "unet", "linf") as m:
        net = m["linf"].LINF(
            encoder_spec={"name": "edsr-baseline", "args": {"no_upsampling": True}},
            imnet_spec={"name": "flow", "args": {"name": "flow"}},
            flow_layers=10, num_layer=3, hidden_dim=256,
        )
        net.eval()
        prior = m["unet"].make_unet(in_chans=3, depth=3, dim=64, bilinear=True)
        prior.eval()
        with torch.no_grad():
            for lin in list(net.imnet.linears) + [net.imnet.last]:
                lin._weight += torch.eye(3)

        rng = np.random.default_rng(0)
        inp, gt_lr_up, H, W = _workload(rng)
        inp_t = torch.from_numpy(np.transpose(inp, (0, 3, 1, 2)))
        gt_t = torch.from_numpy(np.transpose(gt_lr_up, (0, 3, 1, 2)))
        import utils as ref_utils

        coord = ref_utils.make_coord((H, W), flatten=False).unsqueeze(0)
        cell = torch.tensor([[2.0 / H, 2.0 / W]], dtype=torch.float32)

        def once():
            with torch.no_grad():
                feat = net("gen_feat", inp=inp_t)
                # reference row-chunking (test.py:20-47)
                zs = []
                row = 0
                while row < H:
                    _, z = net("query_log_p", inp=inp_t, feat=feat,
                               coord=coord[:, row:row + 256], cell=cell,
                               gt=gt_t[:, :, row:row + 256])
                    zs.append(z)
                    row += 256
                z = torch.cat(zs, dim=2)
                z_learned = prior(z, inp_t)
                preds = []
                row = 0
                while row < H:
                    pred = net("query_rgb", inp=inp_t, feat=feat,
                               coord=coord[:, row:row + 256], cell=cell,
                               zmap=z_learned[:, :, row:row + 256])
                    preds.append(pred)
                    row += 256
                return torch.cat(preds, dim=2)

        once()  # warmup
        t0 = time.perf_counter()
        n = 2
        for _ in range(n):
            once()
        dt = (time.perf_counter() - t0) / n
    mps = (H * W) / dt / 1e6
    return mps, dt


def run_train_bench(which, iters=10, rounds=3):
    """Driver-visible training throughput (r3 verdict #6: the BENCH_NOTES
    training numbers, reproducible from the benched surface).

    linf: latent-module trainer at the reference shape (batch 16, 48x48
    LR crops, frozen flagship LINF, latent-L1) — one jitted step.
    srflow: full-size SRFlowNet NLL trainer (batch 12, GT 160, reference
    conf); returns BOTH phases: frozen-RRDB (train_RRDB_delay) and
    unfrozen.  Random data: step time does not depend on values.
    """
    import jax
    import jax.numpy as jnp
    import optax

    import bfsr_tpu.models  # noqa: F401
    from bfsr_tpu import registry
    from bfsr_tpu.utils.profiling import device_sync

    rng = np.random.default_rng(0)

    def time_step(step, p0, o0, batch, extra):
        # compile + first
        p, o, m = step(p0, o0, batch, *extra)
        device_sync(m["loss"])
        best = None
        for _ in range(rounds):
            t0 = time.perf_counter()
            pp, oo = p, o
            mm = m
            for _ in range(iters):
                pp, oo, mm = step(pp, oo, batch, *extra)
            device_sync(mm["loss"])
            dt = (time.perf_counter() - t0) / iters
            best = dt if best is None else min(best, dt)
        return best * 1e3

    if which == "linf":
        from __graft_entry__ import _flagship
        from bfsr_tpu.pipelines.linf_train import make_train_step
        from bfsr_tpu.utils.coords import make_cell, make_coord_np

        B, h, scale = 16, 48, 2
        H = h * scale
        # build on CPU, ship one device_put (CLAUDE.md: on-device builds
        # degrade the process dispatch path — at this step size the
        # host-bound dispatch inflates ms/step)
        with jax.default_device(jax.devices("cpu")[0]):
            model, _ = _flagship()
            prior = registry.make({"name": "unet", "args": {
                "in_chans": 3, "depth": 3, "dim": 64, "bilinear": True}})
        dev = jax.devices()[0]
        model.params = jax.device_put(model.params, dev)
        prior.params = jax.device_put(prior.params, dev)
        optimizer = optax.adam(1e-4)
        step0 = make_train_step(model, prior, None, optimizer,
                                vgg_weight=0.0, latent_weight=1.0)
        coord = jnp.broadcast_to(
            jnp.asarray(make_coord_np((H, H), flatten=False))[None],
            (B, H, H, 2))
        batch = {
            "inp": jnp.asarray(rng.random((B, h, h, 3), dtype=np.float32)),
            "coord": coord,
            "cell": jnp.broadcast_to(jnp.asarray(make_cell((H, H)))[None],
                                     (B, 2)),
            "gt_lr_up": jnp.asarray(
                rng.random((B, H, H, 3), dtype=np.float32) - 0.5),
            "gt_pixel": jnp.asarray(
                rng.random((B, H, H, 3), dtype=np.float32) - 0.5),
        }

        def step(p, o, b):
            return step0(p, o, model.params, {}, b)

        ms = time_step(lambda p, o, b: step(p, o, b), prior.params,
                       optimizer.init(prior.params), batch, ())
        return {"linf_ms_per_step": round(ms, 2),
                "steps_per_s": round(1e3 / ms, 1)}

    if which == "srflow-prior":
        from bfsr_tpu.pipelines.srflow_prior_train import (
            make_srflow_prior_train_step,
        )

        with jax.default_device(jax.devices("cpu")[0]):
            model = registry.make({"name": "srflow",
                                   "args": dict(_SRFLOW_ARGS)})
            model.freeze()
            prior = registry.make({"name": "srflow-unet", "args": {}})
        dev = jax.devices()[0]
        model.params = jax.device_put(model.params, dev)
        prior.params = jax.device_put(prior.params, dev)
        optimizer = optax.adam(2.5e-4)
        step0 = make_srflow_prior_train_step(model, prior, optimizer,
                                             eps_weight=1.0,
                                             image_weight=1.0)
        B, G = 12, 160
        batch = {"GT": jnp.asarray(rng.random((B, G, G, 3),
                                              dtype=np.float32)),
                 "LQ": jnp.asarray(rng.random((B, G // 4, G // 4, 3),
                                              dtype=np.float32))}
        ms = time_step(lambda p, o, b: step0(p, o, model.params, b),
                       prior.params, optimizer.init(prior.params), batch, ())
        return {"srflow_prior_ms_per_step": round(ms, 1),
                "steps_per_s": round(1e3 / ms, 2)}

    from bfsr_tpu.pipelines.srflow_train import make_srflow_train_step

    with jax.default_device(jax.devices("cpu")[0]):
        model = registry.make({"name": "srflow", "args": dict(_SRFLOW_ARGS)})
    model.params = jax.device_put(model.params, jax.devices()[0])
    optimizer = optax.chain(optax.clip_by_global_norm(10.0),
                            optax.adam(2.5e-4))
    B, G = 12, 160
    batch = {"GT": jnp.asarray(rng.random((B, G, G, 3), dtype=np.float32)),
             "LQ": jnp.asarray(rng.random((B, G // 4, G // 4, 3),
                                          dtype=np.float32))}
    key = jax.random.PRNGKey(0)
    out = {}
    for name, kw in (("frozen", {"freeze_rrdb": True}),
                     ("unfrozen", {"rrdb_unfreeze_step": None})):
        step = make_srflow_train_step(model, optimizer, weight_fl=1.0, **kw)
        ms = time_step(step, model.params, optimizer.init(model.params),
                       batch, (key, jnp.asarray(0)))
        out[f"srflow_{name}_ms_per_step"] = round(ms, 1)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--measure-baseline", action="store_true")
    parser.add_argument("--multichip", action="store_true",
                        help="dp-sharded throughput over all devices "
                             "(pod-slice ready; dp=1 on a single chip)")
    parser.add_argument("--dp", type=int, default=None)
    parser.add_argument("--patch", action="store_true",
                        help="patch-model (ps=3) throughput line")
    parser.add_argument("--srflow", action="store_true",
                        help="SRFlow-LP pipeline throughput line")
    parser.add_argument("--multichip-srflow", action="store_true",
                        help="dp-sharded SRFlow-LP eval throughput over all "
                             "devices (pod-slice ready; dp=1 on one chip)")
    parser.add_argument("--measure-srflow-baseline", action="store_true")
    parser.add_argument("--precision-delta", choices=["linf", "srflow"],
                        help="measure serving-mode (bf16) vs HIGH output "
                             "delta for the given pipeline")
    parser.add_argument("--train", choices=["linf", "srflow",
                                            "srflow-prior"],
                        help="training-step throughput line (reference "
                             "configs: LINF latent b16/48^2, SRFlow "
                             "b12/GT160; srflow-prior: frozen full-size "
                             "flow + two-branch UNet, b12/GT160)")
    args = parser.parse_args()

    if args.train:
        res = run_train_bench(args.train)
        key = {"linf": "linf_ms_per_step",
               "srflow": "srflow_frozen_ms_per_step",
               "srflow-prior": "srflow_prior_ms_per_step"}[args.train]
        print(json.dumps(dict({
            "metric": f"{args.train}_train_ms_per_step",
            "value": res[key],
            "unit": "ms/step",
        }, **res)))
        return

    if args.precision_delta:
        mx, rms, db = run_precision_delta(args.precision_delta)
        print(json.dumps({
            "metric": f"{args.precision_delta}_serving_vs_high_delta",
            "value": round(db, 1),
            "unit": "dB agreement",
            "max_abs": float(f"{mx:.3g}"),
            "rms": float(f"{rms:.3g}"),
        }))
        return

    if args.measure_srflow_baseline:
        mps, dt = measure_srflow_torch_baseline()
        data = {}
        if os.path.exists(BASELINE_FILE):
            with open(BASELINE_FILE) as f:
                data = json.load(f)
        data["srflow_baseline_mps_cpu_torch"] = mps
        data["srflow_baseline_sec_per_image"] = dt
        with open(BASELINE_FILE, "w") as f:
            json.dump(data, f, indent=1)
        print(json.dumps({"srflow_baseline_mps": mps, "sec_per_image": dt}))
        return

    if args.srflow:
        mps, dt = run_srflow_bench()
        baseline = None
        if os.path.exists(BASELINE_FILE):
            with open(BASELINE_FILE) as f:
                baseline = json.load(f).get("srflow_baseline_mps_cpu_torch")
        print(json.dumps({
            "metric": "srflow_lp_4x_sr_throughput",
            "value": round(mps, 3),
            "unit": "MP/s/chip",
            "vs_baseline": round(mps / baseline, 2) if baseline else None,
            "sec_per_512x512_image": round(dt, 4),
        }))
        return

    if args.patch:
        mps, dt = run_patch_bench()
        print(json.dumps({
            "metric": "linf_lp_patch3_4x_sr_throughput",
            "value": round(mps, 3),
            "unit": "MP/s/chip",
            "sec_per_516x516_image": round(dt, 4),
        }))
        return

    if args.multichip_srflow:
        mps, per_dev, n_dev = run_srflow_multichip_bench(args.dp)
        print(json.dumps({
            "metric": "srflow_lp_4x_sr_throughput_multichip",
            "value": round(mps, 3),
            "unit": "MP/s",
            "per_device": round(per_dev, 3),
            "n_devices": n_dev,
        }))
        return

    if args.multichip:
        mps, per_dev, n_dev = run_multichip_bench(args.dp)
        print(json.dumps({
            "metric": "linf_lp_4x_sr_throughput_multichip",
            "value": round(mps, 3),
            "unit": "MP/s",
            "per_device": round(per_dev, 3),
            "n_devices": n_dev,
        }))
        return

    if args.measure_baseline:
        mps, dt = measure_torch_baseline()
        with open(BASELINE_FILE, "w") as f:
            json.dump({"baseline_mps_cpu_torch": mps, "sec_per_image": dt,
                       "workload": f"LR{LR_SIZE}->x{SCALE}, learned-prior path",
                       "note": "reference PyTorch pipeline, CPU, .cuda() no-op"},
                      f, indent=1)
        print(json.dumps({"baseline_mps": mps, "sec_per_image": dt}))
        return

    mps, dt = run_tpu_bench()
    baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f).get("baseline_mps_cpu_torch")
    vs = (mps / baseline) if baseline else None
    print(json.dumps({
        "metric": "linf_lp_4x_sr_throughput",
        "value": round(mps, 3),
        "unit": "MP/s/chip",
        "vs_baseline": round(vs, 2) if vs else None,
        "sec_per_512x512_image": round(dt, 4),
    }))


if __name__ == "__main__":
    main()
