#!/usr/bin/env python
"""SRFlow base-model training CLI.

The reference ships the SRFlow training *code path* (SRFlow_model.py) but no
runnable train script ("coming soon", SRFlow-LP/README.md); this CLI closes
that gap using the reference conf schema:

    python srflow_train.py <conf.yml> [--niter N]

Expects `datasets.train` with mode LRHR_PKL pickles (see prepare_data.py).
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

import bfsr_tpu.data  # noqa: F401
import bfsr_tpu.models  # noqa: F401
from bfsr_tpu import registry, utils
from bfsr_tpu.data.loader import DataLoader
from bfsr_tpu.pipelines.srflow_train import make_srflow_train_step
from bfsr_tpu.train import checkpoints as ckpt
from bfsr_tpu.train.optim import cosine_restart, multi_step_restart
from bfsr_tpu.utils.misc import set_save_path
import optax

from srflow_test import build_srflow_from_conf


def _make_loader(opt):
    dtrain = opt["datasets"]["train"]
    dataset = registry.make({"name": "lrhr-pkl", "args": {
        "dataroot_GT": dtrain["dataroot_GT"],
        "dataroot_LQ": dtrain["dataroot_LQ"],
        "use_flip": dtrain.get("use_flip", False),
        "gt_size": dtrain.get("GT_size"),
    }})
    return DataLoader(dataset, batch_size=dtrain["batch_size"], shuffle=True,
                      num_workers=dtrain.get("n_workers", 3), drop_last=True)


def _make_schedule(train_opt, niter, base_lr):
    """SR_model.py:84-99 / SRFlow_model.py scheduler wiring."""
    scheme = train_opt.get("lr_scheme", "MultiStepLR")
    if scheme == "CosineAnnealingLR_Restart":
        return cosine_restart(base_lr, train_opt["T_period"],
                              eta_min=train_opt.get("eta_min", 1e-7),
                              restarts=train_opt.get("restarts") or (),
                              restart_weights=train_opt.get("restart_weights") or ())
    steps_rel = train_opt.get("lr_steps_rel")
    lr_steps = ([int(r * niter) for r in steps_rel] if steps_rel
                else train_opt.get("lr_steps", []))
    return multi_step_restart(base_lr, lr_steps, train_opt.get("lr_gamma", 0.5),
                              restarts=train_opt.get("restarts") or (),
                              restart_weights=train_opt.get("restart_weights") or ())


def _wrap_warmup(schedule, train_opt, base_lr):
    """base_model.py:69-81 warmup_iter wiring (confs ship -1 = off)."""
    from bfsr_tpu.train.optim import with_warmup

    return with_warmup(schedule, base_lr, train_opt.get("warmup_iter", -1))


def _restore_opt_state(saved, optimizer, params, log):
    """Resume optimizer state (Adam moments + schedule count) saved with
    the checkpoint — the reference's resume_training restores optimizer
    and scheduler state the same way (base_model.py:112-130).  Falls back
    to a fresh init for checkpoints predating opt_state (or converted
    .pth files)."""
    fresh = optimizer.init(params)
    st = (saved or {}).get("opt_state")
    if st is None:
        return fresh
    try:
        if (jax.tree_util.tree_structure(st)
                == jax.tree_util.tree_structure(fresh)):
            return st
        # orbax restores optax NamedTuples as plain lists: reflow the
        # leaves into the fresh structure when the LIST-IFIED key paths
        # match exactly (matching leaf count+shapes alone would let a
        # reordered/different chain silently land in the wrong slots —
        # round-4 advisor)
        def listify(tree):
            if hasattr(tree, "_fields"):  # NamedTuple
                return [listify(x) for x in tree]
            if isinstance(tree, (list, tuple)):
                return [listify(x) for x in tree]
            if isinstance(tree, dict):
                return {k: listify(v) for k, v in tree.items()}
            return tree

        flat = jax.tree_util.tree_flatten_with_path(listify(st))[0]
        flat_l = jax.tree_util.tree_flatten_with_path(listify(fresh))[0]
        _, treedef = jax.tree_util.tree_flatten(fresh)
        if (len(flat) == len(flat_l)
                and all(pa == pb for (pa, _), (pb, _) in zip(flat, flat_l))
                and all(getattr(a, "shape", None) == getattr(b, "shape", None)
                        for (_, a), (_, b) in zip(flat, flat_l))):
            return jax.tree_util.tree_unflatten(treedef, [v for _, v in flat])
        raise ValueError("optimizer state structure changed")
    except Exception as e:  # noqa: BLE001 - degrade to fresh moments
        log(f"could not restore optimizer state ({e}); reinitializing")
        return fresh


def _save_state(save_path, stem, payload, use_orbax, final=False):
    """Periodic/final checkpoint write: pickle by default; --orbax routes
    the array-heavy payload through orbax async-array checkpointing (the
    spec stays out of the orbax tree — strings are not orbax leaves; resume
    only needs params/opt_state/iter).  The FINAL save always also writes
    the canonical pickle (interchange format)."""
    if use_orbax:
        ckpt.save_orbax(os.path.join(save_path, stem + ".orbax"),
                        {"params": payload["params"],
                         "opt_state": payload["opt_state"],
                         "iter": payload["iter"]})
        if not final:
            return
    ckpt.save_checkpoint(os.path.join(save_path, stem + ".ckpt"), payload)


def train_sr(opt, args):
    """Plain-SR SRModel training (SR_model.py, F13): upsampling RRDB
    generator + pixel criterion.  conf: model: sr, network_G.which_model_G:
    RRDBNet, train.pixel_criterion: l1|l2|cb."""
    from bfsr_tpu.pipelines.sr_train import make_sr_train_step

    train_opt = opt["train"]
    niter = args.niter or train_opt["niter"]
    name = opt.get("name", "sr")
    save_path = os.path.join("./save", name)
    log, writer = set_save_path(save_path)
    loader = _make_loader(opt)

    net = opt["network_G"]
    which = net.get("which_model_G", "RRDBNet")
    if which != "RRDBNet":
        raise NotImplementedError(f"Generator model [{which}] not recognized")
    model = registry.make({"name": "rrdb", "args": {
        "in_nc": net.get("in_nc", 3), "out_nc": net.get("out_nc", 3),
        "nf": net.get("nf", 64), "nb": net.get("nb", 23),
        "gc": net.get("gc", 32), "no_upsampling": False}})

    start_iter = 0
    sv = None
    if (opt.get("path") or {}).get("resume_state") == "auto":
        newest = ckpt.find_auto_resume(save_path)
        if newest:
            sv = ckpt.load_state(newest)
            model.load_params(sv["params"])
            start_iter = int(sv.get("iter", 0))
            log(f"auto-resumed from {newest} at iter {start_iter}")

    base_lr = float(train_opt["lr_G"])
    schedule = _wrap_warmup(_make_schedule(train_opt, niter, base_lr),
                            train_opt, base_lr)
    optimizer = optax.adam(schedule, b1=train_opt.get("beta1", 0.9),
                           b2=train_opt.get("beta2", 0.99))
    opt_state = _restore_opt_state(sv, optimizer, model.params, log)
    step = make_sr_train_step(model, optimizer,
                              pixel_criterion=train_opt.get("pixel_criterion", "cb"),
                              pixel_weight=train_opt.get("pixel_weight", 1.0))

    params = model.params
    it = start_iter
    print_freq = (opt.get("logger") or {}).get("print_freq", 100)
    save_freq = int((opt.get("logger") or {}).get("save_checkpoint_freq", 1000))
    while it < niter:
        for batch in loader:
            if it >= niter:
                break
            dev = {"GT": jnp.asarray(batch["GT"]), "LQ": jnp.asarray(batch["LQ"])}
            params, opt_state, mets = step(params, opt_state, dev)
            if it % print_freq == 0:
                log(f"iter {it}: loss={float(mets['loss']):.4f}")
                writer.add_scalars("train", {"loss": float(mets["loss"])}, it)
            if it and it % save_freq == 0:
                model.params = params
                _save_state(save_path, f"G_{it + 1}",
                            {"params": params, "spec": model.args,
                             "iter": it + 1, "opt_state": opt_state},
                            getattr(args, "orbax", False))
                ckpt.keep_newest(save_path, "G_", 2)
            it += 1
    model.params = params
    _save_state(save_path, "G_latest",
                {"params": params, "spec": model.args, "iter": it,
                 "opt_state": opt_state}, getattr(args, "orbax", False),
                final=True)
    log("training done")


def _maybe_prime_actnorms(model, dev, log, refreeze=False):
    """Data-dependent actnorm init from the first training batch (reference
    FlowActNorms.py:45-59: each ActNorm2d whitens its first activations).
    No-op unless every actnorm still carries the all-zero init — converted
    checkpoints and resumed runs hold trained stats and are left alone."""
    from bfsr_tpu.models.srflow import flow_upsampler as fup

    if not fup.actnorms_unprimed(model.params["flow"]):
        return model.params
    log("priming actnorms from the first batch (FlowActNorms.py:45-59)")
    params = model.prime_actnorms(model.params, dev["GT"], dev["LQ"])
    if refreeze:
        # frozen-eval callers carry w_inv/anic caches; priming changed the
        # actnorm halves of the folds
        params = dict(params)
        params["flow"] = fup.cache_flow_inverses(params["flow"])
    return params


def train_prior(opt, args):
    """SRFlow-LP latent-module (prior) training — the path the reference
    ships only as "coming soon" (SRFlow-LP/README.md:11).  Frozen SRFlow
    encode on the bilinear LR-up AND on GT, eps standardization as in the
    eval contract (code/test.py:142-145), two-branch UNet prior, eps-space
    L1 (+ optional decode-side image L1 at heat 0).  conf: the same
    SRFlow-LP yml; `model: SRFlowPrior` or the --prior flag selects it."""
    from bfsr_tpu.pipelines.srflow_prior_train import make_srflow_prior_train_step
    from srflow_test import load_srflow_model, load_prior_from_conf

    train_opt = opt["train"]
    niter = args.niter or train_opt["niter"]
    name = opt.get("name", "srflow") + "-prior"
    save_path = os.path.join("./save", name)
    log, writer = set_save_path(save_path)
    loader = _make_loader(opt)

    # frozen flow: model_path checkpoint when present (random-init smoke
    # mode otherwise, loudly) + cached inverses/folded affines
    model = load_srflow_model(opt)
    prior = load_prior_from_conf(opt)

    start_iter = 0
    sv = None
    if (opt.get("path") or {}).get("resume_state") == "auto":
        newest = ckpt.find_auto_resume(save_path)
        if newest:
            sv = ckpt.load_state(newest)
            prior.load_params(sv["prior_model"]["params"]
                              if "prior_model" in sv else sv["params"])
            start_iter = int(sv.get("iter", 0))
            log(f"auto-resumed from {newest} at iter {start_iter}")

    base_lr = float(train_opt["lr_G"])
    schedule = _wrap_warmup(_make_schedule(train_opt, niter, base_lr),
                            train_opt, base_lr)
    optimizer = optax.adam(schedule, b1=train_opt.get("beta1", 0.9),
                           b2=train_opt.get("beta2", 0.99))
    opt_state = _restore_opt_state(sv, optimizer, prior.params, log)
    step = make_srflow_prior_train_step(
        model, prior, optimizer,
        eps_weight=train_opt.get("weight_eps", 1.0) or 0.0,
        image_weight=train_opt.get("weight_img", 0.0) or 0.0)

    params = prior.params
    it = start_iter
    print_freq = (opt.get("logger") or {}).get("print_freq", 100)
    save_freq = int((opt.get("logger") or {}).get("save_checkpoint_freq", 1000))
    while it < niter:
        for batch in loader:
            if it >= niter:
                break
            dev = {"GT": jnp.asarray(batch["GT"]), "LQ": jnp.asarray(batch["LQ"])}
            if it == start_iter == 0:
                model.params = _maybe_prime_actnorms(model, dev, log,
                                                     refreeze=True)
            params, opt_state, mets = step(params, opt_state, model.params, dev)
            if it % print_freq == 0:
                host = jax.device_get(mets)
                log(f"iter {it}: " + ", ".join(
                    f"{k}={float(v):.4f}" for k, v in host.items()))
                writer.add_scalars("train", {k: float(v) for k, v in host.items()}, it)
            if it and it % save_freq == 0:
                prior.params = params
                _save_state(save_path, f"prior_{it + 1}",
                            {"prior_model": prior.spec(), "params": params,
                             "iter": it + 1, "opt_state": opt_state},
                            getattr(args, "orbax", False))
                ckpt.keep_newest(save_path, "prior_", 2)
            it += 1
    prior.params = params
    # the final pickle is a srflow_test-loadable prior checkpoint
    # (convert/load.py:load_prior_model reads key 'prior_model')
    _save_state(save_path, "prior_latest",
                {"prior_model": prior.spec(), "params": params, "iter": it,
                 "opt_state": opt_state}, getattr(args, "orbax", False),
                final=True)
    log("training done")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("conf")
    parser.add_argument("--niter", type=int, default=None)
    parser.add_argument("--prior", action="store_true",
                        help="train the SRFlow-LP latent module (prior) on "
                             "a frozen flow instead of the base NLL path")
    parser.add_argument("--orbax", action="store_true",
                        help="periodic saves via orbax async-array "
                             "checkpointing (final save stays pickle)")
    args = parser.parse_args()
    with open(args.conf) as f:
        opt = yaml.safe_load(f)

    if opt.get("model") == "sr":
        return train_sr(opt, args)
    if args.prior or str(opt.get("model", "")).lower() in ("srflowprior",
                                                           "srflow-prior"):
        return train_prior(opt, args)

    train_opt = opt["train"]
    niter = args.niter or train_opt["niter"]
    name = opt.get("name", "srflow")
    save_path = os.path.join("./save", name)
    log, writer = set_save_path(save_path)

    loader = _make_loader(opt)

    model = build_srflow_from_conf(opt)

    # auto-resume from the newest checkpoint (path.resume_state: auto,
    # reference utils/util.py:152-164)
    start_iter = 0
    sv = None
    resume_state = (opt.get("path") or {}).get("resume_state")
    if resume_state == "auto":
        newest = ckpt.find_auto_resume(save_path)
        if newest:
            sv = ckpt.load_state(newest)
            model.load_params(sv["params"])
            start_iter = int(sv.get("iter", 0))
            log(f"auto-resumed from {newest} at iter {start_iter}")

    # RRDB init from pretrained (path.pretrain_model_G), like load_submodule
    pre = (opt.get("path") or {}).get("pretrain_model_G")
    if start_iter == 0 and pre and os.path.exists(pre):
        from bfsr_tpu.convert.torch_import import load_torch_checkpoint, convert_rrdb

        sd = load_torch_checkpoint(pre)
        sd = sd.get("state_dict", sd)
        model.params["rrdb"] = convert_rrdb(sd, nb=model.args["nb"],
                                            upsampling=True, scale=model.scale)
        log(f"loaded pretrained RRDB from {pre}")

    # actnorm data-dependent priming from the first batch
    # (FlowActNorms.py:45-59) happens implicitly through training here;
    # converted checkpoints carry trained actnorm stats instead.

    base_lr = float(train_opt["lr_G"])
    schedule = _wrap_warmup(_make_schedule(train_opt, niter, base_lr),
                            train_opt, base_lr)
    optimizer = optax.adam(schedule, b1=train_opt.get("beta1", 0.9),
                           b2=train_opt.get("beta2", 0.99))
    opt_state = _restore_opt_state(sv, optimizer, model.params, log)

    delay = opt["network_G"].get("train_RRDB_delay")
    unfreeze = int(delay * niter) if delay is not None else None
    wfl = train_opt.get("weight_fl", 1.0) or 1.0
    wl1 = train_opt.get("weight_l1", 0.0) or 0.0
    # two step functions: the frozen phase runs the static stop_gradient
    # form (XLA drops the whole RRDB backward: 1.51x faster per step at
    # the reference config); identical param updates to the mask form.
    # jit is lazy, so only the variants actually reached get compiled.
    step_live = make_srflow_train_step(model, optimizer, weight_fl=wfl,
                                       weight_l1=wl1,
                                       rrdb_unfreeze_step=unfreeze)
    step_frozen = (make_srflow_train_step(model, optimizer, weight_fl=wfl,
                                          weight_l1=wl1, freeze_rrdb=True)
                   if unfreeze is not None else None)

    params = model.params
    it = start_iter
    key = jax.random.PRNGKey(train_opt.get("manual_seed", 0))
    print_freq = (opt.get("logger") or {}).get("print_freq", 100)
    save_freq = int((opt.get("logger") or {}).get("save_checkpoint_freq", 1000))
    while it < niter:
        for batch in loader:
            if it >= niter:
                break
            key, sub = jax.random.split(key)
            dev = {"GT": jnp.asarray(batch["GT"]), "LQ": jnp.asarray(batch["LQ"])}
            if it == start_iter == 0:
                params = _maybe_prime_actnorms(model, dev, log)
                model.params = params
            step = (step_frozen if step_frozen is not None and it < unfreeze
                    else step_live)
            params, opt_state, mets = step(params, opt_state, dev, sub,
                                           jnp.asarray(it))
            if it % print_freq == 0:
                log(f"iter {it}: " + ", ".join(
                    f"{k}={float(v):.4f}" for k, v in mets.items()))
                writer.add_scalars("train", {k: float(v) for k, v in mets.items()}, it)
            if it and it % save_freq == 0:
                model.params = params
                _save_state(save_path, f"G_{it + 1}",
                            {"params": params, "spec": model.args,
                             "iter": it + 1, "opt_state": opt_state},
                            getattr(args, "orbax", False))
                ckpt.keep_newest(save_path, "G_", 2)
            it += 1
    model.params = params
    _save_state(save_path, "G_latest",
                {"params": params, "spec": model.args, "iter": it,
                 "opt_state": opt_state}, getattr(args, "orbax", False),
                final=True)
    log("training done")


if __name__ == "__main__":
    main()
