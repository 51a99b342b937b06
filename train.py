#!/usr/bin/env python
"""LINF-LP latent-module training CLI (mirror of LINF-LP/train.py:275-331).

Usage:
    python train.py --config configs/train/train_edsr-baseline-linf-LP.yaml \
        [--name NAME] [--tag TAG] [--patch PS] [--seed N]

The config schema is the reference's: train_dataset/val_dataset specs,
model (LINF) spec + `resume` checkpoint, prior_model spec, optimizer,
epoch_max, multi_step_lr, loss_weight {vgg, latent}, epoch_val/epoch_save.
"""

import argparse
import os
import random

import numpy as np
import yaml

import jax

import bfsr_tpu.data  # noqa: F401
import bfsr_tpu.models  # noqa: F401
from bfsr_tpu import registry, utils
from bfsr_tpu.convert.load import load_linf_model, load_prior_model
from bfsr_tpu.data.loader import DataLoader
from bfsr_tpu.pipelines.linf_eval import eval_psnr
from bfsr_tpu.pipelines.linf_train import make_train_step
from bfsr_tpu.train import checkpoints as ckpt
from bfsr_tpu.train.optim import make_optimizer, multi_step_lr
from bfsr_tpu.utils.misc import set_save_path


def make_data_loader(spec, tag, seed=0):
    if spec is None:
        return None
    dataset = registry.make(spec["dataset"])
    dataset = registry.make(spec["wrapper"], args={"dataset": dataset})
    utils.log(f"{tag} dataset: size={len(dataset)}")
    if spec.get("loader") == "grain":
        # multi-host option: deterministic per-host sharded global shuffle
        # + worker processes (see data/grain_loader.py)
        from bfsr_tpu.data.grain_loader import GrainLoader

        return GrainLoader(dataset, batch_size=spec["batch_size"],
                           shuffle=(tag == "train"), seed=seed,
                           num_workers=int(spec.get("num_workers", 0)))
    return DataLoader(dataset, batch_size=spec["batch_size"],
                      shuffle=(tag == "train"), num_workers=4, seed=seed)


def to_device_batch(batch):
    import jax.numpy as jnp

    return {k: jnp.asarray(v) for k, v in batch.items()}


def main(config, save_path, patch=False, seed=0):
    global log
    log, writer = set_save_path(save_path)
    with open(os.path.join(save_path, "config.yaml"), "w") as f:
        yaml.dump(config, f, sort_keys=False)

    train_loader = make_data_loader(config.get("train_dataset"), "train",
                                    seed=seed)
    val_loader = make_data_loader(config.get("val_dataset"), "val", seed=seed)
    data_norm = config.get("data_norm") or {
        "inp": {"sub": [0], "div": [1]}, "gt": {"sub": [0], "div": [1]},
    }

    # frozen LINF
    if config.get("resume") and os.path.exists(config["resume"]):
        linf_model = load_linf_model(config["resume"], freeze=True)
    else:
        linf_model = registry.make(config["model"]).freeze()
        utils.log("WARNING: no LINF resume checkpoint found; using random "
                  "init (smoke-test mode)")
    utils.log(f"LINF model: #params={utils.compute_num_params(linf_model.params, text=True)}")

    # prior + optimizer (+resume)
    epoch_start = 1
    resumed_opt_state = None
    resume_prior = config.get("resume_prior_model")
    if resume_prior and os.path.exists(resume_prior):
        if resume_prior.endswith(".pth"):
            prior_model = load_prior_model(resume_prior)
        else:
            sv = ckpt.load_checkpoint(resume_prior)
            prior_model = registry.make(sv["prior_model"], load_params=True)
            resumed_opt_state = (sv.get("optimizer") or {}).get("state")
            epoch_start = int(sv.get("epoch", 0)) + 1
        utils.log(f"resume training from epoch {epoch_start}")
    else:
        prior_model = registry.make(config["prior_model"])
    utils.log(f"Latent module: #params={utils.compute_num_params(prior_model.params, text=True)}")

    iters_per_epoch = len(train_loader)
    mslr = config.get("multi_step_lr")
    base_lr = config["optimizer"]["args"]["lr"]
    # gamma default 0.1: the reference passes the config dict straight
    # into torch MultiStepLR (train.py:104), whose default is 0.1
    schedule = (multi_step_lr(base_lr, [m * iters_per_epoch for m in mslr["milestones"]],
                              mslr.get("gamma", 0.1)) if mslr else None)
    optimizer = make_optimizer(config["optimizer"], schedule)
    opt_state = (resumed_opt_state if resumed_opt_state is not None
                 else optimizer.init(prior_model.params))

    # VGG for the perceptual loss
    vgg_weight = config["loss_weight"]["vgg"]
    latent_weight = config["loss_weight"]["latent"]
    vgg_model = None
    if vgg_weight > 0:
        vgg_model = registry.make({"name": "VGGFeatureExtractor", "args": {}})
        vgg_path = config.get("vgg_weights")
        if vgg_path and os.path.exists(vgg_path):
            if vgg_path.endswith(".pth"):
                from bfsr_tpu.convert.torch_import import (
                    load_torch_checkpoint, convert_vgg19,
                )

                vgg_model.load_params(convert_vgg19(load_torch_checkpoint(vgg_path)))
            else:
                vgg_model.load_params(ckpt.load_checkpoint(vgg_path))
        elif config.get("allow_random_vgg"):
            utils.log("WARNING: no VGG19 weights given (config key "
                      "'vgg_weights'); perceptual loss uses RANDOM features "
                      "(allow_random_vgg set)")
        else:
            raise SystemExit(
                "loss_weight.vgg > 0 but no converted VGG19 weights were "
                "given (config key 'vgg_weights'; convert with "
                "`python convert_checkpoint.py vgg19.pth vgg19.ckpt --kind "
                "vgg`). Training a perceptual loss on random features "
                "produces noise — pass --allow_random_vgg to override."
            )

    step = make_train_step(linf_model, prior_model, vgg_model, optimizer,
                           vgg_weight=vgg_weight, latent_weight=latent_weight,
                           data_norm=data_norm, patch=patch)

    epoch_max = config["epoch_max"]
    epoch_val = config.get("epoch_val")
    epoch_save = config.get("epoch_save")
    timer = utils.Timer()

    prior_params = prior_model.params
    it = (epoch_start - 1) * iters_per_epoch
    # stochastic-depth RNG (swin_latent prior trains with the reference
    # drop_path_rate=0.1 decay rule; other priors ignore the key)
    dp_key = jax.random.PRNGKey(config.get("seed", 0))
    for epoch in range(epoch_start, epoch_max + 1):
        t_epoch_start = timer.t()
        vgg_avg, lat_avg = utils.Averager(), utils.Averager()
        for batch in train_loader:
            dp_key, sub = jax.random.split(dp_key)
            prior_params, opt_state, mets = step(
                prior_params, opt_state, linf_model.params,
                vgg_model.params if vgg_model else {}, to_device_batch(batch),
                sub,
            )
            # ONE host fetch for all metrics: each float() is a separate
            # ~29 ms tunnel round-trip serialized against the step
            host_mets = jax.device_get(mets)
            vgg_avg.add(float(host_mets["vgg_l"]))
            lat_avg.add(float(host_mets["latent_l"]))
            writer.add_scalars("loss", {"vgg_loss": float(host_mets["vgg_l"]),
                                        "latent_loss": float(host_mets["latent_l"])}, it)
            it += 1
        prior_model.params = prior_params

        log_info = [f"epoch {epoch}/{epoch_max}",
                    f"train: vgg_l={vgg_avg.item():.4f}, latent_l: {lat_avg.item():.4f}"]

        sv_file = {
            "prior_model": prior_model.spec(),
            "optimizer": {"spec": config["optimizer"], "state": opt_state},
            "epoch": epoch,
        }
        ckpt.save_checkpoint(os.path.join(save_path, "prior_model-epoch-last.ckpt"),
                             sv_file)
        if epoch_save and epoch % epoch_save == 0:
            ckpt.save_checkpoint(
                os.path.join(save_path, f"prior_model-epoch-{epoch}.ckpt"), sv_file
            )

        if epoch_val and epoch % epoch_val == 0 and val_loader is not None:
            val_res = eval_psnr(val_loader, linf_model, prior_model,
                                data_norm=data_norm,
                                eval_type=config.get("eval_type"),
                                eval_bsize=config.get("eval_bsize"), patch=patch)
            log_info.append(f"val: psnr={val_res:.4f}")
            writer.add_scalar("psnr", val_res, epoch)

        t = timer.t()
        prog = (epoch - epoch_start + 1) / (epoch_max - epoch_start + 1)
        log_info.append(f"{utils.time_text(t - t_epoch_start)} "
                        f"{utils.time_text(t)}/{utils.time_text(t / prog)}")
        utils.log(", ".join(log_info))
        writer.flush()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--name", default=None)
    parser.add_argument("--tag", default=None)
    parser.add_argument("--patch", type=int, default=None,
                        help="patch size; rewrites wrapper/model names like the reference")
    # (validated below: the reference requires an odd patch > 1 —
    # patch models query patch-CENTER coordinates, train.py:312)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--allow_random_vgg", action="store_true",
                        help="proceed with a random-weight VGG perceptual "
                             "loss when no converted weights are given")
    parser.add_argument("--precision", default=None,
                        choices=["default", "high", "highest", "mixed"],
                        help="matmul/conv precision; 'mixed' trains the "
                             "prior in bf16 (stage scope in linf_train; "
                             "measured convergence-equivalent, "
                             "profiling/train_curve.py), rest HIGH")
    args = parser.parse_args()
    if args.precision:
        from bfsr_tpu.ops.nn import set_default_precision

        set_default_precision(args.precision)
    if args.patch is not None and (args.patch <= 1 or args.patch % 2 == 0):
        parser.error("--patch must be an odd integer > 1 (patch models "
                     "query patch-center coordinates; reference "
                     "train.py:312)")

    with open(args.config) as f:
        config = yaml.safe_load(f)

    random.seed(args.seed)
    np.random.seed(args.seed)

    save_name = args.name or "_" + os.path.basename(args.config)[: -len(".yaml")]
    if args.tag is not None:
        save_name += "_" + args.tag
    save_path = os.path.join("./save", save_name)

    # patch-mode config rewriting (reference train.py:309-320): '-crop' is
    # appended to the TRAIN wrapper only; '-patch' to both train and val.
    config["patch"] = bool(args.patch)
    config["train_dataset"]["wrapper"]["name"] += "-crop"
    if args.patch:
        for key in ("train_dataset", "val_dataset"):
            if config.get(key):
                config[key]["wrapper"]["name"] += "-patch"
                config[key]["wrapper"].setdefault("args", {})["patch_size"] = args.patch
        config["model"]["name"] += "-patch"
        config["model"]["args"]["patch_size"] = args.patch
        config["prior_model"]["args"]["in_chans"] = 3 * args.patch ** 2

    if args.allow_random_vgg:
        config["allow_random_vgg"] = True
    main(config, save_path, patch=bool(args.patch), seed=args.seed)
