#!/usr/bin/env python
"""Convert reference PyTorch checkpoints to bfsr_tpu .ckpt files.

Usage:
    python convert_checkpoint.py model.pth out.ckpt [--kind auto|linf|prior|srflow|vgg|lpips]
    # srflow also needs the flow config:
    python convert_checkpoint.py SRFlow_DF2K_4X.pth out.ckpt --kind srflow \
        --conf configs/srflow/SRFlow-LP_DF2K_4X.yml

Conversion also happens transparently when a .pth is passed to the CLIs;
this tool just materializes the converted form for faster loads.
"""

import argparse

import yaml

import bfsr_tpu.models  # noqa: F401
from bfsr_tpu.convert import torch_import as cv
from bfsr_tpu.train.checkpoints import save_checkpoint


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("src")
    parser.add_argument("dst")
    parser.add_argument("--kind", default="auto",
                        choices=["auto", "linf", "prior", "srflow", "vgg", "lpips"])
    parser.add_argument("--conf", default=None,
                        help="SRFlow conf yml (for --kind srflow)")
    args = parser.parse_args()

    ckpt = cv.load_torch_checkpoint(args.src)
    kind = args.kind
    if kind == "auto":
        if isinstance(ckpt, dict) and "model" in ckpt:
            kind = "linf"
        elif isinstance(ckpt, dict) and "prior_model" in ckpt:
            kind = "prior"
        else:
            raise SystemExit("cannot auto-detect; pass --kind")

    if kind == "linf":
        payload = {"model": cv.convert_linf_checkpoint(ckpt)}
    elif kind == "prior":
        payload = {"prior_model": cv.convert_prior_checkpoint(ckpt)}
    elif kind == "vgg":
        sd = ckpt.get("state_dict", ckpt)
        payload = cv.convert_vgg19(sd)
    elif kind == "lpips":
        from bfsr_tpu.models.lpips import convert_lpips

        payload = convert_lpips(ckpt.get("state_dict", ckpt))
    elif kind == "srflow":
        if not args.conf:
            raise SystemExit("--kind srflow requires --conf")
        with open(args.conf) as f:
            opt = yaml.safe_load(f)
        from srflow_test import build_srflow_from_conf

        model = build_srflow_from_conf(opt)
        sd = ckpt.get("state_dict", ckpt)
        sd = {k[len("module."):] if k.startswith("module.") else k: v
              for k, v in sd.items()}
        payload = {"params": cv.convert_srflow(sd, model.plan,
                                               nb=model.args["nb"],
                                               scale=model.scale),
                   "spec": model.args}
    save_checkpoint(args.dst, payload)
    print(f"converted {args.src} ({kind}) -> {args.dst}")


if __name__ == "__main__":
    main()
