#!/usr/bin/env python
"""SRFlow-LP evaluation CLI (mirror of SRFlow-LP/code/test.py).

Usage:
    python srflow_test.py <conf.yml> [--limit N] [--lpips_weights PATH]

Accepts the reference conf schema (confs/SRFlow-LP_DF2K_4X.yml): test
settings dataroot_GT/dataroot_LR, model_path, prior_model_path, prior_model
spec, network_G flow params.  Checkpoints may be reference ``.pth``
(converted on load) or bfsr_tpu ``.ckpt``.
"""

import argparse
import csv
import glob
import os
import sys

import numpy as np
import yaml
from PIL import Image

import bfsr_tpu.models  # noqa: F401
from bfsr_tpu import registry
from bfsr_tpu.ops.imresize import imresize
from bfsr_tpu.pipelines.srflow_eval import SRFlowLPPredictor
from bfsr_tpu.utils.measure import Measure, natsorted, psnr_uint8


def build_srflow_from_conf(opt):
    g = opt["network_G"]
    flow = g["flow"]
    return registry.make({"name": "srflow", "args": {
        "in_nc": g.get("in_nc", 3), "out_nc": g.get("out_nc", 3),
        "nf": g.get("nf", 64), "nb": g.get("nb", 23),
        "scale": opt.get("scale", 4),
        "K": flow.get("K", 16), "L": flow.get("L", 3),
        "hidden_channels": flow.get("hidden_channels", 64),
        "additional_steps": flow.get("additionalFlowNoAffine", 2),
        "split_enable": bool((flow.get("split") or {}).get("enable")),
        "stack_blocks": tuple((flow.get("stackRRDB") or {}).get("blocks", ())),
        "stack_concat": bool((flow.get("stackRRDB") or {}).get("concat")),
        "fea_up0": bool(flow.get("fea_up0")),
        "quant": ((opt.get("datasets") or {}).get("train") or {}).get("quant", 32),
    }})


def load_srflow_model(opt):
    model = build_srflow_from_conf(opt)
    path = opt.get("model_path")
    if path and os.path.exists(path):
        if path.endswith(".pth"):
            from bfsr_tpu.convert.torch_import import (
                load_torch_checkpoint, convert_srflow,
            )

            ckpt = load_torch_checkpoint(path)
            sd = ckpt.get("state_dict", ckpt)
            sd = {k[len("module."):] if k.startswith("module.") else k: v
                  for k, v in sd.items()}
            model.load_params(convert_srflow(sd, model.plan,
                                             nb=model.args["nb"],
                                             scale=model.scale))
        else:
            from bfsr_tpu.train.checkpoints import load_checkpoint

            model.load_params(load_checkpoint(path)["params"])
    else:
        print(f"WARNING: model_path {path!r} missing; random init "
              "(smoke-test mode)")
    # freeze on EVERY branch: eval needs the host-side invconv inverse
    # caches (float64, like the reference's .double() inverse) and the
    # folded actnorm+invconv affines — a .ckpt load carries none of them
    model.freeze()
    return model


def load_prior_from_conf(opt):
    path = opt.get("prior_model_path")
    if path and os.path.exists(path):
        from bfsr_tpu.convert.load import load_prior_model

        return load_prior_model(path)
    print(f"WARNING: prior_model_path {path!r} missing; random init")
    spec = dict(opt["prior_model"])
    if spec["name"] == "unet":
        spec = {"name": "srflow-unet", "args": spec.get("args", {})}
    return registry.make(spec)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("conf")
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--lpips_weights", default=None)
    parser.add_argument("--no_lpips", action="store_true",
                        help="skip the LPIPS metric (otherwise weights are "
                             "required — it is the paper's headline metric)")
    parser.add_argument("--pad_multiple", type=int, default=2,
                        help="reflect-pad LR shapes to this multiple to "
                             "bound jit recompiles across image shapes "
                             "(SR is cropped back; metrics differ only by "
                             "border receptive fields)")
    parser.add_argument("--warmup", action="store_true",
                        help="pre-compile one program per LR shape bucket "
                             "before the metric sweep (shapes read from "
                             "PNG headers — no decode)")
    parser.add_argument("--precision", default=None,
                        choices=["default", "high", "highest", "mixed"],
                        help="matmul/conv precision: 'high' (f32-accurate, "
                             "the default), 'default' (bf16 serving "
                             "mode, ~1.2-1.7x faster), or 'mixed' "
                             "(per-stage policy, BENCH_NOTES r4; "
                             "flow/log-det paths stay f32-exact in "
                             "every mode)")
    args = parser.parse_args()

    if args.precision:
        from bfsr_tpu.ops.nn import set_default_precision

        set_default_precision(args.precision)

    with open(args.conf) as f:
        opt = yaml.safe_load(f)

    lpips_model = None
    if args.lpips_weights:
        from bfsr_tpu.models.lpips import load_lpips

        lpips_model = load_lpips(args.lpips_weights)
    elif not args.no_lpips:
        raise SystemExit(
            "LPIPS (the paper's headline metric, Measure.py:32-44) needs "
            "converted weights. Convert once with `python "
            "convert_checkpoint.py lpips_alex.pth lpips.ckpt --kind lpips` "
            "and pass --lpips_weights, or pass --no_lpips to skip it."
        )
    measure = Measure(lpips_model)

    # check the inputs BEFORE the (potentially minutes-long) model build
    lr_paths = natsorted(glob.glob(os.path.join(opt["dataroot_LR"], "*.png")))
    hr_paths = natsorted(glob.glob(os.path.join(opt["dataroot_GT"], "*.png")))
    if not lr_paths or not hr_paths:
        raise SystemExit(
            f"no .png images found (dataroot_LR={opt['dataroot_LR']!r}: "
            f"{len(lr_paths)} files, dataroot_GT={opt['dataroot_GT']!r}: "
            f"{len(hr_paths)} files) — check the conf paths")

    model = load_srflow_model(opt)
    prior = load_prior_from_conf(opt)
    predictor = SRFlowLPPredictor(model, prior, pad_multiple=args.pad_multiple)
    if args.limit:
        lr_paths, hr_paths = lr_paths[: args.limit], hr_paths[: args.limit]

    if args.warmup:
        import time as _time

        seen = set()
        m = max(2, args.pad_multiple)
        for p_ in lr_paths:
            w_, h_ = Image.open(p_).size  # header only, no decode
            hb = -(-h_ // m) * m
            wb = -(-w_ // m) * m
            if (hb, wb) not in seen:
                seen.add((hb, wb))
                t0 = _time.perf_counter()
                predictor.predict(np.zeros((hb, wb, 3), np.float32))
                print(f"warmup: LR {hb}x{wb} compiled in "
                      f"{_time.perf_counter() - t0:.1f}s")

    test_dir = os.path.join("results", "SRFlow-LP")
    os.makedirs(test_dir, exist_ok=True)
    csv_tmp = os.path.join(test_dir, "measure_full.csv_")
    csv_final = os.path.join(test_dir, "measure_full.csv")
    rows = []
    scale = opt["scale"]

    for idx, (lp, hp) in enumerate(zip(lr_paths, hr_paths)):
        lr = np.asarray(Image.open(lp).convert("RGB"), np.float32) / 255.0
        hr = np.asarray(Image.open(hp).convert("RGB"))
        sr01 = predictor.predict(lr)
        sr = np.round(sr01 * 255.0).astype(np.uint8)
        Image.fromarray(sr).save(os.path.join(test_dir, f"{idx:06d}.png"))

        p, s, l = measure.measure(sr, hr)
        lr_recon = imresize(sr, scale=1.0 / scale)
        lrc = psnr_uint8(np.round(lr * 255.0).astype(np.uint8), lr_recon)
        row = {"conf": os.path.basename(args.conf), "name": idx,
               "PSNR": p, "SSIM": s, "LPIPS": l, "LRC PSNR": lrc}
        rows.append(row)
        print(", ".join(f"{k}: {v:0.4f}" if isinstance(v, float) else f"{k}: {v}"
                        for k, v in row.items()))
        # crash-safe incremental CSV (reference test.py:165-171)
        with open(csv_tmp + "_", "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)
        os.replace(csv_tmp + "_", csv_tmp)

    os.replace(csv_tmp, csv_final)
    mean = {k: float(np.mean([r[k] for r in rows]))
            for k in ("PSNR", "SSIM", "LPIPS", "LRC PSNR")}
    print("Mean: " + ", ".join(f"{k}: {v:0.4f}" for k, v in mean.items()))
    print(f"Results in: {csv_final}")


if __name__ == "__main__":
    main()
