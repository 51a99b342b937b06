#!/usr/bin/env python
"""LINF-LP evaluation CLI (mirror of LINF-LP/test.py:239-312).

Usage:
    python test.py --config configs/test/test-fast-div2k-4.yaml \
        --model edsr-baseline-linf.pth [--prior_model prior.pth] \
        [--detail] [--randomness] [--temperature T] [--patch] [--sample N]

Accepts reference ``.pth`` checkpoints (converted on load) or bfsr_tpu
``.ckpt`` files.
"""

import argparse
import os

import numpy as np
import yaml
from PIL import Image

import bfsr_tpu.data  # noqa: F401
import bfsr_tpu.models  # noqa: F401
from bfsr_tpu import registry
from bfsr_tpu.convert.load import load_linf_model, load_prior_model
from bfsr_tpu.data.loader import DataLoader
from bfsr_tpu.pipelines.linf_eval import eval_psnr


def _warmup_lr_shapes(wrapper, spec, limit):
    """LR shapes for --warmup from image file HEADERS (PIL reads the size
    without decoding pixels), so the pre-pass doesn't decode the whole
    dataset once before the metric sweep.  Returns None when shapes can't
    be derived without decoding (non-path caches, random scales) — the
    caller then falls back to iterating the loader."""
    import math

    wname = spec["wrapper"]["name"]
    wargs = spec["wrapper"].get("args") or {}
    if wargs.get("inp_size"):
        n = int(wargs["inp_size"])
        return [(n, n)]
    src = getattr(wrapper, "dataset", None)
    if "paired" in wname:
        files = getattr(getattr(src, "dataset_1", None), "files", None)
        scale = None
    elif "downsampled" in wname:
        s_min = wargs.get("scale_min", 1)
        if wargs.get("scale_max", s_min) != s_min:
            return None  # random per-item scale: shape needs the draw
        scale = float(s_min)
        files = getattr(src, "files", None)
    else:
        return None
    if not files:
        return None
    if limit is not None:
        files = files[:limit]
    shapes = []
    for f in files:
        if not isinstance(f, str) or f.endswith(".pkl"):
            return None
        w, h = Image.open(f).size  # header only, no decode
        if scale:
            h = math.floor(h / scale + 1e-9)
            w = math.floor(w / scale + 1e-9)
        shapes.append((h, w))
    return shapes


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--model", required=True)
    parser.add_argument("--prior_model", default=None)
    parser.add_argument("--window", default="0")
    parser.add_argument("--scale_max", default="30")
    parser.add_argument("--sample", type=int, default=0)
    parser.add_argument("--detail", action="store_true")
    parser.add_argument("--randomness", action="store_true")
    parser.add_argument("--temperature", type=float, default=0)
    parser.add_argument("--patch", action="store_true")
    parser.add_argument("--name", type=str, default=None)
    parser.add_argument("--name_sub", type=str, default=None)
    parser.add_argument("--limit", type=int, default=None,
                        help="evaluate only the first N images")
    parser.add_argument("--tile_queries", type=int, default=65536)
    parser.add_argument("--pad_multiple", type=int, default=0,
                        help="reflect-pad LR to this multiple to bound jit "
                             "recompiles across image shapes")
    parser.add_argument("--warmup", action="store_true",
                        help="pre-pass: compile the predictor for every "
                             "dataset LR shape bucket (honors "
                             "--pad_multiple) before the metric sweep; "
                             "fills the persistent XLA compile cache")
    parser.add_argument("--lpips_weights", default=None,
                        help="converted LPIPS-alex weights (.ckpt or torch "
                             ".pth); required for --detail unless --no_lpips")
    parser.add_argument("--no_lpips", action="store_true",
                        help="skip the LPIPS metric in --detail mode")
    parser.add_argument("--precision", default=None,
                        choices=["default", "high", "highest", "mixed"],
                        help="matmul/conv precision: 'high' (f32-accurate, "
                             "the default), 'default' (bf16 serving "
                             "mode, ~1.2-1.7x faster), or 'mixed' "
                             "(per-stage: prior/encoder bf16, head/flow "
                             "HIGH — most of serving's speed at near-f32 "
                             "fidelity, BENCH_NOTES r4; flow/log-det "
                             "paths stay f32-exact in every mode)")
    args = parser.parse_args()

    if args.precision:
        from bfsr_tpu.ops.nn import set_default_precision

        set_default_precision(args.precision)

    with open(args.config) as f:
        config = yaml.safe_load(f)

    # LPIPS is the paper's headline metric (reference test.py:87,193): fail
    # loudly (and fast, before model load) rather than silently reporting
    # NaN when weights are missing.
    lpips_model = None
    if args.lpips_weights:
        from bfsr_tpu.models.lpips import load_lpips

        lpips_model = load_lpips(args.lpips_weights)
    elif args.detail and not args.no_lpips:
        raise SystemExit(
            "--detail computes LPIPS (the paper's headline metric) but no "
            "weights were given. Convert once with `python "
            "convert_checkpoint.py lpips_alex.pth lpips.ckpt --kind lpips` "
            "and pass --lpips_weights, or pass --no_lpips to skip it."
        )

    model = load_linf_model(args.model, freeze=True)
    prior_model = load_prior_model(args.prior_model) if args.prior_model else None

    if args.patch:
        config["test_dataset"]["wrapper"]["name"] += "-patch"
        if "downsampled" in config["test_dataset"]["wrapper"]["name"]:
            config["test_dataset"]["wrapper"]["name"] += "-test"
        config["test_dataset"]["wrapper"].setdefault("args", {})["patch_size"] = \
            model.patch_size

    spec = config["test_dataset"]
    dataset = registry.make(spec["dataset"])
    dataset = registry.make(spec["wrapper"], args={"dataset": dataset})
    loader = DataLoader(dataset, batch_size=spec["batch_size"], num_workers=8)

    if args.name is None:
        save_path = "./sample"
    elif args.name_sub is not None:
        save_path = os.path.join("./sample", args.name, args.name_sub)
    else:
        save_path = os.path.join("./sample", args.name)

    if args.warmup:
        from bfsr_tpu.pipelines.linf_eval import warmup_predictor

        shapes = _warmup_lr_shapes(dataset, spec, args.limit)
        if shapes is None:
            # fallback: decode via the loader (in-memory/bin caches or
            # random-scale wrappers, where headers can't give the shape)
            shapes = []
            for i, batch in enumerate(loader):
                if args.limit is not None and i >= args.limit:
                    break
                shapes.append(tuple(batch["inp"].shape[1:3]))
        eval_type = config.get("eval_type")
        warmup_scale = (int(args.scale_max) if eval_type is None
                        else int(eval_type.split("-")[-1]))
        # mirror eval_psnr's clamp: a mismatched tile size would compile
        # different programs than the sweep dispatches
        warm_tq = args.tile_queries
        if config.get("eval_bsize"):
            warm_tq = min(warm_tq, int(config["eval_bsize"]))
        warmup_predictor(model, prior_model, shapes, scale=warmup_scale,
                         pad_multiple=int(args.window) or args.pad_multiple,
                         tile_queries=warm_tq)

    res = eval_psnr(
        loader, model,
        prior_model=prior_model,
        data_norm=config.get("data_norm"),
        eval_type=config.get("eval_type"),
        eval_bsize=config.get("eval_bsize"),
        window_size=int(args.window),
        scale_max=int(args.scale_max),
        verbose=True,
        detail=args.detail,
        randomness=args.randomness,
        temperature=args.temperature,
        patch=args.patch,
        tile_queries=args.tile_queries,
        lpips_model=lpips_model,
        limit=args.limit,
        sample=args.sample,
        save_path=save_path,
        pad_multiple=args.pad_multiple,
    )
    if args.detail:
        for key, val in res.items():
            print(f"{key}: {val:.3f}")
    else:
        print(f"psnr: {res:.3f}")


if __name__ == "__main__":
    main()
