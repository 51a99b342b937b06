"""End-to-end CLI smoke: one training epoch on synthetic data + eval."""

import os
import sys

import numpy as np
import pytest
import yaml
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("div2k_tiny")
    rng = np.random.default_rng(0)
    for i in range(3):
        arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i:04d}.png")
    return str(d)


def _config(root):
    return {
        "train_dataset": {
            "dataset": {"name": "image-folder", "args": {"root_path": root}},
            "wrapper": {"name": "sr-implicit-downsampled-fast",
                        "args": {"inp_size": 8, "scale_max": 2, "augment": True}},
            "batch_size": 2,
        },
        "val_dataset": None,
        "data_norm": {"inp": {"sub": [0.5], "div": [0.5]},
                      "gt": {"sub": [0.5], "div": [0.5]}},
        "model": {"name": "linf", "args": {
            "encoder_spec": {"name": "edsr-baseline",
                             "args": {"n_resblocks": 2, "n_feats": 8,
                                      "no_upsampling": True}},
            "imnet_spec": {"name": "flow", "args": {"name": "flow"}},
            "flow_layers": 2, "num_layer": 2, "hidden_dim": 16}},
        "optimizer": {"name": "adam", "args": {"lr": 1e-4}},
        "prior_model": {"name": "unet", "args": {"in_chans": 3, "depth": 2,
                                                 "dim": 8, "bilinear": True}},
        "epoch_max": 1,
        "multi_step_lr": {"milestones": [1], "gamma": 0.5},
        "loss_weight": {"vgg": 0.0, "latent": 1.0},
        "epoch_val": None,
        "epoch_save": None,
        "patch": False,
    }


def test_train_one_epoch_and_eval(tiny_dataset, tmp_path):
    import train as train_cli

    cfg = _config(tiny_dataset)
    cfg["train_dataset"]["wrapper"]["name"] += "-crop"
    cfg["train_dataset"]["wrapper"]["args"] = {"inp_size": 8, "scale_max": 2,
                                               "augment": True}
    save = str(tmp_path / "run")
    train_cli.main(cfg, save, patch=False)
    assert os.path.exists(os.path.join(save, "prior_model-epoch-last.ckpt"))

    # reload the trained prior + eval on a paired-fast loader
    from bfsr_tpu.convert.load import load_prior_model
    from bfsr_tpu import registry
    from bfsr_tpu.data.loader import DataLoader
    from bfsr_tpu.pipelines.linf_eval import eval_psnr

    prior = load_prior_model(os.path.join(save, "prior_model-epoch-last.ckpt"))
    linf = registry.make(cfg["model"]).freeze()
    ds = registry.make({"name": "image-folder", "args": {"root_path": tiny_dataset}})
    w = registry.make({"name": "sr-implicit-downsampled-fast",
                       "args": {"scale_min": 2, "scale_max": 2}},
                      args={"dataset": ds})
    loader = DataLoader(w, batch_size=1, num_workers=1)
    res = eval_psnr(loader, linf, prior, data_norm=cfg["data_norm"],
                    eval_type="div2k-2", tile_queries=512, limit=2)
    assert np.isfinite(res)


def test_warmup_lr_shapes_from_headers(tiny_dataset, tmp_path):
    """test.py --warmup derives LR shapes from PNG headers (no full-dataset
    decode); must agree with the shapes the loader actually yields, and
    fall back (None) when the shape needs the per-item random scale draw."""
    from test import _warmup_lr_shapes
    from bfsr_tpu import registry
    from bfsr_tpu.data.loader import DataLoader

    # fixed-scale downsampled wrapper: floor(header/scale)
    spec = {"dataset": {"name": "image-folder",
                        "args": {"root_path": tiny_dataset}},
            "wrapper": {"name": "sr-implicit-downsampled-fast",
                        "args": {"scale_min": 2, "scale_max": 2}},
            "batch_size": 1}
    ds = registry.make(spec["dataset"])
    w = registry.make(spec["wrapper"], args={"dataset": ds})
    shapes = _warmup_lr_shapes(w, spec, limit=2)
    actual = [tuple(b["inp"].shape[1:3])
              for _, b in zip(range(2), DataLoader(w, batch_size=1,
                                                   num_workers=1))]
    assert shapes == actual == [(32, 32), (32, 32)]

    # random scale range -> can't know without decoding -> fallback
    spec_r = {**spec, "wrapper": {"name": "sr-implicit-downsampled-fast",
                                  "args": {"scale_min": 2, "scale_max": 4}}}
    w_r = registry.make(spec_r["wrapper"], args={"dataset": ds})
    assert _warmup_lr_shapes(w_r, spec_r, limit=2) is None

    # paired folders: the LR file's own header size
    lr_dir = tmp_path / "lr"
    lr_dir.mkdir()
    rng = np.random.default_rng(1)
    Image.fromarray((rng.random((17, 23, 3)) * 255).astype(np.uint8)).save(
        lr_dir / "0000.png")
    hr_dir = tmp_path / "hr"
    hr_dir.mkdir()
    Image.fromarray((rng.random((34, 46, 3)) * 255).astype(np.uint8)).save(
        hr_dir / "0000.png")
    spec_p = {"dataset": {"name": "paired-image-folders",
                          "args": {"root_path_1": str(lr_dir),
                                   "root_path_2": str(hr_dir)}},
              "wrapper": {"name": "sr-implicit-paired-fast", "args": {}},
              "batch_size": 1}
    dsp = registry.make(spec_p["dataset"])
    wp = registry.make(spec_p["wrapper"], args={"dataset": dsp})
    assert _warmup_lr_shapes(wp, spec_p, None) == [(17, 23)]

    # fixed inp_size: one crop shape, no file access needed
    spec_i = {**spec, "wrapper": {"name": "sr-implicit-downsampled-fast",
                                  "args": {"inp_size": 8, "scale_min": 2,
                                           "scale_max": 2}}}
    assert _warmup_lr_shapes(w, spec_i, None) == [(8, 8)]


def test_warmup_predictor_buckets(tiny_dataset):
    """warmup_predictor compiles one program per padded shape bucket and
    dedupes collisions."""
    from bfsr_tpu import registry
    from bfsr_tpu.pipelines.linf_eval import warmup_predictor

    cfg = _config(tiny_dataset)
    linf = registry.make(cfg["model"]).freeze()
    prior = registry.make(cfg["prior_model"])
    logs = []
    buckets = warmup_predictor(
        linf, prior, [(14, 14), (15, 13), (16, 16)], scale=2,
        pad_multiple=8, tile_queries=512, log_fn=logs.append)
    # 14x14 and 15x13 both pad to 16x16; 16x16 pads to 24x24
    assert buckets == [(16, 16), (24, 24)]
    assert len(logs) == 2
