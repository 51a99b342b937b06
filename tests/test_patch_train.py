"""Patch-mode (ps=3) TRAINING end-to-end (round-2 verdict Weak #5):

1. golden parity of the '-crop-patch' train-batch construction vs the
   reference torch wrapper (LINF-LP/datasets/wrappers.py:686-783) under a
   matched random seed, and
2. a CLI smoke training one epoch with the reference's --patch 3 config
   rewriting (train.py patch branch incl. the interpolate_coord VGG
   residual add).
"""

import os
import random
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bfsr_tpu.data  # noqa: F401,E402
from bfsr_tpu import registry  # noqa: E402


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("div2k_patch")
    rng = np.random.default_rng(3)
    for i in range(3):
        arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i:04d}.png")
    return str(d)


torch = pytest.importorskip("torch")
from ref_oracle import linf_dataset_modules, reference_available  # noqa: E402


class _RefDS:
    """Torch-side dataset: CHW float tensors."""

    def __init__(self, imgs):
        self.imgs = imgs

    def __len__(self):
        return len(self.imgs)

    def __getitem__(self, i):
        return torch.from_numpy(self.imgs[i].transpose(2, 0, 1).copy())


class _OurDS:
    def __init__(self, imgs):
        self.imgs = imgs

    def __len__(self):
        return len(self.imgs)

    def __getitem__(self, i):
        return self.imgs[i]


@pytest.mark.skipif(not reference_available(), reason="no reference mount")
@pytest.mark.parametrize("augment", [False, True])
def test_crop_patch_wrapper_parity(rng, augment):
    """Same seed -> same crops/scale/augment draws -> every emitted key
    matches the torch '-crop-patch' wrapper."""
    imgs = [rng.random((40, 44, 3)).astype(np.float32) for _ in range(2)]
    kw = dict(inp_size=4, scale_max=2, augment=augment, patch_size=3)

    with linf_dataset_modules("wrappers") as m:
        ref_w = m["wrappers"].SRImplicitDownsampledFastCropPatch(
            _RefDS(imgs), **kw)
        random.seed(11)
        ref_item = {k: v.numpy() for k, v in ref_w[0].items()}

    ours_w = registry.make(
        {"name": "sr-implicit-downsampled-fast-crop-patch", "args": kw},
        args={"dataset": _OurDS(imgs)})
    random.seed(11)
    item = ours_w[0]

    def chw(x):  # ours HWC -> torch CHW layout for comparison
        return np.transpose(x, (2, 0, 1))

    np.testing.assert_allclose(chw(item["inp"]), ref_item["inp"], atol=1e-6)
    np.testing.assert_allclose(item["coord"], ref_item["coord"], atol=1e-6)
    np.testing.assert_allclose(item["cell"], ref_item["cell"], atol=1e-6)
    np.testing.assert_allclose(chw(item["gt"]), ref_item["gt"], atol=1e-6)
    np.testing.assert_allclose(chw(item["gt_patch"]), ref_item["gt_patch"],
                               atol=2e-6)
    np.testing.assert_allclose(chw(item["gt_lr_up"]), ref_item["gt_lr_up"],
                               atol=2e-6)
    np.testing.assert_allclose(item["interpolate_coord"],
                               ref_item["interpolate_coord"], atol=1e-6)


def test_patch_mode_cli_training(tiny_dataset, tmp_path):
    """One epoch of --patch 3 training through train.py's config rewrite
    (train.py:215-229 mirror of reference train.py:309-320), exercising
    the crop-patch wrapper + interpolate_coord VGG-residual path + the
    patch latent target, then a patch-mode eval of the saved prior."""
    import train as train_cli

    cfg = {
        "train_dataset": {
            "dataset": {"name": "image-folder", "args": {"root_path": tiny_dataset}},
            "wrapper": {"name": "sr-implicit-downsampled-fast",
                        "args": {"inp_size": 4, "scale_max": 2}},
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
        "prior_model": {"name": "unet", "args": {"depth": 2, "dim": 8,
                                                 "bilinear": True}},
        "epoch_max": 1,
        "loss_weight": {"vgg": 1.0, "latent": 1.0},
        "epoch_val": None,
        "epoch_save": None,
        "allow_random_vgg": True,
    }
    # the reference __main__ patch rewriting (train.py:309-320)
    ps = 3
    cfg["patch"] = True
    cfg["train_dataset"]["wrapper"]["name"] += "-crop-patch"
    cfg["train_dataset"]["wrapper"]["args"]["patch_size"] = ps
    cfg["model"]["name"] += "-patch"
    cfg["model"]["args"]["patch_size"] = ps
    cfg["prior_model"]["args"]["in_chans"] = 3 * ps ** 2

    save = str(tmp_path / "run_patch")
    train_cli.main(cfg, save, patch=True)
    assert os.path.exists(os.path.join(save, "prior_model-epoch-last.ckpt"))

    # the saved prior must drive a patch-mode eval end-to-end
    from bfsr_tpu.convert.load import load_prior_model
    from bfsr_tpu.data.loader import DataLoader
    from bfsr_tpu.pipelines.linf_eval import eval_psnr

    prior = load_prior_model(os.path.join(save, "prior_model-epoch-last.ckpt"))
    linf = registry.make(cfg["model"]).freeze()
    ds = registry.make({"name": "image-folder", "args": {"root_path": tiny_dataset}})
    w = registry.make({"name": "sr-implicit-downsampled-fast-patch-test",
                       "args": {"scale_min": 2, "scale_max": 2,
                                "patch_size": ps}},
                      args={"dataset": ds})
    loader = DataLoader(w, batch_size=1, num_workers=1)
    res = eval_psnr(loader, linf, prior, data_norm=cfg["data_norm"],
                    eval_type="div2k-2", tile_queries=512, limit=1,
                    patch=True)
    assert np.isfinite(res)
