"""Data pipeline tests on synthetic images."""

import os

import numpy as np
import pytest
from PIL import Image

import bfsr_tpu.data  # noqa: F401
from bfsr_tpu import registry
from bfsr_tpu.data.loader import DataLoader
from bfsr_tpu.data.np_interp import resize_bilinear_np


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(4):
        arr = (rng.random((48 + i, 52, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i:04d}.png")
    return str(d)


def test_resize_bilinear_np_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = rng.random((13, 9, 3)).astype(np.float32)
    ours = resize_bilinear_np(x, (26, 20))
    theirs = (
        F.interpolate(torch.from_numpy(x).permute(2, 0, 1)[None], (26, 20),
                      mode="bilinear", align_corners=False)[0]
        .permute(1, 2, 0).numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-6)


def test_image_folder(image_dir):
    ds = registry.make({"name": "image-folder",
                        "args": {"root_path": image_dir, "repeat": 2, "cache": "in_memory"}})
    assert len(ds) == 8
    img = ds[0]
    assert img.dtype == np.float32 and img.ndim == 3 and img.shape[2] == 3
    assert 0.0 <= img.min() and img.max() <= 1.0
    np.testing.assert_array_equal(ds[0], ds[4])  # repeat wraps


def test_image_folder_bin_cache(image_dir):
    ds = registry.make({"name": "image-folder",
                        "args": {"root_path": image_dir, "cache": "bin"}})
    ds2 = registry.make({"name": "image-folder",
                         "args": {"root_path": image_dir, "cache": "none"}})
    np.testing.assert_allclose(ds[1], ds2[1], atol=1e-7)


def test_downsampled_fast_wrapper(image_dir):
    ds = registry.make({"name": "image-folder", "args": {"root_path": image_dir}})
    w = registry.make({"name": "sr-implicit-downsampled-fast",
                       "args": {"inp_size": 8, "scale_max": 4, "augment": True}},
                      args={"dataset": ds})
    item = w[0]
    assert item["inp"].shape == (8, 8, 3)
    assert item["coord"].shape == (8, 8, 2)
    assert item["gt"].shape == (8, 8, 3)
    assert item["gt_lr_up"].shape == (8, 8, 3)
    assert item["gt_pixel"].shape == (8, 8, 3)
    assert item["cell"].shape == (2,)


def test_downsampled_fast_residual_consistency(image_dir):
    """gt_pixel + lr_up == normalized gt when no subsampling (inp_size=None,
    integer scale)."""
    ds = registry.make({"name": "image-folder", "args": {"root_path": image_dir}})
    w = registry.make({"name": "sr-implicit-downsampled-fast",
                       "args": {"scale_min": 2, "scale_max": 2}},
                      args={"dataset": ds})
    item = w[0]
    lr_up = resize_bilinear_np((item["inp"] - 0.5) / 0.5, item["gt"].shape[:2])
    recon = item["gt_pixel"] + lr_up
    np.testing.assert_allclose(recon, (item["gt"] - 0.5) / 0.5, atol=1e-5)


def test_crop_wrapper(image_dir):
    ds = registry.make({"name": "image-folder", "args": {"root_path": image_dir}})
    w = registry.make({"name": "sr-implicit-downsampled-fast-crop",
                       "args": {"inp_size": 10, "scale_max": 3}},
                      args={"dataset": ds})
    item = w[0]
    assert item["inp"].shape == (10, 10, 3)
    assert item["coord"].shape == (10, 10, 2)
    assert item["gt"].shape == (10, 10, 3)
    assert item["gt_lr_up"].shape == (10, 10, 3)


def test_patch_test_wrapper(image_dir):
    ds = registry.make({"name": "image-folder", "args": {"root_path": image_dir}})
    w = registry.make({"name": "sr-implicit-downsampled-fast-patch-test",
                       "args": {"scale_min": 2, "scale_max": 2, "patch_size": 3}},
                      args={"dataset": ds})
    item = w[0]
    Hq, Wq = item["coord"].shape[:2]
    assert item["gt_lr_up"].shape == (Hq, Wq, 27)


def test_paired_fast_wrapper(image_dir):
    ds = registry.make({"name": "paired-image-folders",
                        "args": {"root_path_1": image_dir, "root_path_2": image_dir}})
    w = registry.make({"name": "sr-implicit-paired-fast", "args": {}},
                      args={"dataset": ds})
    item = w[0]
    assert item["gt"].shape == item["gt_lr_up"].shape


def test_loader_orders_and_stacks(image_dir):
    ds = registry.make({"name": "image-folder", "args": {"root_path": image_dir}})
    w = registry.make({"name": "sr-implicit-downsampled-fast",
                       "args": {"inp_size": 8, "scale_max": 2}},
                      args={"dataset": ds})
    loader = DataLoader(w, batch_size=2, shuffle=True, num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["inp"].shape == (2, 8, 8, 3)
    assert batches[0]["cell"].shape == (2, 2)


def test_loader_early_exit_drains_workers(image_dir):
    """A consumer that stops early (--limit / exception) must not leave
    worker threads blocked forever on a full prefetch queue."""
    import threading
    import time

    ds = registry.make({"name": "image-folder", "args": {"root_path": image_dir}})
    w = registry.make({"name": "sr-implicit-downsampled-fast",
                       "args": {"inp_size": 8, "scale_max": 2}},
                      args={"dataset": ds})
    before = threading.active_count()
    loader = DataLoader(w, batch_size=1, shuffle=False, num_workers=3)
    for batch in loader:
        break  # early exit with 3 more batches pending
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "loader workers leaked"
