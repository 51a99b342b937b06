"""Coverage for the remaining sr-implicit wrappers."""

import numpy as np
import pytest
from PIL import Image

import bfsr_tpu.data  # noqa: F401
from bfsr_tpu import registry


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs2")
    rng = np.random.default_rng(1)
    for i in range(3):
        Image.fromarray((rng.random((60, 64, 3)) * 255).astype(np.uint8)).save(
            d / f"{i:04d}.png")
    return str(d)


def _folder(image_dir):
    return registry.make({"name": "image-folder", "args": {"root_path": image_dir}})


def test_paired_fast_patch(image_dir):
    ds = registry.make({"name": "paired-image-folders",
                        "args": {"root_path_1": image_dir, "root_path_2": image_dir}})
    w = registry.make({"name": "sr-implicit-paired-fast-patch",
                       "args": {"patch_size": 3}}, args={"dataset": ds})
    item = w[0]
    Hq, Wq = item["coord"].shape[:2]
    assert item["gt_lr_up"].shape == (Hq, Wq, 27)
    assert item["cell"].shape == (2,)


def test_downsampled_base_wrapper(image_dir):
    w = registry.make({"name": "sr-implicit-downsampled",
                       "args": {"inp_size": 8, "scale_min": 2, "scale_max": 3,
                                "sample_q": 30}},
                      args={"dataset": _folder(image_dir)})
    item = w[1]
    assert item["coord"].shape == (30, 2)
    assert item["gt"].shape == (30, 3)
    assert item["cell"].shape == (30, 2)


def test_downsampled_fast_patch_train(image_dir):
    w = registry.make({"name": "sr-implicit-downsampled-fast-patch",
                       "args": {"inp_size": 8, "scale_max": 2, "patch_size": 3}},
                      args={"dataset": _folder(image_dir)})
    item = w[0]
    assert item["gt_patch"].shape == (8, 8, 27)
    assert item["gt_lr_up"].shape == (8, 8, 27)
    assert item["coord"].shape == (8, 8, 2)


def test_crop_patch_wrapper(image_dir):
    w = registry.make({"name": "sr-implicit-downsampled-fast-crop-patch",
                       "args": {"inp_size": 6, "scale_max": 2, "patch_size": 3}},
                      args={"dataset": _folder(image_dir)})
    item = w[0]
    # out_size = inp_size * ps = 18; patch-center grid = 6x6
    assert item["coord"].shape == (6, 6, 2)
    assert item["gt_patch"].shape == (6, 6, 27)
    assert item["gt_lr_up"].shape == (6, 6, 27)
    assert item["interpolate_coord"].shape == (18, 18, 2)
    assert item["inp"].shape == (18, 18, 3)


def test_uniform_varied(image_dir):
    ds = registry.make({"name": "paired-image-folders",
                        "args": {"root_path_1": image_dir, "root_path_2": image_dir}})
    w = registry.make({"name": "sr-implicit-uniform-varied",
                       "args": {"size_min": 16, "size_max": 24, "sample_q": 10}},
                      args={"dataset": ds})
    first, last = w[0], w[len(w) - 1]
    assert first["coord"].shape == (10, 2)
    assert last["gt"].shape == (10, 3)


def test_df2k_folder(image_dir):
    ds = registry.make({"name": "image-folder-DF2K",
                        "args": {"root_path_D2K": image_dir,
                                 "root_path_F2K": image_dir, "repeat": 2}})
    assert len(ds) == 12
    img = ds[7]
    assert img.dtype == np.float32 and img.shape[2] == 3
