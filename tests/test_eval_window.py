"""Window-padded (SwinIR-protocol) eval path + sample saving."""

import os

import numpy as np
import pytest
from PIL import Image

import bfsr_tpu.data  # noqa: F401
import bfsr_tpu.models  # noqa: F401
from bfsr_tpu import registry
from bfsr_tpu.data.loader import DataLoader
from bfsr_tpu.pipelines.linf_eval import eval_psnr

from test_pipelines import small_linf


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(2):
        arr = (rng.random((40, 44, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i:04d}.png")
    return str(d)


def test_window_padded_eval(image_dir, tmp_path):
    m = small_linf()
    ds = registry.make({"name": "image-folder", "args": {"root_path": image_dir}})
    w = registry.make({"name": "sr-implicit-downsampled-fast",
                       "args": {"scale_min": 2, "scale_max": 2}},
                      args={"dataset": ds})
    loader = DataLoader(w, batch_size=1, num_workers=1)
    save = str(tmp_path / "samples")
    res = eval_psnr(loader, m, data_norm={"inp": {"sub": [0.5], "div": [0.5]},
                                          "gt": {"sub": [0.5], "div": [0.5]}},
                    eval_type="div2k-2", window_size=8, tile_queries=2048,
                    limit=2, sample=1, save_path=save)
    assert np.isfinite(res)
    assert os.path.exists(os.path.join(save, "801x2.png"))
