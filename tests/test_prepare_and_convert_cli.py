"""prepare_data.py -> lrhr-pkl round trip, and convert_checkpoint.py CLI."""

import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_prepare_data_roundtrip(tmp_path):
    import prepare_data
    from bfsr_tpu import registry
    import bfsr_tpu.data  # noqa: F401

    rng = np.random.default_rng(0)
    src = tmp_path / "HR"
    src.mkdir()
    for i in range(2):
        Image.fromarray((rng.random((200, 200, 3)) * 255).astype(np.uint8)).save(
            src / f"{i}.png")
    prepare_data.main(str(src), crops_per_image=3, crop_size=160, scale=4)
    gt_p = tmp_path / "pkls" / "HR.pklv4"
    lq_p = tmp_path / "pkls" / "HR_X4.pklv4"
    assert gt_p.exists() and lq_p.exists()
    assert (tmp_path / "pkls" / "HR_1pct.pklv4").exists()

    ds = registry.make({"name": "lrhr-pkl", "args": {
        "dataroot_GT": str(gt_p), "dataroot_LQ": str(lq_p),
        "use_flip": True, "gt_size": 96}})
    assert len(ds) == 6
    item = ds[0]
    assert item["GT"].shape == (96, 96, 3)
    assert item["LQ"].shape == (24, 24, 3)
    assert item["GT"].dtype == np.float32


def test_convert_checkpoint_cli(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    from ref_oracle import linf_modules, reference_available

    if not reference_available():
        pytest.skip("no reference mount")
    with linf_modules("unet") as m:
        torch.manual_seed(0)
        prior = m["unet"].make_unet(in_chans=3, depth=2, dim=8, bilinear=True)
        pth = str(tmp_path / "prior.pth")
        torch.save({"prior_model": {"name": "unet",
                                    "args": {"in_chans": 3, "depth": 2,
                                             "dim": 8, "bilinear": True},
                                    "sd": prior.state_dict()}}, pth)
    import convert_checkpoint

    out = str(tmp_path / "prior.ckpt")
    monkeypatch.setattr(sys, "argv", ["convert_checkpoint.py", pth, out])
    convert_checkpoint.main()
    assert os.path.exists(out)

    from bfsr_tpu.convert.load import load_prior_model

    model = load_prior_model(out)
    assert model.registry_name == "unet"
