"""SRFlow user path: BasicSR-format .pth -> srflow_test.py CLI."""

import os
import sys

import numpy as np
import pytest
import yaml
from PIL import Image

torch = pytest.importorskip("torch")

from ref_oracle import srflow_modules, reference_available  # noqa: E402
from test_convert_srflow import OPT  # noqa: E402

pytestmark = pytest.mark.skipif(not reference_available(), reason="no reference mount")


def test_srflow_pth_through_cli(tmp_path, monkeypatch):
    with srflow_modules("models.modules.SRFlowNet_arch", "models.unet") as m:
        torch.manual_seed(0)
        net = m["models.modules.SRFlowNet_arch"].SRFlowNet(
            in_nc=3, out_nc=3, nf=64, nb=4, gc=32, scale=4, K=2, opt=OPT)
        prior = m["models.unet"].UNet(depth=2, dim=8)
        model_pth = str(tmp_path / "SRFlow.pth")
        prior_pth = str(tmp_path / "SRFlow-LP.pth")
        # BasicSR save_network format: bare state dict with module. prefixes
        torch.save({"module." + k: v for k, v in net.state_dict().items()},
                   model_pth)
        torch.save({"prior_model": {"name": "unet",
                                    "args": {"depth": 2, "dim": 8,
                                             "bilinear": True},
                                    "sd": prior.state_dict()}}, prior_pth)

    rng = np.random.default_rng(0)
    lr_dir = tmp_path / "lr"
    hr_dir = tmp_path / "hr"
    lr_dir.mkdir()
    hr_dir.mkdir()
    hr = (rng.random((48, 40, 3)) * 255).astype(np.uint8)
    Image.fromarray(hr).save(hr_dir / "0001.png")
    Image.fromarray(hr[::4, ::4]).save(lr_dir / "0001.png")

    conf = dict(OPT)
    conf.update({
        "dataroot_GT": str(hr_dir), "dataroot_LR": str(lr_dir),
        "model_path": model_pth, "prior_model_path": prior_pth,
        "prior_model": {"name": "unet",
                        "args": {"depth": 2, "dim": 8, "bilinear": True}},
    })
    conf["network_G"] = dict(conf["network_G"], in_nc=3, out_nc=3, nf=64, nb=4)
    conf_path = str(tmp_path / "conf.yml")
    with open(conf_path, "w") as f:
        yaml.dump(conf, f)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import srflow_test

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", ["srflow_test.py", conf_path, "--limit", "1", "--no_lpips"])
    srflow_test.main()
    assert os.path.exists(os.path.join("results", "SRFlow-LP", "measure_full.csv"))
