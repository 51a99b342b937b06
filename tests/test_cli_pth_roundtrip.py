"""Full user path: reference-format .pth checkpoints -> test.py CLI.

Builds the torch-oracle LINF + UNet prior, saves them in the reference's
self-describing checkpoint formats (train.py:234-243 / test.py:276-281),
and runs our test.py CLI end-to-end on synthetic paired folders.
"""

import os
import sys

import numpy as np
import pytest
import yaml
from PIL import Image

torch = pytest.importorskip("torch")

from ref_oracle import linf_modules, reference_available, patch_cuda_noop  # noqa: E402

pytestmark = pytest.mark.skipif(not reference_available(), reason="no reference mount")


def test_pth_checkpoint_through_cli(tmp_path, monkeypatch):
    patch_cuda_noop()
    enc_args = {"n_resblocks": 2, "n_feats": 8, "no_upsampling": True}
    margs = {"encoder_spec": {"name": "edsr-baseline", "args": enc_args},
             "imnet_spec": {"name": "flow", "args": {"name": "flow"}},
             "flow_layers": 2, "num_layer": 2, "hidden_dim": 16}
    with linf_modules("edsr", "flow", "unet", "linf") as m:
        torch.manual_seed(0)
        net = m["linf"].LINF(**margs)
        with torch.no_grad():
            for lin in list(net.imnet.linears) + [net.imnet.last]:
                lin._weight += torch.eye(3)
        prior = m["unet"].make_unet(in_chans=3, depth=2, dim=8, bilinear=True)
        model_pth = str(tmp_path / "model.pth")
        prior_pth = str(tmp_path / "prior.pth")
        torch.save({"model": {"name": "linf", "args": margs,
                              "sd": net.state_dict()}}, model_pth)
        torch.save({"prior_model": {"name": "unet",
                                    "args": {"in_chans": 3, "depth": 2,
                                             "dim": 8, "bilinear": True},
                                    "sd": prior.state_dict()}}, prior_pth)

    # synthetic paired LR/HR folders (x2)
    rng = np.random.default_rng(0)
    lr_dir = tmp_path / "lr"
    hr_dir = tmp_path / "hr"
    lr_dir.mkdir()
    hr_dir.mkdir()
    hr = (rng.random((24, 28, 3)) * 255).astype(np.uint8)
    Image.fromarray(hr).save(hr_dir / "0001.png")
    Image.fromarray(hr[::2, ::2]).save(lr_dir / "0001.png")

    config = {
        "test_dataset": {
            "dataset": {"name": "paired-image-folders",
                        "args": {"root_path_1": str(lr_dir),
                                 "root_path_2": str(hr_dir)}},
            "wrapper": {"name": "sr-implicit-paired-fast", "args": {}},
            "batch_size": 1,
        },
        "eval_type": "div2k-2",
        "eval_bsize": 30000,
        "data_norm": {"inp": {"sub": [0.5], "div": [0.5]},
                      "gt": {"sub": [0.5], "div": [0.5]}},
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(config, f)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import test as test_cli

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", [
        "test.py", "--config", cfg_path, "--model", model_pth,
        "--prior_model", prior_pth, "--tile_queries", "256",
    ])
    test_cli.main()  # prints psnr; must not raise
