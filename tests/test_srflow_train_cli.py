"""srflow_train.py CLI smoke: tiny pkl dataset, 3 iterations, checkpoint +
auto-resume."""

import os
import pickle
import sys

import jax
import numpy as np
import pytest
import yaml


@pytest.fixture()
def tiny_conf(tmp_path):
    rng = np.random.default_rng(0)
    hrs = [(rng.random((32, 32, 3)) * 255).astype(np.uint8) for _ in range(6)]
    lqs = [(rng.random((8, 8, 3)) * 255).astype(np.uint8) for _ in range(6)]
    gt_p = str(tmp_path / "gt.pklv4")
    lq_p = str(tmp_path / "lq.pklv4")
    with open(gt_p, "wb") as f:
        pickle.dump(hrs, f)
    with open(lq_p, "wb") as f:
        pickle.dump(lqs, f)
    conf = {
        "name": "srflow_smoke",
        "scale": 4,
        "datasets": {"train": {"mode": "LRHR_PKL", "dataroot_GT": gt_p,
                               "dataroot_LQ": lq_p, "quant": 32,
                               "batch_size": 2, "use_flip": True,
                               "n_workers": 1}},
        "network_G": {"in_nc": 3, "out_nc": 3, "nf": 8, "nb": 2,
                      "train_RRDB_delay": 0.5,
                      "flow": {"K": 2, "L": 3, "hidden_channels": 8,
                               "additionalFlowNoAffine": 2,
                               "split": {"enable": True}, "fea_up0": True,
                               "stackRRDB": {"blocks": [0, 1], "concat": True}}},
        "path": {"resume_state": "auto"},
        "train": {"manual_seed": 0, "lr_G": 1e-4, "beta1": 0.9, "beta2": 0.99,
                  "lr_scheme": "MultiStepLR", "lr_steps_rel": [0.5],
                  "lr_gamma": 0.5, "niter": 3, "weight_fl": 1.0},
        "logger": {"print_freq": 1, "save_checkpoint_freq": 2},
    }
    conf_path = str(tmp_path / "conf.yml")
    with open(conf_path, "w") as f:
        yaml.dump(conf, f)
    return conf_path


def test_srflow_train_cli(tiny_conf, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import srflow_train

    monkeypatch.setattr(sys, "argv", ["srflow_train.py", tiny_conf])
    srflow_train.main()
    latest = os.path.join("save", "srflow_smoke", "G_latest.ckpt")
    assert os.path.exists(latest)
    # optimizer state (Adam moments + schedule count) rides in the
    # checkpoint, like the reference's save_training_state
    from bfsr_tpu.train.checkpoints import load_checkpoint

    sv = load_checkpoint(latest)
    assert "opt_state" in sv
    counts = [x for x in jax.tree_util.tree_leaves(sv["opt_state"])
              if getattr(x, "ndim", None) == 0 and x.dtype.kind == "i"]
    assert counts and max(int(c) for c in counts) == 3  # 3 steps taken
    # resume picks up the newest checkpoint AND its optimizer state
    monkeypatch.setattr(sys, "argv", ["srflow_train.py", tiny_conf, "--niter", "4"])
    srflow_train.main()
    sv2 = load_checkpoint(os.path.join("save", "srflow_smoke", "G_latest.ckpt"))
    counts2 = [x for x in jax.tree_util.tree_leaves(sv2["opt_state"])
               if getattr(x, "ndim", None) == 0 and x.dtype.kind == "i"]
    assert counts2 and max(int(c) for c in counts2) == 4


@pytest.fixture()
def tiny_sr_conf(tmp_path):
    rng = np.random.default_rng(1)
    hrs = [(rng.random((32, 32, 3)) * 255).astype(np.uint8) for _ in range(6)]
    lqs = [(rng.random((8, 8, 3)) * 255).astype(np.uint8) for _ in range(6)]
    gt_p = str(tmp_path / "gt.pklv4")
    lq_p = str(tmp_path / "lq.pklv4")
    with open(gt_p, "wb") as f:
        pickle.dump(hrs, f)
    with open(lq_p, "wb") as f:
        pickle.dump(lqs, f)
    conf = {
        "name": "sr_smoke",
        "model": "sr",
        "scale": 4,
        "datasets": {"train": {"mode": "LRHR_PKL", "dataroot_GT": gt_p,
                               "dataroot_LQ": lq_p, "batch_size": 2,
                               "n_workers": 1}},
        "network_G": {"which_model_G": "RRDBNet", "in_nc": 3, "out_nc": 3,
                      "nf": 8, "nb": 1, "gc": 4},
        "path": {"resume_state": "auto"},
        "train": {"lr_G": 1e-4, "beta1": 0.9, "beta2": 0.99,
                  "lr_scheme": "CosineAnnealingLR_Restart",
                  "T_period": [2, 2], "restarts": [2], "restart_weights": [1],
                  "pixel_criterion": "cb", "pixel_weight": 1.0, "niter": 3},
        "logger": {"print_freq": 1, "save_checkpoint_freq": 2},
    }
    conf_path = str(tmp_path / "sr_conf.yml")
    with open(conf_path, "w") as f:
        yaml.dump(conf, f)
    return conf_path


def test_sr_train_cli(tiny_sr_conf, tmp_path, monkeypatch):
    """SRModel path (F13): model: sr conf trains an upsampling RRDB with
    CharbonnierLoss + cosine-restart schedule, checkpoints, and resumes."""
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import srflow_train

    monkeypatch.setattr(sys, "argv", ["srflow_train.py", tiny_sr_conf])
    srflow_train.main()
    assert os.path.exists(os.path.join("save", "sr_smoke", "G_latest.ckpt"))
    monkeypatch.setattr(sys, "argv", ["srflow_train.py", tiny_sr_conf,
                                      "--niter", "4"])
    srflow_train.main()


@pytest.fixture()
def tiny_prior_conf(tmp_path):
    rng = np.random.default_rng(2)
    hrs = [(rng.random((32, 32, 3)) * 255).astype(np.uint8) for _ in range(6)]
    lqs = [(rng.random((8, 8, 3)) * 255).astype(np.uint8) for _ in range(6)]
    gt_p = str(tmp_path / "gt.pklv4")
    lq_p = str(tmp_path / "lq.pklv4")
    with open(gt_p, "wb") as f:
        pickle.dump(hrs, f)
    with open(lq_p, "wb") as f:
        pickle.dump(lqs, f)
    conf = {
        "name": "prior_smoke",
        "scale": 4,
        "datasets": {"train": {"mode": "LRHR_PKL", "dataroot_GT": gt_p,
                               "dataroot_LQ": lq_p, "quant": 32,
                               "batch_size": 2, "n_workers": 1}},
        "network_G": {"in_nc": 3, "out_nc": 3, "nf": 8, "nb": 2,
                      "flow": {"K": 2, "L": 3, "hidden_channels": 8,
                               "additionalFlowNoAffine": 2,
                               "split": {"enable": True}, "fea_up0": True,
                               "stackRRDB": {"blocks": [0, 1], "concat": True}}},
        "prior_model": {"name": "srflow-unet", "args": {"depth": 2, "dim": 8}},
        "path": {"resume_state": "auto"},
        "train": {"lr_G": 1e-4, "beta1": 0.9, "beta2": 0.99,
                  "lr_scheme": "MultiStepLR", "lr_steps_rel": [0.5],
                  "lr_gamma": 0.5, "niter": 3, "weight_eps": 1.0,
                  "weight_img": 1.0},
        "logger": {"print_freq": 1, "save_checkpoint_freq": 2},
    }
    conf_path = str(tmp_path / "prior_conf.yml")
    with open(conf_path, "w") as f:
        yaml.dump(conf, f)
    return conf_path


def test_srflow_prior_train_cli(tiny_prior_conf, tmp_path, monkeypatch):
    """--prior mode (the reference's 'Training (Coming Soon)' path): trains
    the two-branch UNet prior on a frozen flow, saves a checkpoint that
    load_prior_model can consume, and auto-resumes with optimizer state."""
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import srflow_train

    monkeypatch.setattr(sys, "argv", ["srflow_train.py", tiny_prior_conf,
                                      "--prior"])
    srflow_train.main()
    latest = os.path.join("save", "prior_smoke-prior", "prior_latest.ckpt")
    assert os.path.exists(latest)
    # the saved file is a srflow_test-loadable prior checkpoint
    from bfsr_tpu.convert.load import load_prior_model

    prior = load_prior_model(latest)
    assert prior.registry_name == "srflow-unet"
    from bfsr_tpu.train.checkpoints import load_checkpoint

    sv = load_checkpoint(latest)
    counts = [x for x in jax.tree_util.tree_leaves(sv["opt_state"])
              if getattr(x, "ndim", None) == 0 and x.dtype.kind == "i"]
    assert counts and max(int(c) for c in counts) == 3
    # auto-resume continues from the newest checkpoint
    monkeypatch.setattr(sys, "argv", ["srflow_train.py", tiny_prior_conf,
                                      "--prior", "--niter", "4"])
    srflow_train.main()
    sv2 = load_checkpoint(latest)
    counts2 = [x for x in jax.tree_util.tree_leaves(sv2["opt_state"])
               if getattr(x, "ndim", None) == 0 and x.dtype.kind == "i"]
    assert counts2 and max(int(c) for c in counts2) == 4
