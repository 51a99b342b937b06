"""train.py resume: optimizer state + epoch counter round-trip."""

import os

import numpy as np
import pytest
from PIL import Image

from test_cli_smoke import _config, tiny_dataset  # noqa: F401


def test_resume_continues(tiny_dataset, tmp_path):
    import train as train_cli

    cfg = _config(tiny_dataset)
    cfg["train_dataset"]["wrapper"]["name"] += "-crop"
    save = str(tmp_path / "run")
    train_cli.main(cfg, save, patch=False)
    last = os.path.join(save, "prior_model-epoch-last.ckpt")
    assert os.path.exists(last)

    # resume for one more epoch; epoch counter continues from the ckpt
    cfg2 = _config(tiny_dataset)
    cfg2["train_dataset"]["wrapper"]["name"] += "-crop"
    cfg2["resume_prior_model"] = last
    cfg2["epoch_max"] = 2
    train_cli.main(cfg2, save, patch=False)
    from bfsr_tpu.train.checkpoints import load_checkpoint

    sv = load_checkpoint(last)
    assert sv["epoch"] == 2
    # optimizer state restored and advanced (adam count > steps of 1 epoch)
    import jax

    counts = [x for x in jax.tree_util.tree_leaves(sv["optimizer"]["state"])
              if np.asarray(x).ndim == 0]
    assert any(int(np.asarray(c)) >= 3 for c in counts)
