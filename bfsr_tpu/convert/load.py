"""Checkpoint loading that accepts both formats:

* ``.pth`` — reference PyTorch checkpoints, converted on the fly
  (self-describing {'model'|'prior_model': spec+sd}).
* anything else — bfsr_tpu pickle checkpoints (train/checkpoints.py) whose
  payloads already hold converted specs {'name','args','params'}.
"""

from bfsr_tpu import registry
from bfsr_tpu.train.checkpoints import load_checkpoint


def load_linf_model(path, freeze=True):
    if path.endswith(".pth"):
        from bfsr_tpu.convert.torch_import import (
            load_torch_checkpoint, convert_linf_checkpoint,
        )

        spec = convert_linf_checkpoint(load_torch_checkpoint(path), freeze=freeze)
    else:
        ckpt = load_checkpoint(path)
        spec = ckpt["model"] if "model" in ckpt else ckpt
    model = registry.make(spec, load_params=True)
    if freeze and hasattr(model, "freeze") and not path.endswith(".pth"):
        model.freeze()
    return model


def load_prior_model(path):
    if path.endswith(".pth"):
        from bfsr_tpu.convert.torch_import import (
            load_torch_checkpoint, convert_prior_checkpoint,
        )

        spec = convert_prior_checkpoint(load_torch_checkpoint(path))
    else:
        ckpt = load_checkpoint(path)
        spec = ckpt["prior_model"] if "prior_model" in ckpt else ckpt
    return registry.make(spec, load_params=True)
