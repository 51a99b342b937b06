from bfsr_tpu.convert import torch_import  # noqa: F401
