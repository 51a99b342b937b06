from bfsr_tpu.train import optim, checkpoints  # noqa: F401
