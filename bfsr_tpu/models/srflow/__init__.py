from bfsr_tpu.models.srflow import flow_upsampler, srflow_net, unet_prior  # noqa: F401
