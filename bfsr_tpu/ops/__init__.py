from bfsr_tpu.ops import interp, imresize, nn, flows, pointwise_flow

__all__ = ["interp", "imresize", "nn", "flows", "pointwise_flow"]
