from bfsr_tpu.ops.pallas import linf_flow  # noqa: F401
