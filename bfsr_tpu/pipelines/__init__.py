from bfsr_tpu.pipelines import linf_eval, linf_train  # noqa: F401
