"""bfsr_tpu — TPU-native (JAX/XLA/Pallas) rebuild of the BFSR framework.

BFSR ("Boosting Flow-based Generative Super-Resolution Models via Learned
Prior", CVPR 2024) ships two PyTorch research codebases (LINF-LP and
SRFlow-LP).  This package re-designs the same capabilities as one JAX
framework:

* ``bfsr_tpu.ops``      — flow primitives (pointwise flow, actnorm, invertible
                          1x1 conv, affine coupling, squeeze, split) plus
                          torch-semantics resampling ops and MATLAB imresize.
* ``bfsr_tpu.models``   — encoders (EDSR, RRDB, RDN), the LINF
                          coordinate-conditioned flow models, latent (prior)
                          modules, and the SRFlow conditional-flow stack.
* ``bfsr_tpu.data``     — dataset wrappers mirroring the reference's
                          coord/cell/residual conventions.
* ``bfsr_tpu.parallel`` — mesh construction and sharded train/eval steps.
* ``bfsr_tpu.train``    — optimizers, LR schedules, checkpointing.

Everything compute-heavy is a pure jittable function over parameter pytrees
(nested dicts of jnp arrays, NHWC layout).  Classes registered in
``bfsr_tpu.registry`` are thin holders of (params, config) mirroring the
reference's ``models.make(spec)`` factory semantics
(reference: LINF-LP/models/models.py:7-23).
"""

__version__ = "0.1.0"

import os as _os


def _enable_compile_cache():
    """Persistent XLA compilation cache (first compiles of the big fused
    programs take minutes; reruns should not).  Disable with
    BFSR_NO_COMPILE_CACHE=1 or point elsewhere with JAX_COMPILATION_CACHE_DIR."""
    if _os.environ.get("BFSR_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        path = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "bfsr_jax"),
        )
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()

from bfsr_tpu import registry
from bfsr_tpu.registry import register, make, lookup

__all__ = ["registry", "register", "make", "lookup", "__version__"]
