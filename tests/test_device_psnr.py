"""On-device PSNR equals the host metric."""

import numpy as np
import jax.numpy as jnp

from bfsr_tpu.pipelines.linf_eval import device_psnr
from bfsr_tpu.utils.metrics import calc_psnr


def test_device_psnr_matches_host(rng):
    pred = rng.random((1, 24, 20, 3)).astype(np.float32)
    gt = rng.random((1, 24, 20, 3)).astype(np.float32)
    for dataset, scale in ((None, 1), ("div2k", 4), ("benchmark", 2)):
        host = calc_psnr(np.transpose(pred, (0, 3, 1, 2)),
                         np.transpose(gt, (0, 3, 1, 2)),
                         dataset=dataset, scale=scale)
        dev = float(device_psnr(jnp.asarray(pred), jnp.asarray(gt),
                                dataset, scale))
        assert abs(host - dev) < 1e-3, (dataset, host, dev)
