"""SRFlow heats x n_sample validation protocol."""

import numpy as np

import bfsr_tpu.models  # noqa: F401
from bfsr_tpu import registry
from bfsr_tpu.pipelines.srflow_eval import validate


def test_validate_heats(rng):
    m = registry.make({"name": "srflow",
                       "args": {"nf": 8, "nb": 2, "gc": 4, "K": 2, "L": 3,
                                "hidden_channels": 8, "stack_blocks": (0, 1)}}).freeze()
    batches = [{"GT": rng.random((1, 16, 16, 3)).astype(np.float32),
                "LQ": rng.random((1, 4, 4, 3)).astype(np.float32)}]
    nll, samples = validate(m, batches, heats=(0.0, 1.0), n_sample=2)
    assert np.isfinite(nll)
    assert set(samples) == {(0.0, 0), (0.0, 1), (1.0, 0), (1.0, 1)}
    for img in samples.values():
        assert img.shape == (16, 16, 3)
    # heat 0 samples are deterministic (z = 0)
    np.testing.assert_allclose(samples[(0.0, 0)], samples[(0.0, 1)], atol=1e-6)
