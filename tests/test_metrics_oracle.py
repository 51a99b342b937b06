"""Golden parity of utils/metrics.py against the reference's OWN metric
implementations (LINF-LP/utils.py:132-193: calc_psnr with every
dataset/shave/Y-channel branch, and the MATLAB-protocol calculate_ssim),
imported read-only via ref_oracle.linf_utils.

These two functions are the parity gate for every number the framework
publishes, so they get a direct oracle check — not just protocol/property
tests (round-2 verdict Missing #3).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_oracle import linf_utils, reference_available  # noqa: E402
from bfsr_tpu.utils import metrics  # noqa: E402

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="no reference mount")


@pytest.mark.parametrize("dataset,scale", [
    (None, 1),
    ("div2k", 2),
    ("div2k", 4),
    ("benchmark", 2),
    ("benchmark", 4),
])
def test_calc_psnr_oracle(rng, dataset, scale):
    sr = rng.random((1, 3, 40, 52)).astype(np.float32)
    hr = np.clip(sr + rng.normal(0, 0.05, sr.shape), 0, 1).astype(np.float32)
    with linf_utils() as ref:
        want = float(ref.calc_psnr(torch.from_numpy(sr), torch.from_numpy(hr),
                                   dataset=dataset, scale=scale))
    got = metrics.calc_psnr(sr, hr, dataset=dataset, scale=scale)
    assert abs(got - want) < 1e-4, (got, want)


def test_calc_psnr_oracle_single_channel_benchmark(rng):
    """benchmark protocol with C=1 skips the gray conversion
    (utils.py:136-141 'if diff.size(1) > 1')."""
    sr = rng.random((1, 1, 32, 32)).astype(np.float32)
    hr = np.clip(sr + rng.normal(0, 0.1, sr.shape), 0, 1).astype(np.float32)
    with linf_utils() as ref:
        want = float(ref.calc_psnr(torch.from_numpy(sr), torch.from_numpy(hr),
                                   dataset="benchmark", scale=3))
    got = metrics.calc_psnr(sr, hr, dataset="benchmark", scale=3)
    assert abs(got - want) < 1e-4


def test_calc_psnr_oracle_rgb_range(rng):
    sr = (rng.random((2, 3, 24, 24)) * 255).astype(np.float32)
    hr = np.clip(sr + rng.normal(0, 8, sr.shape), 0, 255).astype(np.float32)
    with linf_utils() as ref:
        want = float(ref.calc_psnr(torch.from_numpy(sr), torch.from_numpy(hr),
                                   dataset="div2k", scale=4, rgb_range=255))
    got = metrics.calc_psnr(sr, hr, dataset="div2k", scale=4, rgb_range=255.0)
    assert abs(got - want) < 1e-4


@pytest.mark.parametrize("shape", [(48, 64), (48, 64, 1), (48, 64, 3)])
def test_calculate_ssim_oracle(rng, shape):
    a = (rng.random(shape) * 255).astype(np.float64)
    b = np.clip(a + rng.normal(0, 12, shape), 0, 255).astype(np.float64)
    with linf_utils() as ref:
        want = float(ref.calculate_ssim(a, b))
    got = metrics.calculate_ssim(a, b)
    assert abs(got - want) < 1e-8, (got, want)


def test_calculate_ssim_oracle_uint8(rng):
    """The CLIs feed uint8 images; oracle must agree on that dtype too."""
    a = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
    b = np.clip(a.astype(np.int32) + rng.integers(-20, 20, a.shape), 0,
                255).astype(np.uint8)
    with linf_utils() as ref:
        want = float(ref.calculate_ssim(a, b))
    got = metrics.calculate_ssim(a, b)
    assert abs(got - want) < 1e-8


def test_make_coord_oracle(rng):
    """Coordinate convention parity: utils.make_coord (grid centers in
    [-1,1], utils.py:105-120) vs ours — silent drift here skews every
    query-grid evaluation."""
    from bfsr_tpu.utils.coords import make_coord_np

    with linf_utils() as ref:
        want = ref.make_coord((7, 11)).numpy()
    got = make_coord_np((7, 11))
    np.testing.assert_allclose(got, want, atol=1e-6)
