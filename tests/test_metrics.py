import numpy as np
import pytest

from bfsr_tpu.utils.metrics import calc_psnr, calculate_ssim, _filter2d_valid, _gaussian_window


def test_psnr_basic(rng):
    hr = rng.random((1, 3, 32, 32))
    sr = hr + 0.1
    # mse = 0.01 -> psnr = 20
    assert abs(calc_psnr(sr, hr) - 20.0) < 1e-6


def test_psnr_div2k_shave(rng):
    hr = rng.random((1, 3, 32, 32))
    sr = hr.copy()
    sr[..., :4, :] += 10.0  # corrupt only the shaved border rows
    assert calc_psnr(sr, hr, dataset="div2k", scale=4) > 80


def test_psnr_benchmark_ychannel(rng):
    hr = rng.random((1, 3, 32, 32))
    sr = hr + 0.1
    res = calc_psnr(sr, hr, dataset="benchmark", scale=2)
    # uniform +0.1 error on RGB -> y diff = 0.1 * sum(coeffs) = 0.1*219.859/256
    expected = -10 * np.log10((0.1 * (65.738 + 129.057 + 25.064) / 256) ** 2)
    assert abs(res - expected) < 1e-5


def test_filter2d_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.random((40, 40)).astype(np.float64)
    window = _gaussian_window(11, 1.5)
    ours = _filter2d_valid(img, window)
    theirs = cv2.filter2D(img, -1, window)[5:-5, 5:-5]
    np.testing.assert_allclose(ours, theirs, atol=1e-10)


def test_gaussian_window_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    kernel = cv2.getGaussianKernel(11, 1.5)
    theirs = np.outer(kernel, kernel.T)
    np.testing.assert_allclose(_gaussian_window(11, 1.5), theirs, atol=1e-12)


def test_ssim_identity(rng):
    img = (rng.random((32, 32, 3)) * 255).astype(np.float64)
    assert abs(calculate_ssim(img, img) - 1.0) < 1e-9


def test_ssim_degrades(rng):
    img = (rng.random((32, 32, 3)) * 255).astype(np.float64)
    noisy = img + rng.normal(0, 40, img.shape)
    assert calculate_ssim(img, noisy) < 0.9
