"""Native C++ pipeline kernels vs the numpy references."""

import numpy as np
import pytest

from bfsr_tpu import native
from bfsr_tpu.data.np_interp import resize_bilinear_np
from bfsr_tpu.ops.imresize import imresize

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_bilinear_matches_numpy(rng):
    x = rng.random((23, 17, 3)).astype(np.float32)
    ours = native.bilinear_resize(x, (46, 40))
    ref = resize_bilinear_np(x, (46, 40))
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_bilinear_align_corners(rng):
    x = rng.random((9, 9, 2)).astype(np.float32)
    ours = native.bilinear_resize(x, (18, 20), align_corners=True)
    ref = resize_bilinear_np(x, (18, 20), align_corners=True)
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_residual_matches_numpy(rng):
    lr = rng.random((16, 12, 3)).astype(np.float32)
    lr_norm = (lr - 0.5) / 0.5
    lr_up, res = native.updownup_residual(lr_norm, (48, 36))
    ref_up = resize_bilinear_np(lr_norm, (48, 36))
    ref_down = resize_bilinear_np(ref_up, (16, 12))
    ref_res = ref_up - resize_bilinear_np(ref_down, (48, 36))
    np.testing.assert_allclose(lr_up, ref_up, atol=3e-6)
    np.testing.assert_allclose(res, ref_res, atol=5e-6)


def test_bicubic_matches_matlab(rng):
    x = rng.random((20, 24, 3)).astype(np.float32)
    ours = native.bicubic_resize(x, (10, 12))
    ref = imresize(x.astype(np.float64), output_shape=(10, 12))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    ours_up = native.bicubic_resize(x, (45, 50))
    ref_up = imresize(x.astype(np.float64), output_shape=(45, 50))
    np.testing.assert_allclose(ours_up, ref_up, atol=1e-5)
