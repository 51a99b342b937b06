"""MATLAB imresize parity.

Oracle: the vendored public matlab_imresize implementation in the reference
mount, imported read-only when available (skipped otherwise)."""

import importlib.util
import os

import numpy as np
import pytest

from bfsr_tpu.ops.imresize import imresize, imresize_weights, imresize_jnp

_REF = "/root/reference/LINF-LP/imresize.py"


def _load_ref():
    if not os.path.isfile(_REF):
        pytest.skip("reference imresize not available")
    spec = importlib.util.spec_from_file_location("ref_imresize", _REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("scale", [0.25, 0.5, 2.0, 3.7, 1 / 3])
def test_imresize_float_matches_reference(rng, scale):
    ref = _load_ref()
    img = rng.random((24, 17, 3))
    ours = imresize(img, scale=scale)
    theirs = ref.imresize(img, scalar_scale=scale)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_imresize_uint8_matches_reference(rng):
    ref = _load_ref()
    img = (rng.random((20, 20)) * 255).astype(np.uint8)
    ours = imresize(img, scale=0.5)
    theirs = ref.imresize(img, scalar_scale=0.5)
    np.testing.assert_array_equal(ours, theirs)


def test_imresize_output_shape_matches_reference(rng):
    ref = _load_ref()
    img = rng.random((30, 22, 3))
    ours = imresize(img, output_shape=(13, 9))
    theirs = ref.imresize(img, output_shape=(13, 9))
    assert ours.shape == theirs.shape == (13, 9, 3)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_imresize_bilinear_matches_reference(rng):
    ref = _load_ref()
    img = rng.random((16, 16, 3))
    ours = imresize(img, scale=2.0, method="bilinear")
    theirs = ref.imresize(img, scalar_scale=2.0, method="bilinear")
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_imresize_jnp_matches_host(rng):
    img = rng.random((12, 10, 3)).astype(np.float32)
    per_axis, order = imresize_weights(img.shape[:2], (30, 25))
    dev = np.asarray(imresize_jnp(img, per_axis, order))
    host = imresize(img.astype(np.float64), output_shape=(30, 25))
    np.testing.assert_allclose(dev, host, atol=1e-4)
