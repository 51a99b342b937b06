"""Fused s2d-Pallas UNet inference path vs the XLA reference apply."""

import jax
import jax.numpy as jnp
import numpy as np

from bfsr_tpu.models.unet import init_unet, unet_apply, unet_apply_fused
from bfsr_tpu.ops.pallas.s2d_conv import (conv3x3_s2d, s2d_weight,
                                          space_to_depth, depth_to_space,
                                          maxpool2x2_from_s2d)
from bfsr_tpu.ops import nn as fnn


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.random((1, 8, 10, 5)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))),
                                  np.asarray(x))


def test_conv3x3_s2d_matches_xla(rng):
    x = jnp.asarray(rng.random((1, 12, 16, 6)).astype(np.float32))
    w = jnp.asarray((rng.random((3, 3, 6, 8)) - 0.5).astype(np.float32))
    b = jnp.asarray(rng.random(8).astype(np.float32))
    ref = fnn.conv2d(x, {"w": w, "b": b},
                     precision=jax.lax.Precision.HIGHEST)
    out = conv3x3_s2d([space_to_depth(x)], s2d_weight(w), bias=b,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(depth_to_space(out)),
                               np.asarray(ref), atol=3e-5)


def test_conv3x3_s2d_multi_input_concat(rng):
    """Implicit concat across input blocks == conv of the real concat."""
    a = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    b = jnp.asarray(rng.random((1, 8, 8, 5)).astype(np.float32))
    w = jnp.asarray((rng.random((3, 3, 8, 4)) - 0.5).astype(np.float32))
    ref = fnn.conv2d(jnp.concatenate([a, b], -1), {"w": w},
                     precision=jax.lax.Precision.HIGHEST)
    out = conv3x3_s2d([space_to_depth(a), space_to_depth(b)],
                      s2d_weight(w, cin_split=[3, 5]), act=None,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(depth_to_space(out)),
                               np.asarray(ref), atol=3e-5)


def test_maxpool_from_s2d(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 4)).astype(np.float32))
    ref = fnn.max_pool2d(x, 2)
    out = maxpool2x2_from_s2d(space_to_depth(x), 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)


def test_unet_apply_fused_parity(rng):
    params = init_unet(jax.random.PRNGKey(0), 3, depth=3, dim=8, bilinear=True)
    z = jnp.asarray(rng.random((1, 16, 24, 3)).astype(np.float32))
    lr = jnp.asarray(rng.random((1, 8, 12, 3)).astype(np.float32))
    ref = unet_apply(params, z, lr, depth=3)
    out = unet_apply_fused(params, z, lr, depth=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)
