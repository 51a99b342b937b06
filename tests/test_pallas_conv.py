"""Pallas conv3x3 vs lax.conv (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.ops.pallas.conv3x3 import conv3x3_fused, fold_bn


def test_conv3x3_matches_xla(rng):
    x = jnp.asarray(rng.random((1, 16, 12, 8)).astype(np.float32))
    w = jnp.asarray((rng.random((3, 3, 8, 16)) - 0.5).astype(np.float32))
    ref = fnn.conv2d(x, {"w": w})
    out = conv3x3_fused(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_conv3x3_fused_bn_lrelu(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray((rng.random((3, 3, 4, 8)) - 0.5).astype(np.float32))
    bn = {"scale": jnp.asarray(rng.random(8).astype(np.float32) + 0.5),
          "bias": jnp.asarray(rng.random(8).astype(np.float32)),
          "mean": jnp.asarray(rng.random(8).astype(np.float32)),
          "var": jnp.asarray(rng.random(8).astype(np.float32) + 0.5)}
    ref = fnn.batch_norm(fnn.conv2d(x, {"w": w}), bn)
    ref = fnn.leaky_relu(ref)
    s, b = fold_bn({"w": w}, bn)
    out = conv3x3_fused(x, w, scale=s, bias=b, act="lrelu", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_conv3x3_with_conv_bias(rng):
    x = jnp.asarray(rng.random((1, 10, 6, 3)).astype(np.float32))
    w = jnp.asarray((rng.random((3, 3, 3, 4)) - 0.5).astype(np.float32))
    b = jnp.asarray(rng.random(4).astype(np.float32))
    ref = fnn.conv2d(x, {"w": w, "b": b})
    out = conv3x3_fused(x, w, bias=b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_rrdb_s2d_trunk_matches_jnp(rng):
    """The space-to-depth Pallas RRDB trunk (SRFlow conditioning fast path)
    == the plain jnp trunk, including block taps."""
    from bfsr_tpu.models.rrdb import init_rrdb, rrdb_apply_steps

    params = init_rrdb(jax.random.PRNGKey(3), nf=8, nb=2, gc=4, scale=4,
                       upsampling=True)
    x = jnp.asarray(rng.random((1, 8, 6, 3)).astype(np.float32))
    ref = rrdb_apply_steps(params, x, scale=4, block_idxs=(0, 1), fea_up0=True,
                           fast=False)
    got = rrdb_apply_steps(params, x, scale=4, block_idxs=(0, 1), fea_up0=True,
                           interpret=True)
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=3e-5, rtol=1e-4, err_msg=k)


def test_conv3x3_s2d_unaligned_width(rng):
    """Widths with no 8-multiple divisor (DIV2K: 2040 -> s2d 1020) must
    pad-and-crop instead of picking an illegal Mosaic block (the bug made
    full-size images crash on hardware)."""
    import jax
    import jax.numpy as jnp
    from bfsr_tpu.ops.pallas import s2d_conv as s2d

    x = jnp.asarray(rng.random((1, 12, 2040, 8)).astype(np.float32))
    xs = s2d.space_to_depth(x)
    w = jnp.asarray((rng.random((3, 3, 8, 32)) - 0.5).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    out = s2d.conv3x3_s2d([xs], s2d.s2d_weight(w), interpret=True)
    got = s2d.depth_to_space(out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    # prepadded (3-D kernel-layout) inputs take the same pad path
    out2 = s2d.conv3x3_s2d([s2d.prepad(xs)], s2d.s2d_weight(w), interpret=True)
    np.testing.assert_allclose(np.asarray(s2d.depth_to_space(out2)),
                               np.asarray(ref), atol=1e-4)


def test_conv3x3_s2d_h_only(rng):
    """H-only (1x2) s2d domain: the Cout=64 UNet convs run with a 2x MAC
    trade instead of the full 2x2 domain's 4x.  Same conv, new phase map
    + layouts; includes a multi-block implicit concat and the
    non-8-multiple single-tile width that used to fault the DMA engine
    (Ws=84 at the 204x168 eval extent)."""
    import jax
    import jax.numpy as jnp
    from bfsr_tpu.ops.pallas import s2d_conv as s2d

    for (H, W) in [(16, 12), (204, 168), (12, 168)]:
        x = jnp.asarray(rng.random((1, H, W, 5)).astype(np.float32))
        y = jnp.asarray(rng.random((1, H, W, 3)).astype(np.float32))
        w = jnp.asarray((rng.random((3, 3, 8, 7)) - 0.5).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            jnp.concatenate([x, y], -1), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        out = s2d.conv3x3_s2d(
            [s2d.space_to_depth_h(x), s2d.space_to_depth_h(y)],
            s2d.s2d_weight(w, cin_split=[5, 3], factors=(2, 1)),
            phases=2, interpret=True)
        got = s2d.depth_to_space_h(out)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, err_msg=f"{H}x{W}")
    # layout round-trips
    np.testing.assert_array_equal(
        np.asarray(s2d.depth_to_space_h(s2d.space_to_depth_h(x))),
        np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(s2d.full_to_h_s2d(s2d.space_to_depth(x))),
        np.asarray(s2d.space_to_depth_h(x)))
    # maxpool from the h-only form == maxpool of the original
    from bfsr_tpu.ops import nn as fnn
    np.testing.assert_array_equal(
        np.asarray(s2d.maxpool2x2_from_s2d_h(s2d.space_to_depth_h(x), 5)),
        np.asarray(fnn.max_pool2d(x, 2)))


def test_edsr_fused_matches_xla(rng):
    """H-only s2d EDSR trunk == the XLA form (3-pass bf16 == HIGH)."""
    import jax.numpy as jnp
    from bfsr_tpu import registry
    import bfsr_tpu.models  # noqa: F401

    enc = registry.make({"name": "edsr-baseline",
                         "args": {"n_resblocks": 3, "n_feats": 16,
                                  "no_upsampling": True}})
    x = jnp.asarray(rng.random((1, 20, 14, 3)).astype(np.float32))
    ref = enc.apply(enc.params, x, fused=False)
    got = enc.apply(enc.params, x, fused=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_edsr_fused_is_differentiable(rng):
    """jax.grad through the fused path works (custom_vjp routes the
    backward through the XLA form, since pallas_call has no VJP rule)
    and matches the XLA path's grads."""
    import jax
    import jax.numpy as jnp
    from bfsr_tpu import registry
    import bfsr_tpu.models  # noqa: F401

    enc = registry.make({"name": "edsr-baseline",
                         "args": {"n_resblocks": 2, "n_feats": 8,
                                  "no_upsampling": True}})
    x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))

    def loss(p, fused):
        return jnp.sum(enc.apply(p, x, fused=fused) ** 2)

    g_fused = jax.grad(lambda p: loss(p, True))(enc.params)
    g_xla = jax.grad(lambda p: loss(p, False))(enc.params)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_xla)):
        # the fused forward differs from XLA by ~3e-5 (3-pass bf16
        # rounding), which rides into the cotangent
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-4)

