"""Unit tests for glow-style flow primitives: invertibility, log-det
correctness (vs autodiff Jacobians), and torch-layout channel ordering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bfsr_tpu.ops import flows
from bfsr_tpu.ops.flows import (
    actnorm,
    actnorm_init_stats,
    invconv1x1,
    invconv_cache,
    squeeze2d,
    unsqueeze2d,
    split_feature,
    gaussian_logp,
    cond_affine,
    init_cond_affine,
    split2d,
    init_split2d,
)


def key(i=0):
    return jax.random.PRNGKey(i)


def test_actnorm_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 4, 4, 6)).astype(np.float32))
    p = {"bias": jnp.asarray(rng.random(6).astype(np.float32)),
         "logs": jnp.asarray((rng.random(6) - 0.5).astype(np.float32))}
    ld0 = jnp.zeros((2,))
    y, ld = actnorm(x, p, ld0)
    x2, ld2 = actnorm(y, p, ld, reverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld2), 0.0, atol=1e-4)


def test_actnorm_logdet():
    x = jnp.ones((1, 3, 5, 2))
    p = {"bias": jnp.zeros(2), "logs": jnp.asarray([0.5, -0.25])}
    _, ld = actnorm(x, p, jnp.zeros((1,)))
    np.testing.assert_allclose(np.asarray(ld), 0.25 * 15, atol=1e-5)


def test_actnorm_init_whitens(rng):
    x = jnp.asarray((rng.random((4, 8, 8, 3)) * 5 + 2).astype(np.float32))
    p = actnorm_init_stats(x)
    y, _ = actnorm(x, p, None)
    np.testing.assert_allclose(np.asarray(jnp.mean(y, axis=(0, 1, 2))), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.std(y, axis=(0, 1, 2))), 1.0, atol=1e-3)


def test_invconv_roundtrip_and_logdet(rng):
    c = 8
    w = np.linalg.qr(rng.normal(size=(c, c)))[0].astype(np.float32) * 1.3
    p = invconv_cache(w)
    x = jnp.asarray(rng.random((2, 4, 4, c)).astype(np.float32))
    y, ld = invconv1x1(x, p, jnp.zeros((2,)))
    x2, ld2 = invconv1x1(y, p, ld, reverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld2), 0.0, atol=1e-3)
    expected = np.linalg.slogdet(w.astype(np.float64))[1] * 16
    np.testing.assert_allclose(np.asarray(ld)[0], expected, rtol=1e-5)


def test_invconv_uncached_matches_cached(rng):
    c = 4
    w = rng.normal(size=(c, c)).astype(np.float32) + np.eye(c, dtype=np.float32) * 2
    x = jnp.asarray(rng.random((1, 2, 2, c)).astype(np.float32))
    y1, ld1 = invconv1x1(x, {"w": jnp.asarray(w)}, jnp.zeros((1,)))
    y2, ld2 = invconv1x1(x, invconv_cache(w), jnp.zeros((1,)))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2), rtol=1e-4)


def test_squeeze_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.random((2, 3, 4, 6)).astype(np.float32)  # NCHW
    t = torch.from_numpy(x)
    # torch-side oracle (flow.py:122-135 semantics)
    B, C, H, W = t.shape
    ref = (
        t.view(B, C, H // 2, 2, W // 2, 2).permute(0, 1, 3, 5, 2, 4).contiguous()
        .view(B, C * 4, H // 2, W // 2).numpy()
    )
    ours = np.asarray(squeeze2d(jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), ref, atol=0)


def test_squeeze_unsqueeze_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 8, 6, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(unsqueeze2d(squeeze2d(x))), np.asarray(x), atol=0)


def test_split_feature_cross():
    h = jnp.arange(8).reshape(1, 1, 1, 8)
    a, b = split_feature(h, "cross")
    np.testing.assert_array_equal(np.asarray(a)[0, 0, 0], [0, 2, 4, 6])
    np.testing.assert_array_equal(np.asarray(b)[0, 0, 0], [1, 3, 5, 7])


def test_gaussian_logp_standard(rng):
    x = jnp.asarray(rng.normal(size=(2, 3, 3, 4)).astype(np.float32))
    lp = gaussian_logp(x)
    expected = np.sum(-0.5 * (np.asarray(x) ** 2 + np.log(2 * np.pi)), axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(lp), expected, rtol=1e-5)


def test_cond_affine_roundtrip(rng):
    c, c_cond = 12, 10
    p = init_cond_affine(key(1), c, c_cond, hidden=16)
    # nonzero last conv so the coupling actually does something
    p["fFeatures"]["out"]["w"] = jax.random.normal(key(2), p["fFeatures"]["out"]["w"].shape) * 0.1
    p["fAffine"]["out"]["w"] = jax.random.normal(key(3), p["fAffine"]["out"]["w"].shape) * 0.1
    x = jnp.asarray(rng.random((2, 4, 4, c)).astype(np.float32))
    ft = jnp.asarray(rng.random((2, 4, 4, c_cond)).astype(np.float32))
    y, ld = cond_affine(x, ft, p, jnp.zeros((2,)))
    x2, ld2 = cond_affine(y, ft, p, ld, reverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld2), 0.0, atol=1e-3)


def test_cond_affine_logdet_vs_autodiff(rng):
    """log-det of d(out)/d(in) via explicit jacobian on a tiny shape."""
    c, c_cond = 4, 3
    p = init_cond_affine(key(4), c, c_cond, hidden=8)
    p["fFeatures"]["out"]["w"] = jax.random.normal(key(5), p["fFeatures"]["out"]["w"].shape) * 0.2
    p["fAffine"]["out"]["w"] = jax.random.normal(key(6), p["fAffine"]["out"]["w"].shape) * 0.2
    x = jnp.asarray(rng.random((1, 1, 1, c)).astype(np.float32))
    ft = jnp.asarray(rng.random((1, 1, 1, c_cond)).astype(np.float32))

    def f(flat):
        y, _ = cond_affine(flat.reshape(1, 1, 1, c), ft, p, None)
        return y.reshape(-1)

    jac = jax.jacfwd(f)(x.reshape(-1))
    expected = np.linalg.slogdet(np.asarray(jac, dtype=np.float64))[1]
    _, ld = cond_affine(x, ft, p, jnp.zeros((1,)))
    np.testing.assert_allclose(np.asarray(ld)[0], expected, rtol=1e-4, atol=1e-4)


def test_split2d_roundtrip(rng):
    c, c_cond = 12, 6
    p = init_split2d(key(7), c, cond_channels=c_cond)
    p["conv"]["w"] = jax.random.normal(key(8), p["conv"]["w"].shape) * 0.1
    x = jnp.asarray(rng.random((2, 4, 4, c)).astype(np.float32))
    ft = jnp.asarray(rng.random((2, 4, 4, c_cond)).astype(np.float32))
    z1, ld, eps = split2d(x, p, jnp.zeros((2,)), ft=ft)
    assert z1.shape == (2, 4, 4, 6) and eps.shape == (2, 4, 4, 6)
    x2, ld2, _ = split2d(z1, p, ld, ft=ft, reverse=True, eps=eps)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld2), 0.0, atol=1e-3)


def test_cond_affine_cache_batched_matches_per_step(rng):
    """One-pass per-level cache == per-step cond_affine_cache."""
    c, c_cond, n = 12, 10, 3
    ps = []
    for s in range(n):
        p = init_cond_affine(key(20 + s), c, c_cond, hidden=8)
        # randomize the zero-init out conv so scale/shift are non-trivial
        p["fFeatures"]["out"]["w"] = jax.random.normal(
            key(30 + s), p["fFeatures"]["out"]["w"].shape) * 0.1
        p["fFeatures"]["out"]["b"] = jax.random.normal(
            key(40 + s), p["fFeatures"]["out"]["b"].shape) * 0.1
        p["fFeatures"]["out"]["logs"] = jax.random.normal(
            key(50 + s), p["fFeatures"]["out"]["logs"].shape) * 0.1
        ps.append(p)
    ft = jnp.asarray(rng.random((2, 6, 5, c_cond)).astype(np.float32))
    got = flows.cond_affine_cache_batched(ft, ps)
    for s in range(n):
        want = flows.cond_affine_cache(ft, ps[s])
        for k in ("scale_ft", "shift_ft", "aff1_ft"):
            np.testing.assert_allclose(np.asarray(got[s][k]),
                                       np.asarray(want[k]),
                                       atol=1e-5, rtol=1e-5, err_msg=f"{s}/{k}")


def test_cond_affine_cache_nearest_matches_reference(rng):
    """Phase-domain level-1 cache (base-resolution convs + exact ring
    patch) == the straightforward cache over the materialized 2x cond."""
    from bfsr_tpu.ops import flows_s2d as fs2d
    from bfsr_tpu.ops import nn as fnn
    from bfsr_tpu.ops.interp import resize_nearest

    c_base, c_stack, n = 6, 10, 3
    h, w = 5, 4
    base = jnp.asarray(rng.random((1, h, w, c_base)).astype(np.float32))
    stack = jnp.asarray(rng.random((1, h, w, c_stack)).astype(np.float32))
    upconv = {
        "w": jnp.asarray((rng.random((3, 3, c_base, c_base)) - 0.5).astype(np.float32)),
        "b": jnp.asarray(rng.random(c_base).astype(np.float32)),
    }
    c, c_cond = 12, c_base + c_stack
    ps = []
    for s in range(n):
        p = init_cond_affine(key(60 + s), c, c_cond, hidden=8)
        p["fFeatures"]["out"]["w"] = jax.random.normal(
            key(70 + s), p["fFeatures"]["out"]["w"].shape) * 0.1
        p["fFeatures"]["out"]["logs"] = jax.random.normal(
            key(80 + s), p["fFeatures"]["out"]["logs"].shape) * 0.1
        ps.append(p)

    fea_up2 = fnn.conv2d(resize_nearest(base, (2 * h, 2 * w)), upconv)
    cond = jnp.concatenate(
        [fea_up2, resize_nearest(stack, (2 * h, 2 * w))], -1)
    want = [fs2d.cache_to_s2d(c_)
            for c_ in flows.cond_affine_cache_batched(cond, ps)]
    got = fs2d.cond_affine_cache_batched_nearest(base, stack, upconv, ps)
    for s in range(n):
        for k in ("scale_ft", "shift_ft", "aff1_ft"):
            np.testing.assert_allclose(np.asarray(got[s][k]),
                                       np.asarray(want[s][k]),
                                       atol=2e-5, rtol=1e-4,
                                       err_msg=f"{s}/{k}")
