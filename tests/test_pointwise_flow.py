"""LINF pointwise flow: invertibility, log-prob correctness, cache parity."""

import jax
import jax.numpy as jnp
import numpy as np

from bfsr_tpu.ops.pointwise_flow import (
    init_pointwise_flow,
    cache_inverses,
    forward,
    inverse,
)


def _setup(rng, n_layers=4, ps=1, n=16):
    d = 3 * ps * ps
    params = init_pointwise_flow(jax.random.PRNGKey(0), n_layers, ps)
    # make weights safely invertible
    params["w"] = params["w"] + jnp.eye(d)[None] * 1.5
    x = jnp.asarray(rng.random((n, d)).astype(np.float32))
    info = jnp.asarray((rng.random((n, n_layers * 2 * d)) - 0.5).astype(np.float32))
    return params, x, info


def test_roundtrip(rng):
    params, x, info = _setup(rng)
    params = cache_inverses(params)
    z, _ = forward(params, x, info)
    x2 = inverse(params, z, info)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)


def test_roundtrip_patch(rng):
    params, x, info = _setup(rng, n_layers=3, ps=3, n=8)
    params = cache_inverses(params)
    z, _ = forward(params, x, info)
    x2 = inverse(params, z, info)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=5e-3)


def test_cached_matches_uncached(rng):
    params, x, info = _setup(rng)
    z1, lp1 = forward(params, x, info)
    z2, lp2 = forward(cache_inverses(params), x, info)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2), rtol=1e-5)
    x1 = inverse(params, z1, info)
    x2 = inverse(cache_inverses(params), z1, info)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-4)


def test_logp_vs_autodiff(rng):
    """log_p = log|det J| + log N(z): check against explicit jacobian."""
    params, x, info = _setup(rng, n_layers=2, n=3)

    def f(v, inf):
        z, _ = forward(params, v[None], inf[None])
        return z[0]

    for i in range(3):
        jac = jax.jacfwd(lambda v: f(v, info[i]))(x[i])
        logabsdet = np.linalg.slogdet(np.asarray(jac, np.float64))[1]
        z, lp = forward(params, x[i][None], info[i][None])
        base = np.sum(-0.5 * (np.asarray(z[0], np.float64) ** 2 + np.log(2 * np.pi)))
        np.testing.assert_allclose(np.asarray(lp)[0], logabsdet + base, rtol=1e-4, atol=1e-4)


def test_forward_jits(rng):
    params, x, info = _setup(rng)
    fwd = jax.jit(forward)
    z, lp = fwd(params, x, info)
    assert z.shape == x.shape and lp.shape == (x.shape[0],)
