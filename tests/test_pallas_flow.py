"""Pallas flow kernels vs the jnp reference implementation (interpret mode
on CPU; the real TPU path is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from bfsr_tpu.ops import pointwise_flow as pwf
from bfsr_tpu.ops.pallas.linf_flow import flow_forward, flow_inverse


def _setup(rng, n_layers=10, n=300):
    params = pwf.init_pointwise_flow(jax.random.PRNGKey(0), n_layers, 1)
    params["w"] = params["w"] + jnp.eye(3)[None]
    params = pwf.cache_inverses(params)
    x = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    info = jnp.asarray((rng.random((n, n_layers * 6)) - 0.5).astype(np.float32))
    return params, x, info


def test_forward_matches_jnp(rng):
    params, x, info = _setup(rng)
    z_ref, _ = pwf.forward(params, x, info)
    z = flow_forward(params, x, info, interpret=True)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-5)


def test_inverse_matches_jnp(rng):
    params, x, info = _setup(rng)
    z_ref, _ = pwf.forward(params, x, info)
    x_ref = pwf.inverse(params, z_ref, info)
    x_pl = flow_inverse(params, z_ref, info, interpret=True)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x), atol=1e-3)


def test_nonmultiple_tile(rng):
    params, x, info = _setup(rng, n_layers=3, n=2048 * 2 + 17)
    z_ref, _ = pwf.forward(params, x, info)
    z = flow_forward(params, x, info, interpret=True)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-5)


def test_pallas_flow_d27_matches_jnp(rng):
    """Generic-d kernels (patch model, d=3*ps^2=27) vs the jnp flow."""
    from bfsr_tpu.ops import pointwise_flow as pwf
    from bfsr_tpu.ops.pallas.linf_flow import flow_forward, flow_inverse

    d, L, n = 27, 4, 300
    params = pwf.init_pointwise_flow(jax.random.PRNGKey(0), L, patch_size=3)
    params = dict(params)
    # random 27x27 layers are ill-conditioned and amplify f32
    # summation-order noise ~16x per layer through the inverse chain;
    # trained checkpoints are well-conditioned — emulate that here
    params["w"] = params["w"] * 0.05 + jnp.eye(d)[None]
    params = pwf.cache_inverses(params)
    x = jnp.asarray(rng.random((n, d)).astype(np.float32))
    info = jnp.asarray((rng.random((n, 2 * d * L)) - 0.5).astype(np.float32))

    z_ref, _ = pwf.forward(params, x, info)
    z = flow_forward(params, x, info, interpret=True)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=2e-5)

    x_ref = pwf.inverse(params, z_ref, info)
    x_inv = flow_inverse(params, z_ref, info, interpret=True)
    np.testing.assert_allclose(np.asarray(x_inv), np.asarray(x_ref), atol=2e-4)
    # roundtrip recovers the input
    np.testing.assert_allclose(np.asarray(x_inv), np.asarray(x), atol=2e-4)
