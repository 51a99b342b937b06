"""Explicit shard_map collectives on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from bfsr_tpu.parallel.collective import distributed_mean, distributed_psnr
from bfsr_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_distributed_mean(rng):
    mesh = make_mesh({"dp": 8})
    v = rng.random(64).astype(np.float32)
    vs = jax.device_put(jnp.asarray(v), NamedSharding(mesh, P("dp")))
    out = distributed_mean(mesh, vs)
    np.testing.assert_allclose(float(out), v.mean(), rtol=1e-6)


def test_distributed_psnr(rng):
    mesh = make_mesh({"dp": 8})
    se = rng.random(32).astype(np.float32)
    n = np.full(32, 100.0, np.float32)
    ses = jax.device_put(jnp.asarray(se), NamedSharding(mesh, P("dp")))
    ns = jax.device_put(jnp.asarray(n), NamedSharding(mesh, P("dp")))
    out = distributed_psnr(mesh, ses, ns)
    expected = -10 * np.log10(se.sum() / n.sum())
    np.testing.assert_allclose(float(out), expected, rtol=1e-5)
