"""Plain-SR (Charbonnier) training path + x8 self-ensemble."""

import numpy as np
import jax.numpy as jnp
import optax

import bfsr_tpu.models  # noqa: F401
from bfsr_tpu import registry
from bfsr_tpu.pipelines.sr_train import make_sr_train_step
from bfsr_tpu.pipelines.sr_train import test_x8 as x8_ensemble


def test_sr_train_step(rng):
    m = registry.make({"name": "rrdb", "args": {"nf": 8, "nb": 1, "gc": 4,
                                                "no_upsampling": False}})
    opt = optax.adam(1e-4)
    state = opt.init(m.params)
    step = make_sr_train_step(m, opt)
    batch = {"LQ": jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32)),
             "GT": jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))}
    p0 = np.asarray(m.params["conv_first"]["w"]).copy()
    params, state, mets = step(m.params, state, batch)
    assert np.isfinite(float(mets["loss"]))
    assert not np.allclose(p0, np.asarray(params["conv_first"]["w"]))


def test_x8_ensemble_shapes(rng):
    m = registry.make({"name": "edsr-baseline",
                       "args": {"n_resblocks": 1, "n_feats": 8, "scale": 2,
                                "no_upsampling": False}})
    lq = jnp.asarray(rng.random((1, 6, 6, 3)).astype(np.float32))
    out = x8_ensemble(m, m.params, lq)
    assert out.shape == (1, 12, 12, 3)
    assert np.isfinite(np.asarray(out)).all()
