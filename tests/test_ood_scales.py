"""Arbitrary/OOD scale factors through the full predictor (6x/8x/non-integer
grids) — the coordinate pipeline must hold for any regular grid."""

import jax.numpy as jnp
import numpy as np
import pytest

import bfsr_tpu.models  # noqa: F401
from bfsr_tpu.pipelines.linf_eval import LINFPredictor
from bfsr_tpu.utils.coords import make_coord_np, make_cell

from test_pipelines import small_linf


@pytest.mark.parametrize("H,W", [(36, 42), (48, 48), (21, 33)])
def test_predictor_arbitrary_grid(rng, H, W):
    """HR grid sizes not tied to an integer scale of the LR input."""
    m = small_linf()
    inp = jnp.asarray(rng.random((1, 6, 7, 3)).astype(np.float32))
    coord = jnp.asarray(make_coord_np((H, W), flatten=False)[None])
    cell = jnp.asarray(make_cell((H, W))[None])
    for use_pallas in (False, True):
        pred = LINFPredictor(m, None, tile_queries=512,
                             use_pallas=use_pallas).predict(
            m.params, None, inp, coord, cell)
        assert pred.shape == (1, H, W, 3)
        assert np.isfinite(np.asarray(pred)).all()


def test_pallas_matches_jnp_at_ood_scale(rng):
    m = small_linf()
    inp = jnp.asarray(rng.random((1, 5, 5, 3)).astype(np.float32))
    H = W = 40  # 8x
    coord = jnp.asarray(make_coord_np((H, W), flatten=False)[None])
    cell = jnp.asarray(make_cell((H, W))[None])
    a = LINFPredictor(m, None, tile_queries=512, use_pallas=False).predict(
        m.params, None, inp, coord, cell)
    b = LINFPredictor(m, None, tile_queries=512, use_pallas=True).predict(
        m.params, None, inp, coord, cell)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
