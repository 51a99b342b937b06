"""Pallas channel-major predictor path equals the jnp path (interpret mode
on CPU)."""

import jax.numpy as jnp
import numpy as np

import bfsr_tpu.models  # noqa: F401
from bfsr_tpu import registry
from bfsr_tpu.pipelines.linf_eval import LINFPredictor
from bfsr_tpu.utils.coords import make_coord_np, make_cell

from test_pipelines import small_linf


def test_pallas_predictor_matches_jnp(rng):
    m = small_linf()
    h, w, s = 5, 6, 2
    H, W = h * s, w * s
    inp = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))
    coord = jnp.asarray(make_coord_np((H, W), flatten=False)[None])
    cell = jnp.asarray(make_cell((H, W))[None])
    prior = registry.make({"name": "unet", "args": {"in_chans": 3, "depth": 2,
                                                    "dim": 16}})
    gt_lr_up = jnp.asarray((rng.random((1, H, W, 3)) - 0.5).astype(np.float32))

    ref = LINFPredictor(m, prior, tile_queries=32, use_pallas=False).predict(
        m.params, prior.params, inp, coord, cell, gt_lr_up)
    pal = LINFPredictor(m, prior, tile_queries=32, use_pallas=True).predict(
        m.params, prior.params, inp, coord, cell, gt_lr_up)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=2e-4)


def test_pallas_predictor_zero_temp(rng):
    m = small_linf()
    h, w, s = 4, 4, 3
    H, W = h * s, w * s
    inp = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))
    coord = jnp.asarray(make_coord_np((H, W), flatten=False)[None])
    cell = jnp.asarray(make_cell((H, W))[None])
    ref = LINFPredictor(m, None, tile_queries=24, use_pallas=False).predict(
        m.params, None, inp, coord, cell)
    pal = LINFPredictor(m, None, tile_queries=24, use_pallas=True).predict(
        m.params, None, inp, coord, cell)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=2e-4)


def test_pallas_predictor_patch_matches_jnp(rng):
    """d=27 (ps=3) fused path: generic-d flow kernels + wide-info kernel +
    fold, vs the jnp tile-scan path."""
    import jax

    m = registry.make({
        "name": "linf-patch",
        "args": {
            "encoder_spec": {"name": "edsr-baseline",
                             "args": {"n_resblocks": 2, "n_feats": 16,
                                      "no_upsampling": True}},
            "imnet_spec": {"name": "flow", "args": {"name": "flow"}},
            "flow_layers": 3, "num_layer": 2, "hidden_dim": 32,
            "patch_size": 3,
        },
    })
    m.params["imnet"]["w"] = m.params["imnet"]["w"] * 0.05 + jnp.eye(27)[None]
    m.freeze()
    prior = registry.make({"name": "unet", "args": {"in_chans": 27, "depth": 2,
                                                    "dim": 16}})
    h, w, s = 5, 6, 2
    Hq, Wq = h * s, w * s  # patch-center query grid
    inp = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))
    coord = jnp.asarray(make_coord_np((Hq, Wq), flatten=False)[None])
    cell = jnp.asarray(make_cell((Hq * 3, Wq * 3))[None])
    gt_lr_up = jnp.asarray((rng.random((1, Hq, Wq, 27)) - 0.5).astype(np.float32))

    ref = LINFPredictor(m, prior, tile_queries=32, use_pallas=False).predict(
        m.params, prior.params, inp, coord, cell, gt_lr_up)
    pal = LINFPredictor(m, prior, tile_queries=32, use_pallas=True).predict(
        m.params, prior.params, inp, coord, cell, gt_lr_up)
    assert ref.shape == (1, Hq * 3, Wq * 3, 3)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=5e-4)
