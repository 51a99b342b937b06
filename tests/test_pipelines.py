"""Pipeline tests: tiled jitted predictor equals direct query; train step
updates the prior and stays finite."""

import jax
import jax.numpy as jnp
import numpy as np

import bfsr_tpu.models  # noqa: F401
from bfsr_tpu import registry
from bfsr_tpu.pipelines.linf_eval import LINFPredictor
from bfsr_tpu.pipelines.linf_train import make_train_step
from bfsr_tpu.train.optim import make_optimizer
from bfsr_tpu.utils.coords import make_coord_np, make_cell


def small_linf():
    m = registry.make({
        "name": "linf",
        "args": {
            "encoder_spec": {"name": "edsr-baseline",
                             "args": {"n_resblocks": 2, "n_feats": 16,
                                      "no_upsampling": True}},
            "imnet_spec": {"name": "flow", "args": {"name": "flow"}},
            "flow_layers": 3, "num_layer": 2, "hidden_dim": 32,
        },
    })
    # condition the random flow weights so inverse chains don't amplify
    # f32 noise (trained checkpoints are well-conditioned)
    m.params["imnet"]["w"] = m.params["imnet"]["w"] + jnp.eye(3)[None]
    return m.freeze()


def _setup(rng, h=6, w=7, s=2):
    m = small_linf()
    H, W = h * s, w * s
    inp = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))
    coord = jnp.asarray(make_coord_np((H, W), flatten=False)[None])
    cell = jnp.asarray(make_cell((H, W))[None])
    return m, inp, coord, cell, H, W


def test_tiled_predictor_matches_direct(rng):
    m, inp, coord, cell, H, W = _setup(rng)
    pred_direct = m.query_rgb(
        m.params, inp, m.gen_feat(m.params, inp), coord, cell, temperature=0.0
    )
    pred_tiled = LINFPredictor(m, tile_queries=16).predict(
        m.params, None, inp, coord, cell
    )
    np.testing.assert_allclose(np.asarray(pred_tiled), np.asarray(pred_direct),
                               atol=1e-5)


def test_tiled_predictor_with_prior(rng):
    m, inp, coord, cell, H, W = _setup(rng)
    prior = registry.make({"name": "unet", "args": {"in_chans": 3, "depth": 2,
                                                    "dim": 16}})
    gt_lr_up = jnp.asarray((rng.random((1, H, W, 3)) - 0.5).astype(np.float32))
    pred = LINFPredictor(m, prior, tile_queries=32).predict(
        m.params, prior.params, inp, coord, cell, gt_lr_up
    )
    assert pred.shape == (1, H, W, 3)
    assert np.isfinite(np.asarray(pred)).all()

    # reference semantics: z through the prior then invert
    feat = m.gen_feat(m.params, inp)
    _, z = m.query_log_p(m.params, inp, feat, coord, cell, gt_lr_up)
    z_learned = prior(z, inp)
    pred_direct = m.query_rgb(m.params, inp, feat, coord, cell, zmap=z_learned)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred_direct), atol=1e-4)


def test_train_step(rng):
    m, inp, coord, cell, H, W = _setup(rng, h=6, w=6)
    prior = registry.make({"name": "unet", "args": {"in_chans": 3, "depth": 2,
                                                    "dim": 16}})
    vgg = registry.make({"name": "VGGFeatureExtractor", "args": {"feature_layer": 8}})
    optimizer = make_optimizer({"name": "adam", "args": {"lr": 1e-3}})
    opt_state = optimizer.init(prior.params)
    step = make_train_step(m, prior, vgg, optimizer, vgg_weight=1.0,
                           latent_weight=0.5)
    batch = {
        "inp": jnp.asarray(rng.random((2, 6, 6, 3)).astype(np.float32)),
        "coord": jnp.broadcast_to(jnp.asarray(make_coord_np((12, 12), flatten=False))[None],
                                  (2, 12, 12, 2)),
        "cell": jnp.broadcast_to(jnp.asarray(make_cell((12, 12)))[None], (2, 2)),
        "gt": jnp.asarray(rng.random((2, 12, 12, 3)).astype(np.float32)),
        "gt_lr_up": jnp.asarray((rng.random((2, 12, 12, 3)) - 0.5).astype(np.float32)),
        "gt_pixel": jnp.asarray((rng.random((2, 12, 12, 3)) - 0.5).astype(np.float32)),
    }
    p0 = jax.tree_util.tree_leaves(prior.params)[0].copy()
    new_params, opt_state, mets = step(prior.params, opt_state, m.params,
                                       vgg.params, batch)
    assert np.isfinite(float(mets["loss"]))
    assert float(mets["vgg_l"]) > 0
    p1 = jax.tree_util.tree_leaves(new_params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_train_step_grid_encode_matches_gather():
    """The separable-grid frozen-encode fast path (late r5) must match the
    gather path bit-for-tolerance on exactly the coord sets the trainers
    see: a full make_coord grid AND a contiguous crop of one (the -fast
    wrappers crop an LR-sized query window out of the HR grid —
    separability survives cropping).  Compares per-step metrics and
    updated prior params between grid_encode=True and =False."""
    rng = np.random.default_rng(7)
    m = small_linf()
    prior = registry.make({"name": "unet", "args": {
        "in_chans": 3, "depth": 2, "dim": 8, "bilinear": True}})
    optimizer = make_optimizer({"name": "adam", "args": {"lr": 1e-3}})

    full = np.asarray(make_coord_np((16, 16), flatten=False))
    crop = full[3:11, 5:13]  # contiguous window: still separable
    for grid in (full[:8, :8], crop):
        coord = jnp.broadcast_to(jnp.asarray(grid)[None], (2, 8, 8, 2))
        batch = {
            "inp": jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32)),
            "coord": coord,
            "cell": jnp.broadcast_to(jnp.asarray(make_cell((16, 16)))[None],
                                     (2, 2)),
            "gt": jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32)),
            "gt_lr_up": jnp.asarray(
                (rng.random((2, 8, 8, 3)) - 0.5).astype(np.float32)),
            "gt_pixel": jnp.asarray(
                (rng.random((2, 8, 8, 3)) - 0.5).astype(np.float32)),
        }
        outs = {}
        for name, flag in (("grid", True), ("gather", False)):
            step = make_train_step(m, prior, None, optimizer,
                                   vgg_weight=0.0, latent_weight=1.0,
                                   grid_encode=flag)
            ps, _, mets = step(prior.params, optimizer.init(prior.params),
                               m.params, {}, batch)
            outs[name] = (ps, mets)
        np.testing.assert_allclose(float(outs["grid"][1]["latent_l"]),
                                   float(outs["gather"][1]["latent_l"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(outs["grid"][0]),
                        jax.tree_util.tree_leaves(outs["gather"][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
