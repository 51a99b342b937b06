"""Model-level tests: registry build, shapes, and LINF encode/decode
consistency (flow fwd then inverse with the same zmap reproduces the target
residual)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bfsr_tpu.models  # noqa: F401  (registers everything)
from bfsr_tpu import registry
from bfsr_tpu.utils.coords import make_coord, make_cell


def small_linf(patch=False):
    spec = {
        "name": "linf-patch" if patch else "linf",
        "args": {
            "encoder_spec": {"name": "edsr-baseline",
                             "args": {"n_resblocks": 2, "n_feats": 16, "no_upsampling": True}},
            "imnet_spec": {"name": "flow", "args": {"name": "flow"}},
            "flow_layers": 3,
            "num_layer": 2,
            "hidden_dim": 32,
        },
    }
    return registry.make(spec)


def test_edsr_shapes(rng):
    m = registry.make({"name": "edsr-baseline",
                       "args": {"n_resblocks": 2, "n_feats": 16, "no_upsampling": True}})
    x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    y = m(x)
    assert y.shape == (1, 8, 8, 16)
    assert m.out_dim == 16


def test_rrdb_shapes(rng):
    m = registry.make({"name": "rrdb", "args": {"nb": 2, "nf": 16, "gc": 8}})
    x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    assert m(x).shape == (1, 8, 8, 16)


def test_rdn_shapes(rng):
    m = registry.make({"name": "rdn", "args": {"G0": 16, "RDNconfig": "A",
                                               "no_upsampling": True}})
    # config A truncated is heavy; just check it builds + one tiny forward
    x = jnp.asarray(rng.random((1, 4, 4, 3)).astype(np.float32))
    assert m(x).shape == (1, 4, 4, 16)


def test_linf_roundtrip(rng):
    """query_log_p then query_rgb(zmap=z) must reproduce gt residual + lr_up."""
    m = small_linf().freeze()
    B, h, w, s = 1, 6, 6, 2
    H, W = h * s, w * s
    inp = jnp.asarray(rng.random((B, h, w, 3)).astype(np.float32))
    gt_res = jnp.asarray((rng.random((B, H, W, 3)) - 0.5).astype(np.float32))
    coord = jnp.broadcast_to(make_coord((H, W), flatten=False)[None], (B, H, W, 2))
    cell = jnp.asarray(make_cell((H, W))[None])

    feat = m.gen_feat(m.params, inp)
    log_p, z = m.query_log_p(m.params, inp, feat, coord, cell, gt_res)
    assert z.shape == (B, H, W, 3)
    assert log_p.shape == (B * H * W,)
    assert np.isfinite(np.asarray(log_p)).all()

    pred = m.query_rgb(m.params, inp, feat, coord, cell, zmap=z)
    from bfsr_tpu.ops.interp import grid_sample_bilinear

    lr_up = grid_sample_bilinear(inp, coord, padding_mode="border")
    # random-init flow weights are poorly conditioned; 5e-3 bounds the f32
    # amplification through 4 inverse linear layers
    np.testing.assert_allclose(np.asarray(pred - lr_up), np.asarray(gt_res), atol=5e-3)


def test_linf_patch_shapes(rng):
    m = small_linf(patch=True).freeze()
    B, h, w = 1, 4, 4
    Hq, Wq = 6, 6
    inp = jnp.asarray(rng.random((B, h, w, 3)).astype(np.float32))
    coord = jnp.broadcast_to(make_coord((Hq, Wq), flatten=False)[None], (B, Hq, Wq, 2))
    cell = jnp.asarray(make_cell((Hq * 3, Wq * 3))[None])
    feat = m.gen_feat(m.params, inp)
    pred = m.query_rgb(m.params, inp, feat, coord, cell, temperature=0.0)
    assert pred.shape == (B, Hq * 3, Wq * 3, 3)


def test_unet_prior_shapes(rng):
    m = registry.make({"name": "unet", "args": {"in_chans": 3, "depth": 2, "dim": 16}})
    z = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    lr = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    out = m(z, lr)
    assert out.shape == (2, 16, 16, 3)
    # training mode returns bn stats
    out_t, stats = m.apply(m.params, z, lr, training=True)
    assert out_t.shape == out.shape and len(stats) > 0


def test_edsr_latent_shapes(rng):
    m = registry.make({"name": "edsr-baseline-latent",
                       "args": {"in_chans": 3, "n_resblocks": 2, "dim": 16}})
    z = jnp.asarray(rng.random((1, 12, 12, 3)).astype(np.float32))
    lr = jnp.asarray(rng.random((1, 6, 6, 3)).astype(np.float32))
    assert m(z, lr).shape == (1, 12, 12, 3)


def test_mlp(rng):
    m = registry.make({"name": "mlp", "args": {"in_dim": 4, "out_dim": 2,
                                               "hidden_list": [8]}})
    x = jnp.asarray(rng.random((5, 4)).astype(np.float32))
    assert m(x).shape == (5, 2)


def test_spec_roundtrip():
    m = small_linf()
    spec = m.spec()
    m2 = registry.make(spec, load_params=True)
    a = jax.tree_util.tree_leaves(m.params)
    b = jax.tree_util.tree_leaves(m2.params)
    assert all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))


def test_batch_norm_running_stats_match_torch(rng):
    """torch BatchNorm2d updates running_var with the UNBIASED variance
    (ADVICE r1): one train-mode forward must produce identical running
    stats."""
    import torch

    from bfsr_tpu.ops import nn as fnn

    x = rng.random((4, 6, 5, 8)).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(8, momentum=0.1)
    tbn.train()
    with torch.no_grad():
        ty = tbn(torch.from_numpy(x).permute(0, 3, 1, 2))

    p = {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,)),
         "mean": jnp.zeros((8,)), "var": jnp.ones((8,))}
    y, (mean, var_unb) = fnn.batch_norm(jnp.asarray(x), p, training=True)
    new_mean = 0.9 * p["mean"] + 0.1 * mean
    new_var = 0.9 * p["var"] + 0.1 * var_unb

    np.testing.assert_allclose(np.asarray(y),
                               ty.permute(0, 2, 3, 1).numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_mean),
                               tbn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_var),
                               tbn.running_var.numpy(), atol=1e-6)


def test_rrdb_b2s_trunk_matches_plain(rng, monkeypatch):
    """The batch-to-space trunk (multi-image small-extent training gate,
    late r5) must be BIT-exact vs the per-image scan: rings are re-zeroed
    before every conv, so the mosaic-plane convs see exactly the SAME-pad
    neighborhoods.  Covers trunk features, per-block taps, the fea_up*
    pyramid, AND grads (the unfrozen trainer differentiates through the
    taps)."""
    from bfsr_tpu.models.rrdb import init_rrdb, rrdb_apply_steps, rrdb_encode

    params = init_rrdb(jax.random.PRNGKey(3), nf=16, nb=2, gc=8, scale=4,
                       upsampling=True)
    x = jnp.asarray(rng.random((5, 9, 10, 3)).astype(np.float32))

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("BFSR_RRDB_B2S", flag)
        enc = rrdb_encode(params, x)
        steps = rrdb_apply_steps(params, x, scale=4, block_idxs=(0, 1),
                                 fea_up0=True)

        def loss(p):
            r = rrdb_apply_steps(p, x, scale=4, block_idxs=(1,))
            return (jnp.sum(r["last_lr_fea"] ** 2)
                    + jnp.sum(r["block_1"] ** 2))

        g = jax.grad(loss)(params)
        outs[flag] = (enc, steps, g)

    enc0, steps0, g0 = outs["0"]
    enc1, steps1, g1 = outs["1"]
    np.testing.assert_array_equal(np.asarray(enc0), np.asarray(enc1))
    for k in steps0:
        np.testing.assert_array_equal(np.asarray(steps0[k]),
                                      np.asarray(steps1[k]), err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
