"""Convergence tests: each of the three training loops must demonstrably
LEARN (round-2 verdict Missing #1), not just step without NaNs.

Design: synthetic tasks with a known learnable optimum.  GT images are the
bilinear upsample of a smooth LR field plus a FIXED high-frequency pattern;
the trainable parts must learn to reproduce the pattern.  Each test asserts
(a) the loss falls by a large factor over a few hundred steps and (b) a
post-training eval metric beats both the init-parameter model and the
no-learning baseline, on held-out images from the same family.

Reference training paths being proven:
* LINF latent module, VGG + latent L1 (LINF-LP/train.py:89-163)
* SRFlow NLL (SRFlow-LP/code/models/SRFlow_model.py:136-170)
* SRModel pixel criterion (SRFlow-LP/code/models/SR_model.py:58-99)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

import bfsr_tpu.models  # noqa: F401
from bfsr_tpu import registry
from bfsr_tpu.ops.interp import grid_sample_bilinear
from bfsr_tpu.utils.coords import make_coord_np, make_cell

from test_pipelines import small_linf


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return -10.0 * np.log10(mse + 1e-12)


def _smooth_lr(rng, n, h, w):
    """Smooth LR fields in [0.25, 0.75]: bilinear blow-up of coarse noise."""
    from bfsr_tpu.data.wrappers import resize_bilinear_np

    coarse = rng.random((n, max(2, h // 3), max(2, w // 3), 3)).astype(np.float32)
    out = np.stack([resize_bilinear_np(c, (h, w)) for c in coarse])
    return (0.25 + 0.5 * out).astype(np.float32)


def _checker(H, W, period=2):
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pat = (((yy // period) + (xx // period)) % 2).astype(np.float32) * 2.0 - 1.0
    return pat[..., None] * np.asarray([1.0, -0.5, 0.25], np.float32)


# ---------------------------------------------------------------------------
# 1. LINF latent-module training (VGG + latent loss)
# ---------------------------------------------------------------------------

def _linf_batch(lr01, coord_np, cell_np, pattern, amp=0.15):
    """Build a self-consistent LINF train batch: gt = lr_up + amp*pattern in
    the normalized domain; gt_pixel/gt_lr_up follow the wrapper conventions
    (data/wrappers.py:_residuals; reference wrappers.py:132-134, 383-398)."""
    from bfsr_tpu.data.wrappers import resize_bilinear_np

    B = lr01.shape[0]
    H, W = coord_np.shape[:2]
    inp_norm = jnp.asarray((lr01 - 0.5) / 0.5)
    coord = jnp.broadcast_to(jnp.asarray(coord_np)[None], (B, H, W, 2))
    # the model adds back grid_sample_bilinear(inp_norm, coord) — use the
    # same operator so gt_pixel is exactly the flow's target residual
    lr_up = np.asarray(grid_sample_bilinear(inp_norm, coord, padding_mode="border"))
    delta = np.broadcast_to(amp * pattern, lr_up.shape).astype(np.float32)
    gt_norm = lr_up + delta
    gt01 = np.clip(gt_norm * 0.5 + 0.5, 0.0, 1.0)
    gt_lr_up = np.empty_like(lr_up)
    for b in range(B):
        down = resize_bilinear_np(lr_up[b], lr01.shape[1:3])
        gt_lr_up[b] = lr_up[b] - resize_bilinear_np(down, (H, W))
    return {
        "inp": jnp.asarray(lr01),
        "coord": coord,
        "cell": jnp.broadcast_to(jnp.asarray(cell_np)[None], (B, 2)),
        "gt": jnp.asarray(gt01),
        "gt_pixel": jnp.asarray(delta),
        "gt_lr_up": jnp.asarray(gt_lr_up),
    }, gt_norm


def test_linf_latent_training_learns(rng):
    from bfsr_tpu.pipelines.linf_train import make_train_step

    h = w = 8
    s = 2
    H, W = h * s, w * s
    m = small_linf()
    prior = registry.make({"name": "unet", "args": {"in_chans": 3, "depth": 2,
                                                    "dim": 16}})
    vgg = registry.make({"name": "VGGFeatureExtractor", "args": {"feature_layer": 3}})
    optimizer = optax.adam(2e-3)
    opt_state = optimizer.init(prior.params)
    step = make_train_step(m, prior, vgg, optimizer, vgg_weight=1.0,
                           latent_weight=1.0)

    coord_np = make_coord_np((H, W), flatten=False)
    cell_np = make_cell((H, W))
    pattern = _checker(H, W)
    train_lr = _smooth_lr(rng, 4, h, w)
    batch, _ = _linf_batch(train_lr, coord_np, cell_np, pattern)

    params = prior.params
    losses = []
    for i in range(300):
        params, opt_state, mets = step(params, opt_state, m.params, vgg.params,
                                       batch)
        losses.append(float(mets["loss"]))
    init_loss = np.mean(losses[:5])
    final_loss = np.mean(losses[-10:])
    assert np.isfinite(final_loss)
    assert final_loss < 0.25 * init_loss, (init_loss, final_loss)

    # held-out eval: learned-prior PSNR must beat (a) the no-prior inversion
    # of z_lr and (b) the INIT prior parameters
    eval_lr = _smooth_lr(np.random.default_rng(123), 2, h, w)
    ebatch, egt_norm = _linf_batch(eval_lr, coord_np, cell_np, pattern)
    inp_norm = (ebatch["inp"] - 0.5) / 0.5
    feat = m.gen_feat(m.params, inp_norm)
    _, z_lr = m.query_log_p(m.params, inp_norm, feat, ebatch["coord"],
                            ebatch["cell"], ebatch["gt_lr_up"])

    def psnr_with(prior_params):
        z = prior.apply(prior_params, z_lr, inp_norm, training=False)
        if isinstance(z, tuple):
            z = z[0]
        pred = m.query_rgb(m.params, inp_norm, feat, ebatch["coord"],
                           ebatch["cell"], zmap=z)
        return _psnr(pred, egt_norm)

    pred_noprior = m.query_rgb(m.params, inp_norm, feat, ebatch["coord"],
                               ebatch["cell"], zmap=z_lr)
    psnr_noprior = _psnr(pred_noprior, egt_norm)
    psnr_init = psnr_with(prior.params)
    psnr_trained = psnr_with(params)
    assert psnr_trained > psnr_noprior + 1.0, (psnr_trained, psnr_noprior)
    assert psnr_trained > psnr_init + 1.0, (psnr_trained, psnr_init)


# ---------------------------------------------------------------------------
# 2. SRFlow NLL training
# ---------------------------------------------------------------------------

def test_srflow_nll_training_learns(rng):
    from bfsr_tpu.pipelines.srflow_train import make_srflow_train_step

    m = registry.make({"name": "srflow",
                       "args": {"nf": 8, "nb": 2, "gc": 4, "K": 2, "L": 3,
                                "hidden_channels": 8, "stack_blocks": (0, 1)}})
    optimizer = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(1e-3))
    opt_state = optimizer.init(m.params)
    step = make_srflow_train_step(m, optimizer, weight_fl=1.0,
                                  rrdb_unfreeze_step=0)

    from bfsr_tpu.data.wrappers import resize_bilinear_np

    def make_pair(g, n):
        lq = _smooth_lr(g, n, 4, 4)
        up = np.stack([resize_bilinear_np(x, (16, 16)) for x in lq])
        gt = np.clip(up + 0.1 * _checker(16, 16), 0.0, 1.0).astype(np.float32)
        return {"GT": jnp.asarray(gt), "LQ": jnp.asarray(lq)}

    batch = make_pair(rng, 4)
    params = m.params
    nlls = []
    key = jax.random.PRNGKey(0)
    for i in range(250):
        key, sub = jax.random.split(key)
        params, opt_state, mets = step(params, opt_state, batch, sub,
                                       jnp.asarray(i))
        nlls.append(float(mets["loss"]))
    init_nll = np.mean(nlls[:5])
    final_nll = np.mean(nlls[-10:])
    assert np.isfinite(final_nll)
    # bits/dim must fall substantially (quantization noise bounds the floor)
    assert final_nll < init_nll - 1.0, (init_nll, final_nll)

    # held-out: heat-0 decode with trained params beats the init params
    ebatch = make_pair(np.random.default_rng(7), 2)
    z0 = m.sample_z(None, 0.0, 2, (4, 4))

    def heat0_psnr(p):
        sr, _ = m.reverse_flow(p, ebatch["LQ"], z=z0, eps_std=0.0,
                               key=jax.random.PRNGKey(1))
        return _psnr(np.clip(np.asarray(sr), 0, 1), ebatch["GT"])

    psnr_trained = heat0_psnr(params)
    psnr_init = heat0_psnr(m.params)
    assert psnr_trained > psnr_init + 1.0, (psnr_trained, psnr_init)

    # held-out NLL also improves (generalization, not just memorization)
    _, nll_tr, _ = m.normal_flow(params, ebatch["GT"], ebatch["LQ"],
                                 key=jax.random.PRNGKey(9), add_gt_noise=True)
    _, nll_in, _ = m.normal_flow(m.params, ebatch["GT"], ebatch["LQ"],
                                 key=jax.random.PRNGKey(9), add_gt_noise=True)
    assert float(jnp.mean(nll_tr)) < float(jnp.mean(nll_in)) - 1.0


# ---------------------------------------------------------------------------
# 3. SRModel pixel-criterion training
# ---------------------------------------------------------------------------

def test_sr_model_training_learns(rng):
    from bfsr_tpu.pipelines.sr_train import make_sr_train_step

    model = registry.make({"name": "rrdb",
                           "args": {"nf": 8, "nb": 2, "gc": 4,
                                    "no_upsampling": False}})
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(model.params)
    step = make_sr_train_step(model, optimizer, pixel_criterion="l1")

    from bfsr_tpu.data.wrappers import resize_bilinear_np

    def make_pair(g, n):
        lq = _smooth_lr(g, n, 4, 4)
        up = np.stack([resize_bilinear_np(x, (16, 16)) for x in lq])
        gt = np.clip(up + 0.1 * _checker(16, 16), 0.0, 1.0).astype(np.float32)
        return {"GT": jnp.asarray(gt), "LQ": jnp.asarray(lq)}

    batch = make_pair(rng, 4)
    params = model.params
    losses = []
    for _ in range(200):
        params, opt_state, mets = step(params, opt_state, batch)
        losses.append(float(mets["loss"]))
    init_loss = np.mean(losses[:5])
    final_loss = np.mean(losses[-10:])
    assert final_loss < 0.25 * init_loss, (init_loss, final_loss)

    ebatch = make_pair(np.random.default_rng(11), 2)
    sr_trained = model.apply(params, ebatch["LQ"])
    sr_init = model.apply(model.params, ebatch["LQ"])
    p_tr = _psnr(np.clip(np.asarray(sr_trained), 0, 1), ebatch["GT"])
    p_in = _psnr(np.clip(np.asarray(sr_init), 0, 1), ebatch["GT"])
    assert p_tr > p_in + 3.0, (p_tr, p_in)


# ---------------------------------------------------------------------------
# 4. SRFlow-LP latent-module (prior) training — the trainer the reference
#    ships only as "coming soon" (SRFlow-LP/README.md:11)
# ---------------------------------------------------------------------------

def test_srflow_prior_training_learns(rng):
    from bfsr_tpu.models.srflow.srflow_net import standardize_epses
    from bfsr_tpu.pipelines.srflow_prior_train import (
        make_srflow_prior_train_step,
    )

    m = registry.make({"name": "srflow",
                       "args": {"nf": 8, "nb": 2, "gc": 4, "K": 2, "L": 3,
                                "hidden_channels": 8, "stack_blocks": (0, 1)}})
    prior = registry.make({"name": "srflow-unet", "args": {"depth": 2,
                                                           "dim": 16}})

    from bfsr_tpu.data.wrappers import resize_bilinear_np

    def make_pair(g, n):
        """GT = bilinear blow-up of LR + a FIXED high-frequency pattern the
        prior must learn to synthesize (in eps space)."""
        lq = _smooth_lr(g, n, 8, 8)
        up = np.stack([resize_bilinear_np(x, (32, 32)) for x in lq])
        gt = np.clip(up + 0.18 * _checker(32, 32), 0.0, 1.0).astype(np.float32)
        return {"GT": jnp.asarray(gt), "LQ": jnp.asarray(lq)}

    batch = make_pair(rng, 4)
    # data-dependent actnorm init, as the reference does on the first
    # training batch: a TRAINED flow's epses are ~N(0,1) per channel, which
    # is what makes the eval contract's per-pixel standardization
    # near-lossless — priming puts the random-init flow in the same regime
    m.params = m.prime_actnorms(m.params, batch["GT"], batch["LQ"])
    m.freeze()
    optimizer = optax.adam(2e-3)
    opt_state = optimizer.init(prior.params)
    step = make_srflow_prior_train_step(m, prior, optimizer, eps_weight=1.0,
                                        image_weight=2.0)
    params = prior.params
    losses = []
    for _ in range(700):
        # FRESH pairs every step: the prior must learn the RULE (synthesize
        # the fixed pattern in eps space on top of an unstandardized
        # reconstruction of its input), not memorize a fixed batch — with a
        # fixed 4-image batch it memorizes (train 34.7 dB) and actively
        # hurts held-out decodes (17.5 dB)
        batch = make_pair(rng, 4)
        params, opt_state, mets = step(params, opt_state, m.params, batch)
        losses.append(float(mets["loss"]))
    init_loss = np.mean(losses[:5])
    final_loss = np.mean(losses[-10:])
    assert np.isfinite(final_loss)
    assert final_loss < 0.5 * init_loss, (init_loss, final_loss)

    # held-out eval via the EVAL contract (srflow_eval._impl data path):
    # encode lr_up -> standardize -> prior -> decode.  The learned prior
    # must beat (a) the no-prior decode of the raw lr_up epses — which by
    # flow invertibility reproduces lr_up itself — and (b) the init prior.
    ebatch = make_pair(np.random.default_rng(29), 2)
    from bfsr_tpu.ops.interp import resize_bilinear

    lq, gt = ebatch["LQ"], ebatch["GT"]
    lr_up = resize_bilinear(lq, (32, 32))
    epses_lr, _, _ = m.normal_flow(m.params, lr_up, lq, add_gt_noise=False,
                                   want_logdet=False)
    eps_in = standardize_epses(epses_lr)

    def decode_psnr(epses):
        sr, _ = m.reverse_flow(m.params, lq, epses=epses, add_gt_noise=False,
                               want_logdet=False)
        return _psnr(np.clip(np.asarray(sr), 0, 1), gt)

    psnr_noprior = decode_psnr(epses_lr)
    psnr_init = decode_psnr(prior.apply(prior.params, eps_in))
    psnr_trained = decode_psnr(prior.apply(params, eps_in))
    assert psnr_trained > psnr_noprior + 2.0, (psnr_trained, psnr_noprior)
    assert psnr_trained > psnr_init + 2.0, (psnr_trained, psnr_init)
