"""SRFlow-LP latent-module (prior) training.

The reference ships the SRFlow learned-prior EVAL path only — training of
the latent module is "coming soon" (SRFlow-LP/README.md:11).  This trainer
closes that gap by transplanting the LINF-LP latent-module recipe
(LINF-LP/train.py:89-163) onto the SRFlow stack, with the shipped eval
contract (SRFlow-LP/code/test.py:134-148) as the data path:

* frozen SRFlow encode (``add_gt_noise=False``) of the bilinear x4
  LR-upsample -> epses, per-pixel channel standardization
  (test.py:142-145) — exactly what the eval pipeline feeds the prior;
* two-branch UNet prior forward (batch-stat BN) on the standardized epses;
* eps-space L1 against the frozen encode of GT — the latent target that
  decodes exactly back to GT by flow invertibility — mirroring LINF's
  latent loss (LINF-LP/train.py:124-141);
* optional image-space L1 through the differentiable flow reverse at heat 0
  (the LINF recipe's image/perceptual-loss slot, LINF-LP/train.py:147-152;
  our frozen flow's cached ``W^-1`` makes this backward a plain matmul
  chain instead of the reference's ``torch.inverse`` chains).

The pre-trained flow is never touched: gradients are taken only wrt the
prior params, and the RRDB conditioning + per-step ft caches are computed
once per batch under ``stop_gradient`` and shared across both encodes and
the decode (the reference eval recomputes the conditioning convs inside
every coupling call).
"""

import jax
import jax.numpy as jnp
import optax

from bfsr_tpu.models.srflow import flow_upsampler as fup
from bfsr_tpu.models.srflow.srflow_net import standardize_epses
from bfsr_tpu.models.unet import apply_bn_updates
from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.ops.interp import resize_bilinear
from bfsr_tpu.pipelines.losses import l1_loss as l1


def make_srflow_prior_train_step(model, prior_model, optimizer,
                                 eps_weight=1.0, image_weight=0.0):
    """Returns jitted step(prior_params, opt_state, srflow_params, batch)
    -> (prior_params, opt_state, metrics).

    batch: {'GT': (B, H, W, 3), 'LQ': (B, H/scale, W/scale, 3)} in [0, 1];
    GT spatial dims must be divisible by 2^L (training crops are 160).
    """
    scale = model.scale
    if eps_weight <= 0 and image_weight <= 0:
        raise ValueError("at least one of eps_weight/image_weight must be > 0")

    def loss_fn(prior_params, srflow_params, batch):
        gt, lq = batch["GT"], batch["LQ"]
        h, w = lq.shape[1], lq.shape[2]
        lr_up = resize_bilinear(lq, (h * scale, w * scale))

        # frozen-flow work, shared by both encodes and the decode; the
        # stop_gradients keep XLA from building any flow/RRDB backward
        # (the freeze_rrdb pattern in srflow_train.py)
        lr_enc = jax.tree_util.tree_map(
            jax.lax.stop_gradient, model.preprocess(srflow_params, lq))
        ft_cache = jax.tree_util.tree_map(
            jax.lax.stop_gradient,
            fup.precompute_ft(srflow_params["flow"], model.plan,
                              model._conds(lr_enc), lvl1_s2d=False))

        epses_lr, _, _ = model.normal_flow(
            srflow_params, lr_up, lq, add_gt_noise=False, lr_enc=lr_enc,
            ft_cache=ft_cache, want_logdet=False)
        eps_in = [jax.lax.stop_gradient(e) for e in standardize_epses(epses_lr)]

        # stage scope: BFSR_PRECISION=mixed trains the prior in bf16 (fwd
        # and the transposed backward inherit it), like the LINF trainer
        with fnn.stage("prior"):
            learned, bn_stats = prior_model.apply(prior_params, eps_in,
                                                  training=True)

        losses = {}
        if eps_weight > 0:
            epses_gt, _, _ = model.normal_flow(
                srflow_params, gt, lq, add_gt_noise=False, lr_enc=lr_enc,
                ft_cache=ft_cache, want_logdet=False)
            # one L1 over all branch elements (eps0 has 16x the pixels of
            # the final z at 1/16 the channels: equal per-element weight)
            num = sum(jnp.sum(jnp.abs(lz - jax.lax.stop_gradient(tz)))
                      for lz, tz in zip(learned, epses_gt))
            den = sum(lz.size for lz in learned)
            losses["eps_l"] = num / den * eps_weight
        if image_weight > 0:
            sr, _ = model.reverse_flow(
                srflow_params, lq, epses=learned, add_gt_noise=False,
                lr_enc=lr_enc, ft_cache=ft_cache, want_logdet=False)
            losses["img_l"] = l1(sr, gt) * image_weight
        total = sum(losses.values())
        return total, (bn_stats, losses)

    @jax.jit
    def step(prior_params, opt_state, srflow_params, batch):
        (loss, (bn_stats, mets)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(prior_params, srflow_params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, prior_params)
        prior_params = optax.apply_updates(prior_params, updates)
        prior_params = apply_bn_updates(prior_params, bn_stats)
        mets = dict(mets)
        mets["loss"] = loss
        return prior_params, opt_state, mets

    return step
