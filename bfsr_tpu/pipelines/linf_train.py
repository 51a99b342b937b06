"""LINF-LP latent-module training (mirror of LINF-LP/train.py:89-172).

One jitted train step: frozen LINF encode (gen_feat + query_log_p on the
LR-upsample residual), trainable prior UNet forward (batch-stat BN), flow
inverse with gradients flowing through the learned latent, VGG perceptual
L1 + latent L1, Adam on the prior only.  Optionally sharded over a device
mesh (data parallel) — see bfsr_tpu.parallel.

The reference backs through ``torch.linalg.solve`` chains per step
(flow.py:120); our frozen flow uses cached inverses so the backward is a
plain matmul chain.
"""

import jax
import jax.numpy as jnp
import optax

from bfsr_tpu.models.unet import apply_bn_updates
from bfsr_tpu.pipelines.losses import l1_loss as l1


def make_train_step(linf_model, prior_model, vgg_model, optimizer,
                    vgg_weight=1.0, latent_weight=0.0, data_norm=None,
                    patch=False, grid_encode=None):
    """Returns jitted step(prior_params, opt_state, linf_params, vgg_params,
    batch) -> (prior_params, opt_state, metrics).

    grid_encode: use the separable-grid info fast path for the FROZEN
    encodes (query_log_p_grid — both encode targets sit under
    stop_gradient, so the non-differentiable fast form is legal).  None
    (auto) enables it for pixel models on rank-4 coord batches — the
    -fast wrappers' grids and their contiguous crops are always
    separable; pass False for exotic non-separable rank-4 query sets."""
    dn = data_norm or {"inp": {"sub": [0.5], "div": [0.5]},
                       "gt": {"sub": [0.5], "div": [0.5]}}
    inp_sub = jnp.asarray(dn["inp"]["sub"], jnp.float32)
    inp_div = jnp.asarray(dn["inp"]["div"], jnp.float32)
    gt_sub = jnp.asarray(dn["gt"]["sub"], jnp.float32)
    gt_div = jnp.asarray(dn["gt"]["div"], jnp.float32)

    def loss_fn(prior_params, linf_params, vgg_params, batch, key=None):
        inp = (batch["inp"] - inp_sub) / inp_div
        feat = jax.lax.stop_gradient(linf_model.gen_feat(linf_params, inp))
        coord, cell = batch["coord"], batch["cell"]

        use_grid = grid_encode
        if use_grid is None:
            use_grid = not patch and coord.ndim == 4
        encode = (linf_model.query_log_p_grid if use_grid
                  else linf_model.query_log_p)

        gt_key = "gt_lr_up"
        _, z_lr = encode(linf_params, inp, feat, coord, cell, batch[gt_key])
        z_lr = jax.lax.stop_gradient(z_lr)

        # key: stochastic-depth RNG for priors that use it (swin_latent's
        # reference drop_path_rate=0.1 decay rule); BN priors ignore it.
        # stage scope: BFSR_PRECISION=mixed trains the prior in bf16
        # (fwd AND the transposed backward ops inherit the precision) —
        # measured convergence-equivalent, profiling/train_curve.py
        from bfsr_tpu.ops import nn as fnn

        with fnn.stage("prior"):
            z_learned, bn_stats = prior_model.apply(prior_params, z_lr, inp,
                                                    training=True, key=key)

        latent_l = jnp.float32(0.0)
        if latent_weight > 0:
            tgt = batch["gt_patch"] if patch else batch["gt_pixel"]
            _, z_hr = encode(linf_params, inp, feat, coord, cell, tgt)
            latent_l = l1(z_learned, jax.lax.stop_gradient(z_hr))

        vgg_l = jnp.float32(0.0)
        if vgg_weight > 0:
            pred = linf_model.query_rgb(linf_params, inp, feat, coord, cell,
                                        zmap=z_learned)
            if patch:
                from bfsr_tpu.ops.interp import grid_sample_bilinear

                lr_up = grid_sample_bilinear(inp, batch["interpolate_coord"],
                                             padding_mode="border")
                pred = pred + lr_up
            pred01 = jnp.clip(pred * gt_div + gt_sub, 0.0, 1.0)
            f_pred = vgg_model.apply(vgg_params, pred01)
            f_gt = vgg_model.apply(vgg_params, batch["gt"])
            vgg_l = l1(f_pred, jax.lax.stop_gradient(f_gt))

        loss = vgg_l * vgg_weight + latent_l * latent_weight
        return loss, (bn_stats, {"vgg_l": vgg_l, "latent_l": latent_l})

    @jax.jit
    def step(prior_params, opt_state, linf_params, vgg_params, batch,
             key=None):
        (loss, (bn_stats, mets)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(prior_params, linf_params, vgg_params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, prior_params)
        prior_params = optax.apply_updates(prior_params, updates)
        prior_params = apply_bn_updates(prior_params, bn_stats)
        mets = dict(mets)
        mets["loss"] = loss
        return prior_params, opt_state, mets

    return step
