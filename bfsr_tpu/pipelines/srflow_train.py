"""SRFlow base-model training (mirror of
SRFlow-LP/code/models/SRFlow_model.py:136-170 — the path the reference
ships code for but no train script).

Loss: bits/dim NLL from the flow forward with quantization noise, plus an
optional L1 at heat 0 through the differentiable reverse pass.  The RRDB
conditioning trunk stays frozen until ``train_RRDB_delay * niter`` steps
(SRFlow_model.py:138-142) — implemented as a gradient mask so the whole
step stays one jitted function with a traced step counter.
"""

import jax
import jax.numpy as jnp
import optax


def _rrdb_mask(grads, on):
    """Zero RRDB gradients when `on` is False (traced bool)."""
    factor = jnp.where(on, 1.0, 0.0)
    return {
        "rrdb": jax.tree_util.tree_map(lambda g: g * factor, grads["rrdb"]),
        "flow": grads["flow"],
    }


def make_srflow_train_step(model, optimizer, weight_fl=1.0, weight_l1=0.0,
                           rrdb_unfreeze_step=None, freeze_rrdb=False):
    """Returns jitted step(params, opt_state, batch, key, step_idx) ->
    (params, opt_state, metrics).  batch: {'GT': (B,H,W,3), 'LQ': (B,h,w,3)}.

    ``freeze_rrdb=True`` is the static fast form of the frozen phase: the
    RRDB conditioning is wrapped in stop_gradient so XLA never builds the
    trunk backward (418.8 -> 277.4 ms/step at the reference config,
    profiling/train_freeze_probe.py), instead of computing it and masking
    it to zero.  Param updates are bit-identical to the mask form (Adam on
    zero grads is a no-op); the trainer CLI swaps step functions at the
    unfreeze boundary."""

    def loss_fn(params, batch, key):
        losses = {}
        gt, lq = batch["GT"], batch["LQ"]
        lr_enc = model.preprocess(params, lq)
        if freeze_rrdb:
            lr_enc = jax.tree_util.tree_map(jax.lax.stop_gradient, lr_enc)
        if weight_fl > 0:
            _, nll, _ = model.normal_flow(params, gt, lq, key=key,
                                          add_gt_noise=True, lr_enc=lr_enc,
                                          collect_epses=False)
            losses["nll_loss"] = jnp.mean(nll) * weight_fl
        if weight_l1 > 0:
            z = model.sample_z(key, 0.0, lq.shape[0], lq.shape[1:3])
            sr, _ = model.reverse_flow(params, lq, z=z, eps_std=0.0,
                                       lr_enc=lr_enc, want_logdet=False)
            losses["l1_loss"] = jnp.mean(jnp.abs(sr - gt)) * weight_l1
        total = sum(losses.values())
        return total, losses

    @jax.jit
    def step(params, opt_state, batch, key, step_idx):
        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key
        )
        if freeze_rrdb:
            pass  # rrdb grads are already symbolic zeros via stop_gradient
        elif rrdb_unfreeze_step is not None:
            grads = _rrdb_mask(grads, step_idx >= rrdb_unfreeze_step)
        else:
            grads = _rrdb_mask(grads, jnp.asarray(False))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        mets = dict(losses)
        mets["loss"] = loss
        return params, opt_state, mets

    return step
