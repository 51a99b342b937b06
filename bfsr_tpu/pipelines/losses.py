"""Loss functions (reference: SRFlow-LP/code/models/modules/loss.py — the
flow path uses NLL + L1; CharbonnierLoss backs the plain-SR SRModel;
GANLoss/GradientPenaltyLoss back the (unused-by-the-flow-configs) GAN
path, loss.py:35-90)."""

import jax
import jax.numpy as jnp


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def charbonnier_loss(pred, target, eps=1e-6):
    """sum(sqrt(diff^2 + eps)) robust L1 — a SUM over all elements with
    eps added UN-squared, exactly the reference CharbonnierLoss
    (loss.py:21-31)."""
    diff = pred - target
    return jnp.sum(jnp.sqrt(diff * diff + eps))


def nll_bits_per_dim(objective, pixels):
    """-(logdet + base logp) / (log 2 * pixels) (SRFlowNet_arch.py:112)."""
    return -objective / (jnp.log(2.0) * pixels)


def gan_loss(gan_type, logits, target_is_real, real_label_val=1.0,
             fake_label_val=0.0):
    """GANLoss (loss.py:35-67): 'gan'/'ragan' = BCE-with-logits against the
    constant label, 'lsgan' = MSE, 'wgan-gp' = -+mean(logits).

    ``target_is_real`` is a python bool (static branch, like the torch
    module's boolean target)."""
    gan_type = gan_type.lower()
    if gan_type == "wgan-gp":
        m = jnp.mean(logits)
        return -m if target_is_real else m
    label = real_label_val if target_is_real else fake_label_val
    if gan_type in ("gan", "ragan"):
        # BCEWithLogitsLoss: mean(max(x,0) - x*z + log(1+exp(-|x|)))
        x = logits
        return jnp.mean(jnp.maximum(x, 0.0) - x * label
                        + jnp.log1p(jnp.exp(-jnp.abs(x))))
    if gan_type == "lsgan":
        return jnp.mean((logits - label) ** 2)
    raise NotImplementedError(f"GAN type [{gan_type}] is not found")


def gradient_penalty_loss(critic_fn, interp):
    """GradientPenaltyLoss (loss.py:70-90): mean((||d critic/d interp||_2
    per-sample - 1)^2).  ``critic_fn(interp) -> (B, ...)`` critic scores;
    grad_outputs of all-ones == grad of the summed critic output."""
    grads = jax.grad(lambda x: jnp.sum(critic_fn(x)))(interp)
    norms = jnp.sqrt(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=1))
    return jnp.mean((norms - 1.0) ** 2)
