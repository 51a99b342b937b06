"""Loss functions (reference: SRFlow-LP/code/models/modules/loss.py — the
flow path uses NLL + L1; CharbonnierLoss backs the plain-SR SRModel; the
GAN losses are dead code in the reference and intentionally omitted)."""

import jax.numpy as jnp


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def charbonnier_loss(pred, target, eps=1e-6):
    """sqrt(diff^2 + eps^2) robust L1 (loss.py CharbonnierLoss; the
    reference uses eps=1e-6 under the sqrt)."""
    diff = pred - target
    return jnp.sum(jnp.sqrt(diff * diff + eps))


def nll_bits_per_dim(objective, pixels):
    """-(logdet + base logp) / (log 2 * pixels) (SRFlowNet_arch.py:112)."""
    return -objective / (jnp.log(2.0) * pixels)
