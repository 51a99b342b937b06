"""GANLoss / GradientPenaltyLoss formula parity vs the reference torch
modules (SRFlow-LP/code/models/modules/loss.py:35-90)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from bfsr_tpu.pipelines.losses import gan_loss, gradient_penalty_loss  # noqa: E402


def _ref_losses():
    sys.path.insert(0, "/root/reference/SRFlow-LP/code/models/modules")
    try:
        import loss as ref_loss
    finally:
        sys.path.pop(0)
    return ref_loss


@pytest.mark.parametrize("gan_type", ["gan", "ragan", "lsgan", "wgan-gp"])
@pytest.mark.parametrize("target_is_real", [True, False])
def test_gan_loss_parity(gan_type, target_is_real, rng):
    ref_loss = _ref_losses()
    logits = (rng.random((4, 1, 6, 6)) * 4 - 2).astype(np.float32)
    crit = ref_loss.GANLoss(gan_type, real_label_val=1.0, fake_label_val=0.0)
    with torch.no_grad():
        ref = float(crit(torch.from_numpy(logits), target_is_real))
    ours = float(gan_loss(gan_type, jnp.asarray(logits), target_is_real))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_charbonnier_parity(rng):
    """Pure SUM over elements, eps added un-squared (loss.py:21-31) —
    reduction semantics matter: reference lrs are tuned against the sum."""
    from bfsr_tpu.pipelines.losses import charbonnier_loss

    ref_loss = _ref_losses()
    a = rng.random((3, 8, 8, 3)).astype(np.float32)
    b = rng.random((3, 8, 8, 3)).astype(np.float32)
    crit = ref_loss.CharbonnierLoss()
    with torch.no_grad():
        ref = float(crit(torch.from_numpy(a), torch.from_numpy(b)))
    ours = float(charbonnier_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_gan_loss_unknown_type():
    with pytest.raises(NotImplementedError):
        gan_loss("hinge", jnp.zeros((2,)), True)


def test_gradient_penalty_parity(rng):
    ref_loss = _ref_losses()
    w = rng.random((1, 3, 3, 3)).astype(np.float32)
    interp = rng.random((4, 3, 8, 8)).astype(np.float32)

    t_interp = torch.from_numpy(interp).requires_grad_(True)
    t_w = torch.from_numpy(w)
    t_crit = torch.nn.functional.conv2d(t_interp ** 2, t_w)
    gp = ref_loss.GradientPenaltyLoss()
    ref = float(gp(t_interp, t_crit))

    # our critic takes NHWC
    wj = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))

    def critic(x):
        return jax.lax.conv_general_dilated(
            x ** 2, wj, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ours = float(gradient_penalty_loss(
        critic, jnp.asarray(np.transpose(interp, (0, 2, 3, 1)))))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)
