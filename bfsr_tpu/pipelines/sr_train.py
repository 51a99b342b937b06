"""Plain (non-flow) SR model training — the reference's SRModel path
(SRFlow-LP/code/models/SR_model.py, F13): an upsampling generator (RRDB/EDSR
with tails) trained with a pixel criterion ('l1' | 'l2' | 'cb', SR_model.py:
58-67), plus the x8 self-ensemble eval (SR_model.py test_x8)."""

import jax
import jax.numpy as jnp
import optax

from bfsr_tpu.pipelines.losses import charbonnier_loss, l1_loss, l2_loss


def make_sr_train_step(model, optimizer, pixel_criterion="cb", pixel_weight=1.0):
    """step(params, opt_state, batch) for batch {'LQ','GT'} (B,h,w,3)/(B,H,W,3).

    Criterion semantics match the torch modules the reference wires up:
    'l1' = nn.L1Loss (mean), 'l2' = nn.MSELoss (mean), 'cb' =
    CharbonnierLoss — a pure SUM over elements (loss.py:21-31), NOT
    normalized: torch backward of the sum gives gradients that scale with
    element count, and reference configs tune lr against that."""
    if pixel_criterion == "l1":
        crit = l1_loss
    elif pixel_criterion == "l2":
        crit = l2_loss
    elif pixel_criterion == "cb":
        crit = charbonnier_loss
    else:
        raise NotImplementedError(
            f"Loss type [{pixel_criterion}] is not recognized.")

    def loss_fn(params, batch):
        sr = model.apply(params, batch["LQ"])
        return pixel_weight * crit(sr, batch["GT"])

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss}

    return step


def test_x8(model, params, lq):
    """Geometric self-ensemble (SR_model.py test_x8): average the model over
    the 8 flip/transpose symmetries."""
    def tf(x, op):
        if op == "v":
            return x[:, :, ::-1]
        if op == "h":
            return x[:, ::-1]
        if op == "t":
            return x.transpose(0, 2, 1, 3)
        return x

    outs = []
    for ops in ([], ["v"], ["h"], ["t"], ["v", "h"], ["v", "t"], ["h", "t"],
                ["v", "h", "t"]):
        x = lq
        for op in ops:
            x = tf(x, op)
        y = model.apply(params, x)
        for op in reversed(ops):
            y = tf(y, op)
        outs.append(y)
    return sum(outs) / len(outs)
