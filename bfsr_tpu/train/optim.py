"""Optimizers and LR schedules (optax), matching the reference semantics.

* ``make_optimizer`` mirrors LINF-LP/utils.py:94-102 ('sgd'|'adam' specs).
* ``multi_step_lr`` mirrors torch MultiStepLR (gamma ** #milestones-passed),
  stepped per *epoch* in the LINF trainer (train.py:226-227).
* ``multi_step_restart`` / ``cosine_restart`` mirror
  SRFlow-LP/code/models/lr_scheduler.py for the SRFlow training path.
"""

import math

import jax.numpy as jnp
import optax


def multi_step_lr(base_lr, milestones, gamma=0.5):
    """Epoch-indexed schedule: lr = base * gamma^(#milestones <= epoch-1).

    torch steps the scheduler after each epoch; epoch here is 0-based count
    of completed epochs.
    """
    milestones = sorted(milestones)

    def schedule(count):
        count = jnp.asarray(count)
        n = sum(jnp.where(count >= m, 1, 0) for m in milestones)
        return base_lr * (gamma ** n)

    return schedule


def multi_step_restart(base_lr, milestones, gamma=0.5, restarts=(), restart_weights=()):
    """MultiStepLR_Restart (lr_scheduler.py:24-50), iteration-indexed."""
    milestones = sorted(milestones)
    restarts = list(restarts)
    weights = list(restart_weights)

    def schedule(step):
        step = jnp.asarray(step)
        lr = base_lr
        for r, w in zip(restarts, weights):
            lr = jnp.where(step == r, base_lr * w, lr)
        n = sum(jnp.where(step >= m, 1, 0) for m in milestones)
        return base_lr * (gamma ** n)

    return schedule


def cosine_restart(base_lr, t_period, eta_min=1e-7, restarts=(), restart_weights=()):
    """CosineAnnealingLR_Restart (lr_scheduler.py:53-163)."""
    periods = list(t_period)
    restarts = list(restarts) + [float("inf")]
    weights = [1.0] + list(restart_weights)

    def schedule(step):
        step = float(step) if not hasattr(step, "dtype") else step
        # piecewise cosine within the current period
        def py(sch_step):
            last = 0
            for i, p in enumerate(periods):
                if sch_step < last + p:
                    t = sch_step - last
                    w = weights[min(i, len(weights) - 1)]
                    return eta_min + 0.5 * (base_lr * w - eta_min) * (
                        1 + math.cos(math.pi * t / p)
                    )
                last += p
            return eta_min

        return py(int(step))

    return schedule


def make_optimizer(spec, schedule=None):
    """spec: {'name': 'adam'|'sgd', 'args': {...torch kwargs...}}.

    Returns an optax GradientTransformation.  torch Adam defaults map to
    optax.adam(b1=0.9, b2=0.999, eps=1e-8).
    """
    name = spec["name"]
    args = dict(spec.get("args", {}) or {})
    lr = args.pop("lr")
    lr = schedule if schedule is not None else lr
    if name == "adam":
        betas = args.pop("betas", (0.9, 0.999))
        eps = args.pop("eps", 1e-8)
        wd = args.pop("weight_decay", 0.0)
        if wd:
            return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=wd)
        return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    if name == "sgd":
        momentum = args.pop("momentum", 0.0)
        return optax.sgd(lr, momentum=momentum or None)
    raise ValueError(name)
