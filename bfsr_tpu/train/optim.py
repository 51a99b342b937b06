"""Optimizers and LR schedules (optax), matching the reference semantics.

* ``make_optimizer`` mirrors LINF-LP/utils.py:94-102 ('sgd'|'adam' specs).
* ``multi_step_lr`` mirrors torch MultiStepLR (gamma ** #milestones-passed),
  stepped per *epoch* in the LINF trainer (train.py:226-227).
* ``multi_step_restart`` / ``cosine_restart`` mirror
  SRFlow-LP/code/models/lr_scheduler.py for the SRFlow training path.
"""

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
    """MultiStepLR_Restart (lr_scheduler.py:24-50), iteration-indexed.

    At a restart r the lr resets to ``base_lr * weight``; milestones after
    the last restart each multiply by ``gamma`` (a milestone coinciding with
    a restart step is swallowed by the reset, matching the torch scheduler's
    get_lr order).  Pure jnp piecewise math — safe inside
    ``optax.scale_by_schedule`` under jit.
    """
    milestones = sorted(milestones)
    order = sorted(range(len(restarts)), key=lambda i: restarts[i])
    restarts = [restarts[i] for i in order]
    weights = [restart_weights[i] for i in order]

    def schedule(step):
        step = jnp.asarray(step)
        w = jnp.asarray(1.0, jnp.float32)
        last_restart = jnp.asarray(0, jnp.int32)
        for r, rw in zip(restarts, weights):
            hit = step >= r
            w = jnp.where(hit, rw, w)
            last_restart = jnp.where(hit, r, last_restart)
        n = sum(
            jnp.where((step >= m) & (m > last_restart), 1, 0) for m in milestones
        )
        return base_lr * w * (gamma ** n)

    return schedule


def cosine_restart(base_lr, t_period, eta_min=1e-7, restarts=(), restart_weights=()):
    """CosineAnnealingLR_Restart (lr_scheduler.py:53-81), closed form.

    Exact semantics of the recursive torch scheduler for ARBITRARY restart
    positions (not only the cumulative-T_period boundaries the reference's
    shipped confs use):

    * segment i spans [restarts[i-1], restarts[i]) with period T_period[i]
      and amplitude ``base_lr * restart_weights[i-1]`` (segment 0: weight 1;
      T_period entries beyond ``len(restarts)+1`` are unused, as in torch);
    * within a segment, lr = eta + (base*w - eta) * (1 + cos(pi*t/T)) / 2;
    * if a segment outlives its period (t > T) the torch wrap branch
      (the modular case in get_lr, which adds ``base_lrs``-scaled steps)
      resets the amplitude to the UNWEIGHTED ``base_lr - eta`` and the
      cosine keeps oscillating with period 2T.

    Pure jnp piecewise math — trace-safe inside optax.scale_by_schedule.
    """
    periods = [float(p) for p in t_period]
    restarts = list(restarts)
    if restarts != sorted(restarts) or len(set(restarts)) != len(restarts):
        raise ValueError(f"restarts must be strictly increasing: {restarts}")
    if len(restarts) != len(restart_weights):
        raise ValueError("restarts and their weights do not match.")
    if len(periods) < len(restarts) + 1:
        raise ValueError(
            f"need len(T_period) >= len(restarts)+1 "
            f"({len(periods)} < {len(restarts) + 1})"
        )
    seg_start = [0.0] + [float(r) for r in restarts]
    weights = [1.0] + [float(w) for w in restart_weights]

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.asarray(eta_min, jnp.float32)
        for i, start in enumerate(seg_start):
            T = periods[i]
            t = step - start
            amp = jnp.where(t <= T, base_lr * weights[i], base_lr) - eta_min
            val = eta_min + 0.5 * amp * (1.0 + jnp.cos(jnp.pi * t / T))
            in_seg = step >= start
            if i + 1 < len(seg_start):
                in_seg = in_seg & (step < seg_start[i + 1])
            lr = jnp.where(in_seg, val, lr)
        return lr

    return schedule


def with_warmup(schedule, base_lr, warmup_iter):
    """Linear LR warmup override (SRFlow-LP/code/models/base_model.py:69-81):
    for cur_iter < warmup_iter the lr is ``init_lr * cur_iter/warmup_iter``
    regardless of the scheduler; the shipped confs set ``warmup_iter: -1``
    (disabled).  Pure jnp — jit-safe inside optax.scale_by_schedule."""
    if warmup_iter is None or warmup_iter <= 0:
        return schedule
    wi = float(warmup_iter)

    def wrapped(step):
        s = jnp.asarray(step, jnp.float32)
        return jnp.where(s < wi, base_lr * s / wi, schedule(step))

    return wrapped


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
        opt = optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
        if wd:
            # torch Adam's weight_decay is COUPLED L2 (wd*param added to
            # the gradient BEFORE the moment update) — not AdamW's
            # decoupled decay; add_decayed_weights ahead of adam
            # reproduces the torch dynamics exactly
            return optax.chain(optax.add_decayed_weights(wd), opt)
        return opt
    if name == "sgd":
        momentum = args.pop("momentum", 0.0)
        wd = args.pop("weight_decay", 0.0)
        opt = optax.sgd(lr, momentum=momentum or None)
        if wd:  # torch SGD weight_decay is also grad += wd*param
            return optax.chain(optax.add_decayed_weights(wd), opt)
        return opt
    raise ValueError(name)
