"""Optimizer/schedule semantics vs torch conventions."""

import numpy as np
import jax.numpy as jnp
import optax
import pytest

from bfsr_tpu.train.optim import (
    make_optimizer, multi_step_lr, multi_step_restart, cosine_restart,
)


def test_multi_step_lr_matches_torch_semantics():
    sch = multi_step_lr(1.0, milestones=[2, 4], gamma=0.5)
    # torch MultiStepLR stepped per epoch: lr during epoch e (1-based) uses
    # count of milestones <= completed epochs
    vals = [float(sch(e)) for e in range(6)]
    assert vals == [1.0, 1.0, 0.5, 0.5, 0.25, 0.25]


def test_multi_step_restart_gamma():
    sch = multi_step_restart(1.0, milestones=[10, 20], gamma=0.5)
    assert float(sch(5)) == 1.0
    assert float(sch(10)) == 0.5
    assert float(sch(25)) == 0.25


def test_cosine_restart_endpoints():
    sch = cosine_restart(1.0, t_period=[10, 10], eta_min=0.0,
                         restarts=[10], restart_weights=[1.0])
    assert abs(sch(0) - 1.0) < 1e-6
    assert abs(sch(5) - 0.5) < 1e-6
    assert abs(sch(10) - 1.0) < 1e-9  # restart


def _torch_lr_sweep(make_scheduler, n):
    """lr values at last_epoch = 0..n-1 for a reference torch scheduler."""
    import torch

    opt = torch.optim.Adam([torch.zeros(2, requires_grad=True)], lr=1.0)
    sch = make_scheduler(opt)
    out = [opt.param_groups[0]["lr"]]
    for _ in range(n - 1):
        sch.step()
        out.append(opt.param_groups[0]["lr"])
    return np.asarray(out)


def test_multi_step_restart_torch_oracle():
    """Sweep vs reference MultiStepLR_Restart (lr_scheduler.py:24-50),
    including a restart with weight != 1."""
    import sys
    sys.path.insert(0, "/root/reference/SRFlow-LP/code/models")
    try:
        from lr_scheduler import MultiStepLR_Restart
    finally:
        sys.path.pop(0)

    milestones = [30, 60, 120, 180, 240]
    restarts = [150]
    weights = [0.7]
    ref = _torch_lr_sweep(
        lambda o: MultiStepLR_Restart(o, milestones, restarts=restarts,
                                      weights=weights, gamma=0.5,
                                      lr_steps_invese=[]),
        300,
    )
    sch = multi_step_restart(1.0, milestones, gamma=0.5, restarts=restarts,
                             restart_weights=weights)
    ours = np.asarray([float(sch(t)) for t in range(300)])
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_cosine_restart_torch_oracle():
    """Sweep vs reference CosineAnnealingLR_Restart (lr_scheduler.py:53-81)."""
    import sys
    sys.path.insert(0, "/root/reference/SRFlow-LP/code/models")
    try:
        from lr_scheduler import CosineAnnealingLR_Restart
    finally:
        sys.path.pop(0)

    t_period = [100, 100, 100, 100]
    restarts = [100, 200, 300]
    weights = [1.0, 0.5, 0.5]
    n = 400
    ref = _torch_lr_sweep(
        lambda o: CosineAnnealingLR_Restart(o, t_period, eta_min=1e-7,
                                            restarts=restarts, weights=weights),
        n,
    )
    sch = cosine_restart(1.0, t_period, eta_min=1e-7, restarts=restarts,
                         restart_weights=weights)
    ours = np.asarray([float(sch(t)) for t in range(n)])
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_cosine_restart_misaligned_torch_oracle():
    """Restarts NOT at cumulative T_period boundaries (the general case the
    torch scheduler supports beyond the shipped confs): a restart arriving
    mid-cosine, a weight != 1, and a final segment that outlives its period
    (exercising the wrap branch's unweighted amplitude)."""
    import sys
    sys.path.insert(0, "/root/reference/SRFlow-LP/code/models")
    try:
        from lr_scheduler import CosineAnnealingLR_Restart
    finally:
        sys.path.pop(0)

    t_period = [80, 50, 60]
    restarts = [50, 130]
    weights = [0.5, 0.25]
    n = 320  # runs 130 steps past the last restart (> T=60: wrap branch)
    ref = _torch_lr_sweep(
        lambda o: CosineAnnealingLR_Restart(o, t_period, eta_min=1e-7,
                                            restarts=restarts, weights=weights),
        n,
    )
    sch = cosine_restart(1.0, t_period, eta_min=1e-7, restarts=restarts,
                         restart_weights=weights)
    ours = np.asarray([float(sch(t)) for t in range(n)])
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_cosine_no_restarts_oscillates_torch_oracle():
    """restarts=None: torch keeps T_period[0] forever and the recursion
    oscillates with period 2*T past the first minimum."""
    import sys
    sys.path.insert(0, "/root/reference/SRFlow-LP/code/models")
    try:
        from lr_scheduler import CosineAnnealingLR_Restart
    finally:
        sys.path.pop(0)

    ref = _torch_lr_sweep(
        lambda o: CosineAnnealingLR_Restart(o, [40, 999], eta_min=1e-7),
        150,
    )
    sch = cosine_restart(1.0, [40, 999], eta_min=1e-7)
    ours = np.asarray([float(sch(t)) for t in range(150)])
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_cosine_restart_rejects_bad_specs():
    with pytest.raises(ValueError):
        cosine_restart(1.0, [100], restarts=[50], restart_weights=[1.0])
    with pytest.raises(ValueError):
        cosine_restart(1.0, [100, 100, 100], restarts=[60, 50],
                       restart_weights=[1.0, 1.0])


@pytest.mark.parametrize("make_sch", [
    lambda: multi_step_restart(1e-3, [5, 10], gamma=0.5, restarts=[8],
                               restart_weights=[0.5]),
    lambda: cosine_restart(1e-3, [10, 10], eta_min=1e-7, restarts=[10],
                           restart_weights=[0.8]),
])
def test_schedule_trace_safe_in_jitted_optax_update(make_sch):
    """The schedules must evaluate on a TRACED step count — exactly how
    make_optimizer consumes them via optax inside a jitted train step."""
    import jax

    sch = make_sch()
    opt = make_optimizer({"name": "adam", "args": {"lr": 1.0}}, schedule=sch)
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        updates, state = opt.update({"w": jnp.ones((3,))}, state, params)
        return optax.apply_updates(params, updates), state

    for _ in range(3):
        params, state = step(params, state)
    assert np.all(np.isfinite(np.asarray(params["w"])))


def test_make_optimizer_adam_updates(rng):
    opt = make_optimizer({"name": "adam", "args": {"lr": 1e-2}})
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)
    grads = {"w": jnp.ones((3,))}
    updates, state = opt.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert np.all(np.asarray(new["w"]) < 1.0)


def test_make_optimizer_sgd():
    opt = make_optimizer({"name": "sgd", "args": {"lr": 0.1, "momentum": 0.9}})
    params = {"w": jnp.ones((2,))}
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.ones((2,))}, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.1, atol=1e-7)


def test_unknown_optimizer():
    with pytest.raises(ValueError):
        make_optimizer({"name": "rmsprop", "args": {"lr": 1.0}})


def test_warmup_linear_ramp_jitted():
    """with_warmup mirrors base_model.py:69-81: below warmup_iter the lr is
    init_lr * cur_iter / warmup_iter regardless of the schedule; at/after
    it the schedule value applies unchanged."""
    import jax
    import jax.numpy as jnp
    from bfsr_tpu.train.optim import multi_step_restart, with_warmup

    base = 2.5e-4
    sched = multi_step_restart(base, [10, 20], gamma=0.5)
    warm = with_warmup(sched, base, 8)
    f = jax.jit(warm)
    for step in range(30):
        lr = float(f(jnp.asarray(step)))
        if step < 8:
            want = base * step / 8.0
        else:
            want = base * 0.5 ** sum(step >= m for m in (10, 20))
        np.testing.assert_allclose(lr, want, rtol=1e-6)
    # disabled (-1) returns the schedule unchanged
    assert with_warmup(sched, base, -1) is sched


def test_adam_weight_decay_matches_torch_coupled_l2():
    """torch Adam's weight_decay is coupled L2 (grad += wd*param before the
    moment update) — make_optimizer must reproduce it, NOT AdamW."""
    import torch

    wd, lr = 0.1, 1e-2
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal(5).astype(np.float32)
    grads = [rng.standard_normal(5).astype(np.float32) for _ in range(4)]

    tp = torch.tensor(p0.copy(), requires_grad=True)
    topt = torch.optim.Adam([tp], lr=lr, weight_decay=wd)
    for g in grads:
        tp.grad = torch.tensor(g)
        topt.step()

    opt = make_optimizer({"name": "adam", "args": {"lr": lr,
                                                   "weight_decay": wd}})
    jp = jnp.asarray(p0)
    state = opt.init(jp)
    for g in grads:
        updates, state = opt.update(jnp.asarray(g), state, jp)
        jp = optax.apply_updates(jp, updates)
    np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_sgd_weight_decay_matches_torch():
    import torch

    wd, lr, mom = 0.05, 1e-2, 0.9
    rng = np.random.default_rng(1)
    p0 = rng.standard_normal(5).astype(np.float32)
    grads = [rng.standard_normal(5).astype(np.float32) for _ in range(4)]

    tp = torch.tensor(p0.copy(), requires_grad=True)
    topt = torch.optim.SGD([tp], lr=lr, momentum=mom, weight_decay=wd)
    for g in grads:
        tp.grad = torch.tensor(g)
        topt.step()

    opt = make_optimizer({"name": "sgd", "args": {"lr": lr, "momentum": mom,
                                                  "weight_decay": wd}})
    jp = jnp.asarray(p0)
    state = opt.init(jp)
    for g in grads:
        updates, state = opt.update(jnp.asarray(g), state, jp)
        jp = optax.apply_updates(jp, updates)
    np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
