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
    assert abs(sch(0) - 1.0) < 1e-9
    assert abs(sch(5) - 0.5) < 1e-9
    assert abs(sch(10) - 1.0) < 1e-9  # restart


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
