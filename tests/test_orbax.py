"""Orbax checkpoint path (train/checkpoints.py save_orbax/restore_orbax):
round-trip on a real model+optimizer tree, the srflow_train --orbax save
cadence helpers, and auto-resume across the two formats."""

import os
import time

import jax
import numpy as np
import optax
import pytest

import bfsr_tpu.models  # noqa: F401
from bfsr_tpu import registry
from bfsr_tpu.train import checkpoints as ckpt


@pytest.fixture(scope="module")
def small_state():
    m = registry.make({"name": "srflow",
                       "args": {"nf": 4, "nb": 1, "gc": 4, "K": 2, "L": 3,
                                "hidden_channels": 4, "stack_blocks": (0,)}})
    opt = optax.adam(1e-4)
    st = opt.init(m.params)
    return m, opt, st


def test_orbax_roundtrip_real_tree(tmp_path, small_state):
    m, opt, st = small_state
    path = str(tmp_path / "G_5.orbax")
    ckpt.save_orbax(path, {"params": m.params, "opt_state": st, "iter": 5})
    r = ckpt.restore_orbax(path,
                           template={"params": m.params, "opt_state": st,
                                     "iter": 0})
    assert int(r["iter"]) == 5
    flat_a = jax.tree_util.tree_leaves(m.params)
    flat_b = jax.tree_util.tree_leaves(r["params"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # template restore preserves the optax NamedTuple structure
    assert (jax.tree_util.tree_structure(r["opt_state"])
            == jax.tree_util.tree_structure(st))


def test_orbax_auto_resume_and_opt_reflow(tmp_path, small_state):
    """The trainer path: templateless restore (lists instead of optax
    NamedTuples) -> _restore_opt_state reflows the leaves."""
    from srflow_train import _restore_opt_state

    m, opt, st = small_state
    d = str(tmp_path)
    ckpt.save_orbax(os.path.join(d, "G_3.orbax"),
                    {"params": m.params, "opt_state": st, "iter": 3})
    newest = ckpt.find_auto_resume(d)
    assert newest.endswith("G_3.orbax")
    sv = ckpt.load_state(newest)
    assert int(sv["iter"]) == 3
    restored = _restore_opt_state(sv, opt, m.params, lambda *_: None)
    assert (jax.tree_util.tree_structure(restored)
            == jax.tree_util.tree_structure(st))
    cnt = [x for x in jax.tree_util.tree_leaves(restored)]
    assert all(np.isfinite(np.asarray(x)).all() for x in cnt)


def test_keep_newest_prunes_orbax_dirs(tmp_path, small_state):
    m, opt, st = small_state
    d = str(tmp_path)
    for i in (1, 2, 3):
        ckpt.save_orbax(os.path.join(d, f"G_{i}.orbax"),
                        {"params": m.params, "opt_state": st, "iter": i})
        time.sleep(0.05)
    ckpt.keep_newest(d, "G_", 2)
    left = sorted(f for f in os.listdir(d) if f.startswith("G_"))
    assert left == ["G_2.orbax", "G_3.orbax"]


def test_mixed_formats_auto_resume(tmp_path, small_state):
    m, opt, st = small_state
    d = str(tmp_path)
    ckpt.save_checkpoint(os.path.join(d, "G_1.ckpt"),
                         {"params": m.params, "iter": 1})
    time.sleep(0.05)
    ckpt.save_orbax(os.path.join(d, "G_2.orbax"),
                    {"params": m.params, "opt_state": st, "iter": 2})
    assert ckpt.find_auto_resume(d).endswith("G_2.orbax")
