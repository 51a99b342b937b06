"""SRFlow training step + skimage-protocol metrics + LPIPS arch tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import bfsr_tpu.models  # noqa: F401
from bfsr_tpu import registry
from bfsr_tpu.pipelines.srflow_train import make_srflow_train_step
from bfsr_tpu.utils.measure import psnr_uint8, ssim_uint8, Measure, natsorted


def test_srflow_train_step_updates_flow_not_rrdb(rng):
    m = registry.make({"name": "srflow",
                       "args": {"nf": 8, "nb": 2, "gc": 4, "K": 2, "L": 3,
                                "hidden_channels": 8, "stack_blocks": (0, 1)}})
    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(m.params)
    step = make_srflow_train_step(m, optimizer, weight_fl=1.0,
                                  rrdb_unfreeze_step=100)
    batch = {"GT": jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32)),
             "LQ": jnp.asarray(rng.random((2, 4, 4, 3)).astype(np.float32))}
    rrdb0 = np.asarray(jax.tree_util.tree_leaves(m.params["rrdb"])[0])
    flow0 = np.asarray(m.params["flow"]["layers"][1]["actnorm"]["bias"])
    params, opt_state, mets = step(m.params, opt_state, batch,
                                   jax.random.PRNGKey(0), jnp.asarray(0))
    assert np.isfinite(float(mets["loss"]))
    # before the delay: RRDB frozen, flow updated
    np.testing.assert_array_equal(
        rrdb0, np.asarray(jax.tree_util.tree_leaves(params["rrdb"])[0]))
    assert not np.allclose(flow0, np.asarray(params["flow"]["layers"][1]["actnorm"]["bias"]))
    # after the delay: RRDB unfrozen
    params2, _, _ = step(params, opt_state, batch, jax.random.PRNGKey(1),
                         jnp.asarray(200))
    assert not np.allclose(
        rrdb0, np.asarray(jax.tree_util.tree_leaves(params2["rrdb"])[0]))


def test_srflow_frozen_step_matches_mask_form(rng):
    """freeze_rrdb=True (stop_gradient, no trunk backward) must produce
    the same params as the grad-mask form — Adam on zero grads is a
    no-op update, so the two are numerically identical."""
    m = registry.make({"name": "srflow",
                       "args": {"nf": 8, "nb": 2, "gc": 4, "K": 2, "L": 3,
                                "hidden_channels": 8, "stack_blocks": (0, 1)}})
    optimizer = optax.chain(optax.clip_by_global_norm(10.0),
                            optax.adam(1e-4))
    batch = {"GT": jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32)),
             "LQ": jnp.asarray(rng.random((2, 4, 4, 3)).astype(np.float32))}
    step_mask = make_srflow_train_step(m, optimizer, weight_fl=1.0,
                                       rrdb_unfreeze_step=100)
    step_frozen = make_srflow_train_step(m, optimizer, weight_fl=1.0,
                                         freeze_rrdb=True)
    key = jax.random.PRNGKey(0)
    p1, o1, m1 = step_mask(m.params, optimizer.init(m.params), batch, key,
                           jnp.asarray(0))
    p2, o2, m2 = step_frozen(m.params, optimizer.init(m.params), batch, key,
                             jnp.asarray(0))
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    # one more step from the (shared) state to exercise non-zero moments
    p1, _, _ = step_mask(p1, o1, batch, jax.random.PRNGKey(1), jnp.asarray(1))
    p2, _, _ = step_frozen(p2, o2, batch, jax.random.PRNGKey(1), jnp.asarray(1))
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-7)


def test_rrdb_remat_full_mode_matches_acts(rng, monkeypatch):
    """BFSR_RRDB_REMAT=full (whole-block recompute, the minimum-memory
    fallback) must produce the same grads as the default named-activation
    policy — both are pure remat choices."""
    import bfsr_tpu.models.rrdb as rrdb_mod

    p = rrdb_mod.init_rrdb(jax.random.PRNGKey(0), nf=8, nb=2, gc=4,
                           upsampling=False)
    x = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))

    def loss(params):
        return jnp.sum(rrdb_mod.rrdb_encode(params, x) ** 2)

    monkeypatch.setenv("BFSR_RRDB_REMAT", "acts")
    g_acts = jax.jit(jax.grad(loss))(p)
    monkeypatch.setenv("BFSR_RRDB_REMAT", "full")
    g_full = jax.jit(jax.grad(loss))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_acts),
                    jax.tree_util.tree_leaves(g_full)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_restore_opt_state_fallback(capsys):
    """Old checkpoints without opt_state (or with a stale structure)
    degrade to a fresh optimizer init instead of crashing."""
    import optax
    import srflow_train as st

    params = {"w": jnp.ones((3,))}
    optimizer = optax.adam(1e-4)
    fresh = optimizer.init(params)
    logs = []
    # missing opt_state
    out = st._restore_opt_state({"params": params}, optimizer, params,
                                logs.append)
    assert jax.tree_util.tree_structure(out) == \
        jax.tree_util.tree_structure(fresh)
    # stale structure
    out = st._restore_opt_state({"opt_state": {"bogus": 1}}, optimizer,
                                params, logs.append)
    assert jax.tree_util.tree_structure(out) == \
        jax.tree_util.tree_structure(fresh)
    assert logs and "reinitializing" in logs[0]


def test_psnr_uint8_matches_definition(rng):
    a = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    b = np.clip(a.astype(np.int32) + 10, 0, 255).astype(np.uint8)
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    assert abs(psnr_uint8(a, b) - 10 * np.log10(255 ** 2 / mse)) < 1e-9


def test_ssim_matches_skimage_if_available(rng):
    skimage = pytest.importorskip("skimage.metrics")
    a = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    b = np.clip(a + rng.normal(0, 10, a.shape), 0, 255).astype(np.uint8)
    ours = ssim_uint8(a, b)
    theirs = skimage.structural_similarity(a, b, channel_axis=-1)
    assert abs(ours - theirs) < 1e-6


def test_ssim_identity(rng):
    a = (rng.random((20, 20, 3)) * 255).astype(np.uint8)
    assert abs(ssim_uint8(a, a) - 1.0) < 1e-12


def test_natsorted():
    assert natsorted(["img10.png", "img2.png", "img1.png"]) == \
        ["img1.png", "img2.png", "img10.png"]


def test_measure_without_lpips(rng):
    m = Measure()
    a = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    p, s, l = m.measure(a, a)
    assert p > 80 and abs(s - 1) < 1e-9 and np.isnan(l)


def test_lpips_architecture(rng):
    from bfsr_tpu.models.lpips import LPIPS

    model = LPIPS()
    a = rng.random((1, 64, 64, 3)).astype(np.float32) * 2 - 1
    b = rng.random((1, 64, 64, 3)).astype(np.float32) * 2 - 1
    d_ab = model(a, b)
    d_aa = model(a, a)
    assert d_aa < 1e-6
    assert d_ab > d_aa
