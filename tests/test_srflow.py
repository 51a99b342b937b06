"""SRFlow stack: plan construction, encode/decode invertibility, shapes."""

import jax
import jax.numpy as jnp
import numpy as np

import bfsr_tpu.models  # noqa: F401
from bfsr_tpu import registry
from bfsr_tpu.models.srflow.flow_upsampler import build_plan
from bfsr_tpu.models.srflow.srflow_net import standardize_epses


def small_srflow():
    return registry.make({
        "name": "srflow",
        "args": {"nf": 8, "nb": 2, "gc": 4, "K": 2, "L": 3, "hidden_channels": 8,
                 "stack_blocks": (0, 1), "quant": 32},
    })


def test_plan_structure():
    plan, final_c = build_plan(scale=4, L=3, K=16, additional_steps=2, split_enable=True)
    kinds = [e["kind"] for e in plan]
    # per level: squeeze + 2 nc + 16 cond (+ split at level 1)
    assert kinds.count("squeeze") == 3
    assert kinds.count("step_nc") == 6
    assert kinds.count("step_cond") == 48
    assert kinds.count("split") == 1
    assert final_c == 96
    # channel progression 3->12 (split->6) ->24 ->96
    cs = [e["c"] for e in plan if e["kind"] == "squeeze"]
    assert cs == [12, 24, 96]
    # split is at level 1
    split = [e for e in plan if e["kind"] == "split"][0]
    assert split["level"] == 1 and split["consume"] == 6


def test_encode_decode_roundtrip(rng):
    m = small_srflow().freeze()
    B, hl = 1, 4
    H = hl * 4
    lr = jnp.asarray(rng.random((B, hl, hl, 3)).astype(np.float32))
    gt = jnp.asarray(rng.random((B, H, H, 3)).astype(np.float32))

    epses, nll, logdet = m.normal_flow(m.params, gt, lr, add_gt_noise=False)
    assert len(epses) == 2  # eps0 + final z
    assert epses[0].shape == (B, H // 2, H // 2, 6)
    assert epses[1].shape == (B, H // 8, H // 8, 96)
    assert np.isfinite(np.asarray(nll)).all()

    sr, _ = m.reverse_flow(m.params, lr, epses=epses, add_gt_noise=False)
    np.testing.assert_allclose(np.asarray(sr), np.asarray(gt), atol=2e-3)


def test_decode_from_zero_z(rng):
    m = small_srflow().freeze()
    lr = jnp.asarray(rng.random((1, 4, 4, 3)).astype(np.float32))
    z = m.sample_z(None, 0.0, 1, (4, 4))
    assert z.shape == (1, 2, 2, 96)
    sr = m.get_sr(m.params, lr, z=z, key=jax.random.PRNGKey(0))
    assert sr.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(sr)).all()


def test_keyless_heat0_decode(rng):
    """reverse_flow at eps_std=0 with NO key must decode deterministically
    (reference sample_eps * eps_std is zero at heat 0 without RNG) — this
    is the weight_l1 training path's decode."""
    m = small_srflow().freeze()
    lr = jnp.asarray(rng.random((1, 4, 4, 3)).astype(np.float32))
    z = m.sample_z(None, 0.0, 1, (4, 4))
    sr, _ = m.reverse_flow(m.params, lr, z=z, eps_std=0.0)  # no key
    assert sr.shape == (1, 16, 16, 3)
    sr2, _ = m.reverse_flow(m.params, lr, z=z, eps_std=0.0,
                            key=jax.random.PRNGKey(7))
    # keyed at heat 0: normal()*0 == the keyless zeros
    np.testing.assert_allclose(np.asarray(sr), np.asarray(sr2), atol=1e-6)


def test_weight_l1_train_step_smoke(rng):
    """The l1-at-heat-0 loss path (weight_l1 > 0) runs end-to-end."""
    import optax
    from bfsr_tpu.pipelines.srflow_train import make_srflow_train_step

    m = small_srflow()
    optimizer = optax.adam(1e-4)
    step = make_srflow_train_step(m, optimizer, weight_fl=1.0, weight_l1=0.5)
    batch = {"GT": jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32)),
             "LQ": jnp.asarray(rng.random((2, 4, 4, 3)).astype(np.float32))}
    params, _, mets = step(m.params, optimizer.init(m.params), batch,
                           jax.random.PRNGKey(0), jnp.asarray(0))
    assert np.isfinite(float(mets["loss"]))
    assert np.isfinite(float(mets["l1_loss"]))


def test_learned_prior_path(rng):
    """encode -> standardize -> two-branch unet -> decode (test.py:134-148)."""
    m = small_srflow().freeze()
    prior = registry.make({"name": "srflow-unet",
                           "args": {"depth": 2, "dim": 8, "ch0": 6, "ch1": 96}})
    lr = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    lr_up = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    epses = m.get_encode_epses(m.params, lr, lr_up, add_gt_noise=False)
    epses = standardize_epses(epses)
    for e in epses:
        mean = np.asarray(jnp.mean(e, axis=-1))
        np.testing.assert_allclose(mean, 0.0, atol=1e-4)
    learned = prior(epses)
    assert learned[0].shape == epses[0].shape
    assert learned[1].shape == epses[1].shape
    sr = m.get_sr(m.params, lr, epses=learned)
    assert sr.shape == (1, 32, 32, 3)


def test_nll_logdet_changes_with_noise(rng):
    m = small_srflow().freeze()
    lr = jnp.asarray(rng.random((1, 4, 4, 3)).astype(np.float32))
    gt = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    _, nll1, _ = m.normal_flow(m.params, gt, lr, add_gt_noise=False)
    _, nll2, _ = m.normal_flow(m.params, gt, lr, key=jax.random.PRNGKey(1),
                               add_gt_noise=True)
    assert not np.allclose(np.asarray(nll1), np.asarray(nll2))


def test_precompute_ft_cache_matches_uncached(rng):
    """The per-image conditioning cache (fFeatures scale/shift + fAffine
    first-conv ft split) must not change encode or decode outputs."""
    m = small_srflow().freeze()
    lr = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    gt = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    lr_enc = m.preprocess(m.params, lr)
    ft_cache = m.precompute_ft(m.params, lr_enc)

    eps_ref, nll_ref, _ = m.normal_flow(m.params, gt, lr, add_gt_noise=False,
                                        lr_enc=lr_enc)
    eps_c, nll_c, _ = m.normal_flow(m.params, gt, lr, add_gt_noise=False,
                                    lr_enc=lr_enc, ft_cache=ft_cache)
    for a, b in zip(eps_ref, eps_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(nll_c), np.asarray(nll_ref),
                               rtol=1e-5)

    sr_ref, _ = m.reverse_flow(m.params, lr, epses=eps_ref,
                               add_gt_noise=False, lr_enc=lr_enc)
    sr_c, _ = m.reverse_flow(m.params, lr, epses=eps_ref, add_gt_noise=False,
                             lr_enc=lr_enc, ft_cache=ft_cache)
    np.testing.assert_allclose(np.asarray(sr_c), np.asarray(sr_ref), atol=1e-5)


def test_all_levels_s2d_matches_nhwc(rng):
    """The encode/decode transition machinery supports ANY per-level s2d
    set (flow_upsampler ships level-1-only for perf); force every level's
    cache into the s2d layout and check both passes still match."""
    from bfsr_tpu.models.srflow import flow_upsampler as fup
    from bfsr_tpu.ops import flows_s2d as fs2d

    m = small_srflow().freeze()
    lr = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    gt = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    lr_enc = m.preprocess(m.params, lr)
    cache = m.precompute_ft(m.params, lr_enc)

    # convert every NHWC per-step cache (levels 2, 3) to s2d
    plan = m.plan
    cache_all = []
    for entry, c in zip(plan, cache):
        if (c is not None and entry["kind"] == "step_cond"
                and c["scale_ft"].shape[-1] == entry["c"]):
            c = fs2d.cache_to_s2d(c)
        cache_all.append(c)
    levels = fup._cache_s2d_levels(plan, cache_all)
    assert levels == {1, 2, 3}

    eps_ref, nll_ref, _ = m.normal_flow(m.params, gt, lr, add_gt_noise=False,
                                        lr_enc=lr_enc, ft_cache=cache)
    eps_s, nll_s, _ = m.normal_flow(m.params, gt, lr, add_gt_noise=False,
                                    lr_enc=lr_enc, ft_cache=cache_all)
    for a, b in zip(eps_ref, eps_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(nll_s), np.asarray(nll_ref),
                               rtol=1e-5)

    sr_ref, _ = m.reverse_flow(m.params, lr, epses=eps_ref,
                               add_gt_noise=False, lr_enc=lr_enc,
                               ft_cache=cache)
    sr_s, _ = m.reverse_flow(m.params, lr, epses=eps_ref, add_gt_noise=False,
                             lr_enc=lr_enc, ft_cache=cache_all)
    np.testing.assert_allclose(np.asarray(sr_s), np.asarray(sr_ref),
                               atol=1e-5)
