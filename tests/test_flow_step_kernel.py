"""Parity of the fused FlowStep Pallas kernel vs the jnp flow step.

Runs in interpret mode on CPU (conftest forces the cpu backend); the same
code path executes compiled on hardware.  Reference semantics:
FlowStep.py:88-129 via our flows.cond_affine / fs2d.step_* twins.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bfsr_tpu.models.srflow import flow_upsampler as fup
from bfsr_tpu.ops import flows
from bfsr_tpu.ops import flows_s2d as fs2d
from bfsr_tpu.ops.pallas import flow_step as fsk


def _mk_step(key, c, c_cond=320, hidden=64):
    """A dezeroed, anic-folded conditional step + a matching cache."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "actnorm": {"bias": jax.random.normal(k1, (c,)) * 0.1,
                    "logs": jax.random.normal(k2, (c,)) * 0.1},
        "invconv": {"w": _orth(k3, c)},
        "affine": flows.init_cond_affine(k4, c, c_cond, hidden),
    }
    # dezero the Conv2dZeros tails so the coupling is live
    for tower in ("fFeatures", "fAffine"):
        out = p["affine"][tower]["out"]
        kk = jax.random.fold_in(k4, hash(tower) % 1000)
        out["w"] = jax.random.normal(kk, out["w"].shape) * 0.08
        out["b"] = jax.random.normal(jax.random.fold_in(kk, 1),
                                     out["b"].shape) * 0.05
        out["logs"] = jax.random.normal(jax.random.fold_in(kk, 2),
                                        out["logs"].shape) * 0.1
    p["invconv"] = flows.invconv_cache(p["invconv"]["w"])
    p["anic"] = flows.fold_actnorm_invconv(p["actnorm"], p["invconv"])
    return p


def _orth(key, c):
    a = jax.random.normal(key, (c, c))
    q, _ = jnp.linalg.qr(a)
    return q


@pytest.mark.parametrize("c,h,w", [(24, 20, 28), (96, 12, 12), (24, 17, 13)])
def test_step_parity_p1(c, h, w):
    key = jax.random.PRNGKey(0)
    p = _mk_step(key, c)
    ft = jax.random.normal(jax.random.fold_in(key, 1), (1, h, w, 320)) * 0.3
    x = jax.random.normal(jax.random.fold_in(key, 2), (1, h, w, c))
    cache = flows.cond_affine_cache(ft, p["affine"])

    ref_f, _ = fup._step_forward(x, p, ft, None, cond=True, ft_params=cache)
    ref_r, _ = fup._step_reverse(ref_f, p, ft, None, cond=True,
                                 ft_params=cache)

    prep = fsk.prep_step(p, c, phases=1)
    cp = fsk.pack_cache(cache, h, w)
    zf = fsk.step_apply(fsk.pad_state(x), cp, prep, h, w, interpret=True)
    got_f = fsk.unpad_state(zf, h, w, c)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref_f),
                               atol=2e-4, rtol=2e-4)
    zr = fsk.step_apply(zf, cp, prep, h, w, reverse=True, interpret=True)
    got_r = fsk.unpad_state(zr, h, w, c)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(ref_r),
                               atol=2e-4, rtol=2e-4)
    # round trip back to x
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(x),
                               atol=5e-4, rtol=5e-4)


def test_step_parity_s2d():
    c, h, w = 12, 24, 16  # level-1: state (h, w, 12) -> s2d (h/2, w/2, 48)
    key = jax.random.PRNGKey(3)
    p = _mk_step(key, c)
    ft = jax.random.normal(jax.random.fold_in(key, 1), (1, h, w, 320)) * 0.3
    x = jax.random.normal(jax.random.fold_in(key, 2), (1, h, w, c))
    cache = flows.cond_affine_cache(ft, p["affine"])

    ref_f, _ = fup._step_forward(x, p, ft, None, cond=True, ft_params=cache)

    cache4 = fs2d.cache_to_s2d(cache)
    x4 = fs2d.to_s2d(x)
    # fs2d twin sanity
    tw_f, _ = fs2d.step_forward(x4, p, None, cond=True, ft_params=cache4)
    np.testing.assert_allclose(np.asarray(fs2d.from_s2d(tw_f)),
                               np.asarray(ref_f), atol=1e-4, rtol=1e-4)

    prep = fsk.prep_step(p, c, phases=4)
    hs, ws = h // 2, w // 2
    cp = fsk.pack_cache(cache4, hs, ws)
    zf = fsk.step_apply(fsk.pad_state(x4), cp, prep, hs, ws, interpret=True)
    got_f = fs2d.from_s2d(fsk.unpad_state(zf, hs, ws, 4 * c))
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref_f),
                               atol=2e-4, rtol=2e-4)

    zr = fsk.step_apply(zf, cp, prep, hs, ws, reverse=True, interpret=True)
    got_r = fs2d.from_s2d(fsk.unpad_state(zr, hs, ws, 4 * c))
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(x),
                               atol=5e-4, rtol=5e-4)


def _dezero_flow(params, seed=11):
    """Give the zero-init coupling/split tails live weights."""
    rng = np.random.default_rng(seed)

    def live(p):
        return {
            "w": jnp.asarray(rng.normal(0, 0.08, p["w"].shape), jnp.float32),
            "b": jnp.asarray(rng.normal(0, 0.05, p["b"].shape), jnp.float32),
            "logs": jnp.asarray(rng.normal(0, 0.1, p["logs"].shape),
                                jnp.float32),
        }

    layers = []
    for p in params["flow"]["layers"]:
        p = dict(p)
        if "affine" in p:
            aff = {k: dict(v) for k, v in p["affine"].items()}
            aff["fFeatures"] = dict(aff["fFeatures"], out=live(aff["fFeatures"]["out"]))
            aff["fAffine"] = dict(aff["fAffine"], out=live(aff["fAffine"]["out"]))
            p["affine"] = aff
        if "conv" in p:
            p["conv"] = live(p["conv"])
        layers.append(p)
    return dict(params, flow={"layers": layers})


def test_srflow_e2e_kernel_parity():
    """Full SRFlowNet encode->decode with the fused kernel path matches
    the jnp path (the predictor wiring, B=1, no logdet)."""
    from bfsr_tpu import registry

    m = registry.make({"name": "srflow",
                       "args": {"nf": 8, "nb": 2, "gc": 4, "K": 3, "L": 3,
                                "hidden_channels": 16,
                                "stack_blocks": (0, 1)}}).freeze()
    m.params = _dezero_flow(m.params)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((1, 10, 14, 3)), jnp.float32)
    gt = jnp.asarray(rng.random((1, 40, 56, 3)), jnp.float32)
    lr_enc = m.preprocess(m.params, lr)
    ft_cache = m.precompute_ft(m.params, lr_enc)
    kctx = m.prep_kernel_ctx(m.params, ft_cache, interpret=True)
    assert kctx is not None and len(kctx) == 3 * 3  # K=3 cond steps x L=3

    ref_e, _, _ = m.normal_flow(m.params, gt, lr, add_gt_noise=False,
                                lr_enc=lr_enc, ft_cache=ft_cache,
                                want_logdet=False)
    got_e, _, _ = m.normal_flow(m.params, gt, lr, add_gt_noise=False,
                                lr_enc=lr_enc, ft_cache=ft_cache,
                                want_logdet=False, kernel_ctx=kctx)
    for a, b in zip(got_e, ref_e):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4)

    ref_sr, _ = m.reverse_flow(m.params, lr, epses=ref_e, add_gt_noise=False,
                               lr_enc=lr_enc, ft_cache=ft_cache,
                               want_logdet=False)
    got_sr, _ = m.reverse_flow(m.params, lr, epses=ref_e, add_gt_noise=False,
                               lr_enc=lr_enc, ft_cache=ft_cache,
                               want_logdet=False, kernel_ctx=kctx)
    np.testing.assert_allclose(np.asarray(got_sr), np.asarray(ref_sr),
                               atol=3e-4, rtol=3e-4)

    # level-restricted ctx (the shipped default keeps only the measured-win
    # level 3; other levels fall through to the XLA path per index)
    kctx3 = m.prep_kernel_ctx(m.params, ft_cache, interpret=True, levels=(3,))
    assert kctx3 is not None and len(kctx3) == 3  # K=3 cond steps at level 3
    got3_e, _, _ = m.normal_flow(m.params, gt, lr, add_gt_noise=False,
                                 lr_enc=lr_enc, ft_cache=ft_cache,
                                 want_logdet=False, kernel_ctx=kctx3)
    for a, b in zip(got3_e, ref_e):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4)
    got3_sr, _ = m.reverse_flow(m.params, lr, epses=ref_e, add_gt_noise=False,
                                lr_enc=lr_enc, ft_cache=ft_cache,
                                want_logdet=False, kernel_ctx=kctx3)
    np.testing.assert_allclose(np.asarray(got3_sr), np.asarray(ref_sr),
                               atol=3e-4, rtol=3e-4)
    # an empty restriction collapses to None (pure XLA path)
    assert m.prep_kernel_ctx(m.params, ft_cache, interpret=True,
                             levels=()) is None
