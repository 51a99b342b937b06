"""Stochastic eval paths: --randomness diversity, temperature>0 sampling,
and per-sample PRNG threading (round-2 verdict Weak #3 / next-round #4).

Reference behaviors being pinned:
* LINF-LP/test.py:151-162, 202-209 — 5-sample diversity (std of rounded
  uint8 stacks) in the no-prior sampling path; with a prior the latent is
  deterministic, so diversity is exactly 0.
* LINF-LP/models/linf.py:190 — sampling draws z = randn * temperature and
  runs the same flow inverse as the zmap path.
* SRFlow get_sr at heat>0 (SRFlow_model.py:191-199).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import bfsr_tpu.models  # noqa: F401
from bfsr_tpu import registry
from bfsr_tpu.pipelines.linf_eval import LINFPredictor, eval_psnr
from bfsr_tpu.utils.coords import make_coord_np, make_cell

from test_pipelines import small_linf


def _setup(rng, h=6, w=7, s=2):
    m = small_linf()
    H, W = h * s, w * s
    inp = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))
    coord = jnp.asarray(make_coord_np((H, W), flatten=False)[None])
    cell = jnp.asarray(make_cell((H, W))[None])
    return m, inp, coord, cell, H, W


def test_query_rgb_sampling_matches_zmap_at_matched_z(rng):
    """Our temperature path is EXACTLY the zmap path with z = normal*T
    (linf.py:190 semantics): inject the same draw into both."""
    m, inp, coord, cell, H, W = _setup(rng)
    feat = m.gen_feat(m.params, inp)
    key = jax.random.PRNGKey(42)
    T = 0.8
    sampled = m.query_rgb(m.params, inp, feat, coord, cell,
                          temperature=T, key=key)
    z = jax.random.normal(key, (H * W, 3)) * T
    injected = m.query_rgb(m.params, inp, feat, coord, cell,
                           zmap=z.reshape(1, H, W, 3))
    np.testing.assert_allclose(np.asarray(sampled), np.asarray(injected),
                               atol=1e-6)


def test_predictor_sampling_diversity_and_determinism(rng):
    """Predictor sample path: distinct keys -> distinct samples; same key
    -> bit-identical; temperature 0 -> deterministic mode."""
    m, inp, coord, cell, H, W = _setup(rng)
    pred = LINFPredictor(m, None, tile_queries=32, use_pallas=False)

    outs = [np.asarray(pred.predict(m.params, None, inp, coord, cell,
                                    temperature=0.7,
                                    key=jax.random.PRNGKey(k)))
            for k in range(3)]
    # distinct keys must give distinct samples (the silent-failure mode is
    # identical samples from a reused key)
    assert not np.allclose(outs[0], outs[1])
    assert not np.allclose(outs[1], outs[2])
    again = np.asarray(pred.predict(m.params, None, inp, coord, cell,
                                    temperature=0.7,
                                    key=jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(outs[0], again)

    t0_a = np.asarray(pred.predict(m.params, None, inp, coord, cell,
                                   temperature=0.0,
                                   key=jax.random.PRNGKey(0)))
    t0_b = np.asarray(pred.predict(m.params, None, inp, coord, cell,
                                   temperature=0.0,
                                   key=jax.random.PRNGKey(5)))
    np.testing.assert_array_equal(t0_a, t0_b)


def _loader(rng, n=2, h=6, w=6, s=2):
    H, W = h * s, w * s
    coord = make_coord_np((H, W), flatten=False)[None]
    cell = make_cell((H, W))[None]
    batches = []
    for _ in range(n):
        batches.append({
            "inp": rng.random((1, h, w, 3)).astype(np.float32),
            "gt": rng.random((1, H, W, 3)).astype(np.float32),
            "coord": coord.astype(np.float32),
            "cell": cell.astype(np.float32),
        })
    return batches


def test_eval_psnr_randomness_diversity(rng):
    """Full --randomness eval path (linf_eval.py mirror of test.py:202-209):
    diversity > 0 at temperature>0, == 0 at temperature 0, and the whole
    sweep is deterministic under fixed seeds."""
    m = small_linf()
    batches = _loader(rng)

    out = eval_psnr(batches, m, None, detail=True, randomness=True,
                    temperature=0.7, tile_queries=32, eval_type="div2k-2",
                    log_fn=lambda *a: None)
    assert out["diversity"] > 0.0, out
    assert np.isfinite(out["psnr"]) and np.isfinite(out["ssim"])

    again = eval_psnr(batches, m, None, detail=True, randomness=True,
                      temperature=0.7, tile_queries=32, eval_type="div2k-2",
                      log_fn=lambda *a: None)
    for k in out:
        np.testing.assert_array_equal(out[k], again[k], err_msg=k)  # nan==nan ok

    zero = eval_psnr(batches, m, None, detail=True, randomness=True,
                     temperature=0.0, tile_queries=32, eval_type="div2k-2",
                     log_fn=lambda *a: None)
    assert zero["diversity"] == 0.0, zero


def test_eval_psnr_randomness_with_prior_is_deterministic(rng):
    """With a prior model the latent is learned, not sampled — the 5
    samples are identical and diversity is exactly 0 (reference
    test.py:151-157 passes the same z_lr_learned to every sample)."""
    m = small_linf()
    prior = registry.make({"name": "unet", "args": {"in_chans": 3, "depth": 2,
                                                    "dim": 16}})
    batches = _loader(rng)
    for b in batches:
        H, W = b["gt"].shape[1:3]
        b["gt_lr_up"] = (rng.random((1, H, W, 3)) - 0.5).astype(np.float32)
    out = eval_psnr(batches, m, prior, detail=True, randomness=True,
                    temperature=0.7, tile_queries=32, eval_type="div2k-2",
                    log_fn=lambda *a: None)
    assert out["diversity"] == 0.0, out


# ---------------------------------------------------------------------------
# torch-oracle parity at matched z
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")
from ref_oracle import (  # noqa: E402
    linf_modules, patch_cuda_noop, srflow_modules, reference_available)

needs_ref = pytest.mark.skipif(not reference_available(),
                               reason="no reference mount")


@needs_ref
def test_linf_temperature_parity_vs_torch_matched_z(rng):
    """temperature>0 sampling parity: inject the SAME z ~ N(0,1)*T into the
    reference (zmap path == its randn*T path, linf.py:188-190) and ours."""
    from bfsr_tpu.convert import torch_import as cv

    patch_cuda_noop()
    with linf_modules("edsr", "flow", "linf") as m:
        torch.manual_seed(0)
        net = m["linf"].LINF(
            encoder_spec={"name": "edsr-baseline",
                          "args": {"n_resblocks": 2, "n_feats": 8,
                                   "no_upsampling": True}},
            imnet_spec={"name": "flow", "args": {"name": "flow"}},
            flow_layers=3, num_layer=2, hidden_dim=16,
        )
        net.eval()
        # condition the random flow weights so the inverse chain is sane
        with torch.no_grad():
            for lin in list(net.imnet.linears) + [net.imnet.last]:
                lin._weight += torch.eye(3)
        B, h, w, s = 1, 5, 6, 2
        H, W = h * s, w * s
        inp = rng.random((B, 3, h, w)).astype(np.float32)
        import utils as ref_utils

        coord = ref_utils.make_coord((H, W), flatten=False).unsqueeze(0)
        cell = torch.tensor([[2.0 / H, 2.0 / W]], dtype=torch.float32)
        T = 0.8
        z = (rng.standard_normal((1, 3, H, W)) * T).astype(np.float32)
        with torch.no_grad():
            feat_t = net("gen_feat", inp=torch.from_numpy(inp))
            pred_ref = net("query_rgb", inp=torch.from_numpy(inp), feat=feat_t,
                           coord=coord, cell=cell, temperature=T,
                           zmap=torch.from_numpy(z))
            # reference t=0 sampling: randn*0 == zeros
            pred_ref_t0 = net("query_rgb", inp=torch.from_numpy(inp),
                              feat=feat_t, coord=coord, cell=cell,
                              temperature=0.0)

        params = cv.convert_linf(
            net.state_dict(), "edsr-baseline",
            {"n_resblocks": 2, "n_feats": 8, "no_upsampling": True},
            flow_layers=3, num_layer=2)
        ours = registry.make({"name": "linf", "args": {
            "encoder_spec": {"name": "edsr-baseline",
                             "args": {"n_resblocks": 2, "n_feats": 8,
                                      "no_upsampling": True}},
            "imnet_spec": {"name": "flow", "args": {"name": "flow"}},
            "flow_layers": 3, "num_layer": 2, "hidden_dim": 16}})
        ours.load_params(params)

        inp_j = jnp.asarray(np.transpose(inp, (0, 2, 3, 1)))
        coord_j = jnp.asarray(coord.numpy())
        cell_j = jnp.asarray(cell.numpy())
        feat = ours.gen_feat(params, inp_j)
        z_j = jnp.asarray(np.transpose(z, (0, 2, 3, 1)))
        pred = ours.query_rgb(params, inp_j, feat, coord_j, cell_j, zmap=z_j)
        np.testing.assert_allclose(
            np.transpose(np.asarray(pred), (0, 3, 1, 2)), pred_ref.numpy(),
            atol=1e-3)
        # ours t=0 via the sampling path (zeros draw)
        pred_t0 = ours.query_rgb(params, inp_j, feat, coord_j, cell_j,
                                 temperature=0.0, key=jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            np.transpose(np.asarray(pred_t0), (0, 3, 1, 2)),
            pred_ref_t0.numpy(), atol=1e-3)


@needs_ref
def test_srflow_heat_parity_vs_torch_matched_epses(rng):
    """SRFlow decode at heat>0 with the SAME injected epses (z and split
    eps drawn once at scale heat) must match the torch reference."""
    from test_convert_srflow import OPT, _build_oracle, _build_ours
    from bfsr_tpu.convert import torch_import as cv

    net = _build_oracle()
    ours = _build_ours()
    params = cv.convert_srflow(net.state_dict(), ours.plan, nb=4, scale=4)
    ours.load_params(params)

    lr = rng.random((1, 3, 8, 8)).astype(np.float32)
    heat = 0.75
    # epses shapes for scale=4, L=3, split@level1: eps0 (1,6,H/2,W/2),
    # z (1,96,H/8,W/8) with H=W=32
    eps0 = (rng.standard_normal((1, 6, 16, 16)) * heat).astype(np.float32)
    z = (rng.standard_normal((1, 96, 4, 4)) * heat).astype(np.float32)
    with torch.no_grad():
        sr_ref, _ = net(lr=torch.from_numpy(lr),
                        epses=[torch.from_numpy(eps0), torch.from_numpy(z)],
                        reverse=True, eps_std=heat, add_gt_noise=False)

    def _nhwc(x):
        return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))

    sr, _ = ours.reverse_flow(params, _nhwc(lr),
                              epses=[_nhwc(eps0), _nhwc(z)],
                              add_gt_noise=False)
    np.testing.assert_allclose(
        np.transpose(np.asarray(sr), (0, 3, 1, 2)), sr_ref.numpy(), atol=5e-3)


def test_srflow_sample_sr_heat_determinism(rng):
    """sample_sr at heat>0: same seed -> identical, different seed ->
    different samples; the cached jit path must not leak state."""
    from bfsr_tpu.pipelines.srflow_eval import sample_sr

    m = registry.make({"name": "srflow",
                       "args": {"nf": 8, "nb": 2, "gc": 4, "K": 2, "L": 3,
                                "hidden_channels": 8,
                                "stack_blocks": (0, 1)}}).freeze()
    lr = rng.random((8, 8, 3)).astype(np.float32)
    a = sample_sr(m, lr, heat=0.8, seed=0)
    b = sample_sr(m, lr, heat=0.8, seed=0)
    c = sample_sr(m, lr, heat=0.8, seed=1)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.shape == (32, 32, 3) and np.isfinite(a).all()
