"""Fused affine-info kernel vs the XLA separable-grid reference."""

import jax
import jax.numpy as jnp
import numpy as np

import bfsr_tpu.models  # noqa: F401
from bfsr_tpu.models.linf import linf_affine_info_grid
from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.ops.pallas.linf_info import fused_affine_info_cm
from bfsr_tpu.utils.coords import make_coord_np, make_cell

from test_pipelines import small_linf


def _setup(rng, h=6, w=7, s=4, W_override=None):
    m = small_linf()
    H = h * s
    W = W_override or w * s
    inp = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))
    feat = m.gen_feat(m.params, inp)
    coord = make_coord_np((H, W), flatten=False)
    cy = jnp.asarray(coord[:, 0, 0])
    cx = jnp.asarray(coord[0, :, 1])
    cell = jnp.asarray(make_cell((H, W))[None])
    return m, feat, cy, cx, cell, H, W


def test_fused_info_matches_reference(rng):
    m, feat, cy, cx, cell, H, W = _setup(rng, h=6, w=7, s=4, W_override=128)
    params = m.params
    ref = linf_affine_info_grid(params, feat, cy[None], cx[None], cell,
                                m.hidden_dim)  # (1, H, W, 60)
    coef = fnn.conv2d(feat, params["coef"])
    freq = fnn.conv2d(feat, params["freq"])
    out_cm = fused_affine_info_cm(params, coef, freq, cy, cx, cell,
                                  m.hidden_dim, interpret=True)
    got = np.asarray(out_cm)[: ref.shape[-1]].T.reshape(H, W, -1)
    np.testing.assert_allclose(got, np.asarray(ref)[0], atol=2e-4, rtol=1e-4)
    rows_out = max(-(-ref.shape[-1] // 8) * 8, 8)
    assert out_cm.shape == (rows_out, H * W)


def test_fused_info_tall_lr(rng):
    """LR taller than R_MAX exercises the DMA row-window clamping."""
    m, feat, cy, cx, cell, H, W = _setup(rng, h=24, w=5, s=2, W_override=256)
    params = m.params
    ref = linf_affine_info_grid(params, feat, cy[None], cx[None], cell,
                                m.hidden_dim)
    coef = fnn.conv2d(feat, params["coef"])
    freq = fnn.conv2d(feat, params["freq"])
    out_cm = fused_affine_info_cm(params, coef, freq, cy, cx, cell,
                                  m.hidden_dim, interpret=True)
    got = np.asarray(out_cm)[: ref.shape[-1]].T.reshape(H, W, -1)
    np.testing.assert_allclose(got, np.asarray(ref)[0], atol=2e-4, rtol=1e-4)
