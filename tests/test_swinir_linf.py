"""SwinIR-encoder-inside-LINF end-to-end golden parity (r3 verdict #4).

The composition point the per-module tests miss: SwinIR's self-padding
(reflect to a window multiple, swinir.py:790-821,862) interacting with
LINF's coordinate/cell conditioning.  Exercised at a shape that forces the
window pad on both axes, plus the eval protocol's own window pad
(reference test.py:99-107) on top.
"""

import contextlib

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from ref_oracle import linf_modules, reference_available, patch_cuda_noop  # noqa: E402
from bfsr_tpu.convert import torch_import as cv  # noqa: E402

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="no reference mount")

SWIN_ARGS = {"embed_dim": 16, "depths": (2, 2), "num_heads": (2, 2),
             "window_size": 4, "mlp_ratio": 2.0, "num_feat": 64}


@contextlib.contextmanager
def _build_pair(rng):
    """Yields (reference torch LINF with a small SwinIR encoder, our
    converted twin, the reference utils module) inside the oracle
    context."""
    patch_cuda_noop()
    with linf_modules("swinir", "flow", "linf") as m:
        torch.manual_seed(0)
        # the reference registry's 'swinir' is the fixed full-size model
        # (swinir.py:862-864); build LINF around a small one by
        # constructing the encoder first and grafting it in before the
        # heads are sized (LINF reads encoder.out_dim at init, linf.py:19)
        from models import models as ref_reg

        enc = m["swinir"].SwinIR(img_size=16, upsampler="none",
                                 embed_dim=SWIN_ARGS["embed_dim"],
                                 depths=list(SWIN_ARGS["depths"]),
                                 num_heads=list(SWIN_ARGS["num_heads"]),
                                 window_size=SWIN_ARGS["window_size"],
                                 mlp_ratio=SWIN_ARGS["mlp_ratio"])
        # num_feat is HARDCODED to 64 in the reference ctor
        # (swinir.py:660) — our twin mirrors it via SWIN_ARGS

        def _make_small(**_kw):
            return enc

        old = ref_reg.models["swinir"]
        ref_reg.models["swinir"] = _make_small
        try:
            net = m["linf"].LINF(
                encoder_spec={"name": "swinir", "args": {}},
                imnet_spec={"name": "flow", "args": {"name": "flow"}},
                flow_layers=3, num_layer=2, hidden_dim=16,
            )
        finally:
            ref_reg.models["swinir"] = old
        net.eval()

        import bfsr_tpu.models  # noqa: F401
        from bfsr_tpu import registry
        import utils as ref_utils

        sd = net.state_dict()
        enc_p = cv.convert_linf(sd, "swinir", {"depths": SWIN_ARGS["depths"]},
                                flow_layers=3, num_layer=2)
        ours = registry.make({"name": "linf", "args": {
            "encoder_spec": {"name": "swinir", "args": dict(
                SWIN_ARGS, no_upsampling=True)},
            "imnet_spec": {"name": "flow", "args": {"name": "flow"}},
            "flow_layers": 3, "num_layer": 2, "hidden_dim": 16}})
        ours.load_params(enc_p)
        ours.freeze()
        yield net, ours, ref_utils


def test_swinir_linf_full_parity(rng):
    """gen_feat -> query_log_p -> query_rgb through the SwinIR encoder at
    a non-window-multiple LR shape (10x11 with window 4)."""
    with _build_pair(rng) as (net, ours, ref_utils):
        _full_parity_body(net, ours, ref_utils, rng)


def _full_parity_body(net, ours, ref_utils, rng):
    B, h, w, s = 1, 10, 11, 2
    H, W = h * s, w * s
    inp = rng.random((B, 3, h, w)).astype(np.float32)
    gt = (rng.random((B, 3, H, W)) - 0.5).astype(np.float32)
    coord = ref_utils.make_coord((H, W), flatten=False).unsqueeze(0)
    cell = torch.tensor([[2.0 / H, 2.0 / W]], dtype=torch.float32)
    with torch.no_grad():
        feat_t = net("gen_feat", inp=torch.from_numpy(inp))
        _, z_ref = net("query_log_p", inp=torch.from_numpy(inp), feat=feat_t,
                       coord=coord, cell=cell, gt=torch.from_numpy(gt))
        pred_ref = net("query_rgb", inp=torch.from_numpy(inp), feat=feat_t,
                       coord=coord, cell=cell, zmap=z_ref)

    from bfsr_tpu.utils.coords import make_coord_np

    inp_j = jnp.asarray(np.transpose(inp, (0, 2, 3, 1)))
    gt_j = jnp.asarray(np.transpose(gt, (0, 2, 3, 1)))
    coord_j = jnp.asarray(make_coord_np((H, W), flatten=False))[None]
    cell_j = jnp.asarray([[2.0 / H, 2.0 / W]], jnp.float32)
    feat = ours.gen_feat(ours.params, inp_j)
    _, z = ours.query_log_p(ours.params, inp_j, feat, coord_j, cell_j, gt_j)
    pred = ours.query_rgb(ours.params, inp_j, feat, coord_j, cell_j, zmap=z)
    np.testing.assert_allclose(
        np.transpose(np.asarray(z), (0, 3, 1, 2)), z_ref.numpy(), atol=5e-4)
    np.testing.assert_allclose(
        np.transpose(np.asarray(pred), (0, 3, 1, 2)), pred_ref.numpy(),
        atol=1e-3)


def test_swinir_linf_window_protocol(rng):
    """The --window eval protocol around the SwinIR encoder: reflect-pad
    LR to a window multiple, query the padded HR grid, crop — both sides
    (reference test.py:99-107 mechanics)."""
    with _build_pair(rng) as (net, ours, ref_utils):
        _window_protocol_body(net, ours, ref_utils, rng)


def _window_protocol_body(net, ours, ref_utils, rng):
    ws, s = 4, 2
    h_old, w_old = 10, 11
    inp = rng.random((1, 3, h_old, w_old)).astype(np.float32)
    # reference-side protocol
    it = torch.from_numpy(inp)
    h_pad = (h_old // ws + 1) * ws - h_old
    w_pad = (w_old // ws + 1) * ws - w_old
    it = torch.cat([it, torch.flip(it, [2])], dim=2)[:, :, : h_old + h_pad]
    it = torch.cat([it, torch.flip(it, [3])], dim=3)[:, :, :, : w_old + w_pad]
    Hp, Wp = it.shape[2] * s, it.shape[3] * s
    coord = ref_utils.make_coord((Hp, Wp), flatten=False).unsqueeze(0)
    cell = torch.tensor([[2.0 / Hp, 2.0 / Wp]], dtype=torch.float32)
    with torch.no_grad():
        feat_t = net("gen_feat", inp=it)
        z0 = torch.zeros(1, 3, Hp, Wp)
        pred_ref = net("query_rgb", inp=it, feat=feat_t, coord=coord,
                       cell=cell, zmap=z0)
    # reference maps are NCHW
    pred_ref = pred_ref.permute(0, 2, 3, 1)[:, : h_old * s, : w_old * s]

    # ours through the shipped predictor path
    from bfsr_tpu.pipelines.linf_eval import LINFPredictor
    from bfsr_tpu.utils.coords import make_coord_np

    predictor = LINFPredictor(ours, None, tile_queries=2048)
    inp_np = np.transpose(inp, (0, 2, 3, 1))
    ip = np.concatenate([inp_np, inp_np[:, ::-1]], axis=1)[:, : h_old + h_pad]
    ip = np.concatenate([ip, ip[:, :, ::-1]], axis=2)[:, :, : w_old + w_pad]
    coord_j = jnp.asarray(make_coord_np((Hp, Wp), flatten=False))[None]
    cell_j = jnp.asarray([[2.0 / Hp, 2.0 / Wp]], jnp.float32)
    pred = predictor.predict(ours.params, None, jnp.asarray(ip), coord_j,
                             cell_j, temperature=0.0)
    pred = np.asarray(pred)[:, : h_old * s, : w_old * s]
    np.testing.assert_allclose(pred, pred_ref.numpy(), atol=2e-4)
