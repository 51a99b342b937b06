"""Golden parity: convert randomly-initialized reference torch models and
compare forward outputs against our JAX implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from ref_oracle import linf_modules, reference_available, patch_cuda_noop  # noqa: E402
from bfsr_tpu.convert import torch_import as cv  # noqa: E402
from bfsr_tpu.models.edsr import edsr_apply  # noqa: E402
from bfsr_tpu.models.rrdb import rrdb_encode  # noqa: E402
from bfsr_tpu.models.unet import unet_apply  # noqa: E402
from bfsr_tpu.models.edsr_latent import edsr_latent_apply  # noqa: E402
from bfsr_tpu.ops import pointwise_flow as pwf  # noqa: E402

pytestmark = pytest.mark.skipif(not reference_available(), reason="no reference mount")


def _nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _from_t(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_edsr_parity(rng):
    with linf_modules("edsr") as m:
        net = m["edsr"].make_edsr_baseline(n_resblocks=3, n_feats=8, no_upsampling=True)
        net.eval()
        x = rng.random((1, 3, 10, 12)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(x)).numpy()
        params = cv.convert_edsr(net.state_dict(), n_resblocks=3, no_upsampling=True)
        ours = np.asarray(edsr_apply(params, _nhwc(x), no_upsampling=True))
        np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), ref, atol=2e-5)


def test_rrdb_parity(rng):
    with linf_modules("rrdb") as m:
        net = m["rrdb"].make_rrdb(nf=8, nb=2, gc=4, no_upsampling=True)
        net.eval()
        x = rng.random((1, 3, 9, 9)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(x)).numpy()
        params = cv.convert_rrdb(net.state_dict(), nb=2)
        ours = np.asarray(rrdb_encode(params, _nhwc(x)))
        np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), ref, atol=2e-5)


def test_pointwise_flow_parity(rng):
    torch.manual_seed(0)
    with linf_modules("flow") as m:
        net = m["flow"].Flow(flow_layers=4, patch_size=1)
        net.eval()
        # condition the random weights (trained checkpoints are
        # well-conditioned; near-singular random 3x3s make both inverses
        # meaningless)
        with torch.no_grad():
            for lin in list(net.linears) + [net.last]:
                lin._weight += torch.eye(3)
        n = 17
        x = rng.random((n, 3)).astype(np.float32)
        info = (rng.random((n, 4 * 6)) - 0.5).astype(np.float32)
        with torch.no_grad():
            z_ref, lp_ref = net(torch.from_numpy(x), torch.from_numpy(info))
            x_rec = net.inverse(z_ref, torch.from_numpy(info))
        params = cv.convert_pointwise_flow(net.state_dict(), n_layers=4, prefix="")
        z, lp = pwf.forward(params, jnp.asarray(x), jnp.asarray(info))
        np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(lp), lp_ref.numpy(), rtol=1e-4, atol=1e-4)
        # random-init weights are ill-conditioned; both inverses must recover
        # the original x (the parity criterion that matters for trained ckpts)
        x_inv = pwf.inverse(params, z, jnp.asarray(info))
        np.testing.assert_allclose(np.asarray(x_inv), x, atol=1e-4)
        np.testing.assert_allclose(np.asarray(x_inv), x_rec.numpy(), atol=1e-4)


def test_unet_parity(rng):
    with linf_modules("unet") as m:
        net = m["unet"].make_unet(in_chans=3, depth=2, dim=8, bilinear=True)
        net.eval()
        z = rng.random((1, 3, 12, 12)).astype(np.float32)
        lr = rng.random((1, 3, 6, 6)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(z), torch.from_numpy(lr)).numpy()
        params = cv.convert_unet(net.state_dict(), depth=2)
        ours = np.asarray(unet_apply(params, _nhwc(z), _nhwc(lr), depth=2))
        np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), ref, atol=3e-5)


def test_edsr_latent_parity(rng):
    with linf_modules("edsr_latent") as m:
        net = m["edsr_latent"].make_edsr_baseline(in_chans=3, n_resblocks=2, dim=8)
        net.eval()
        z = rng.random((1, 3, 9, 9)).astype(np.float32)
        lr = rng.random((1, 3, 5, 5)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(z), torch.from_numpy(lr)).numpy()
        params = cv.convert_edsr_latent(net.state_dict(), n_resblocks=2)
        ours = np.asarray(edsr_latent_apply(params, _nhwc(z), _nhwc(lr)))
        np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), ref, atol=3e-5)


def test_linf_full_parity(rng):
    """End-to-end LINF: query_log_p (z) and query_rgb (pred) golden parity."""
    patch_cuda_noop()
    with linf_modules("edsr", "flow", "linf") as m:
        net = m["linf"].LINF(
            encoder_spec={"name": "edsr-baseline",
                          "args": {"n_resblocks": 2, "n_feats": 8, "no_upsampling": True}},
            imnet_spec={"name": "flow", "args": {"name": "flow"}},
            flow_layers=3, num_layer=2, hidden_dim=16,
        )
        net.eval()
        B, h, w, s = 1, 5, 6, 2
        H, W = h * s, w * s
        inp = rng.random((B, 3, h, w)).astype(np.float32)
        gt = (rng.random((B, 3, H, W)) - 0.5).astype(np.float32)
        from models.models import make  # noqa: F401  (registry sanity)
        import utils as ref_utils

        coord = ref_utils.make_coord((H, W), flatten=False).unsqueeze(0)
        cell = torch.tensor([[2.0 / H, 2.0 / W]], dtype=torch.float32)
        with torch.no_grad():
            feat_t = net("gen_feat", inp=torch.from_numpy(inp))
            lp_ref, z_ref = net("query_log_p", inp=torch.from_numpy(inp), feat=feat_t,
                                coord=coord, cell=cell, gt=torch.from_numpy(gt))
            pred_ref = net("query_rgb", inp=torch.from_numpy(inp), feat=feat_t,
                           coord=coord, cell=cell, zmap=z_ref)

        # convert + run ours
        spec_args = {"encoder_spec": {"name": "edsr-baseline",
                                      "args": {"n_resblocks": 2, "n_feats": 8,
                                               "no_upsampling": True}},
                     "flow_layers": 3, "num_layer": 2}
        params = cv.convert_linf(net.state_dict(), "edsr-baseline",
                                 spec_args["encoder_spec"]["args"],
                                 flow_layers=3, num_layer=2)
        import bfsr_tpu.models  # noqa: F401
        from bfsr_tpu import registry

        ours_model = registry.make({"name": "linf", "args": {
            "encoder_spec": spec_args["encoder_spec"],
            "imnet_spec": {"name": "flow", "args": {"name": "flow"}},
            "flow_layers": 3, "num_layer": 2, "hidden_dim": 16}})
        ours_model.load_params(params)

        inp_j = _nhwc(inp)
        coord_j = jnp.asarray(coord.numpy())
        cell_j = jnp.asarray(cell.numpy())
        feat = ours_model.gen_feat(params, inp_j)
        np.testing.assert_allclose(
            np.transpose(np.asarray(feat), (0, 3, 1, 2)), feat_t.numpy(), atol=2e-5
        )
        lp, z = ours_model.query_log_p(params, inp_j, feat, coord_j, cell_j,
                                       _nhwc(gt))
        np.testing.assert_allclose(
            np.transpose(np.asarray(z), (0, 3, 1, 2)), z_ref.numpy(), atol=5e-4
        )
        np.testing.assert_allclose(np.asarray(lp), lp_ref.numpy(), rtol=2e-3, atol=2e-3)
        pred = ours_model.query_rgb(params, inp_j, feat, coord_j, cell_j, zmap=z)
        np.testing.assert_allclose(
            np.transpose(np.asarray(pred), (0, 3, 1, 2)), pred_ref.numpy(), atol=1e-3
        )


def test_rdn_parity(rng):
    """RDN encoder golden parity vs LINF-LP/models/rdn.py:116 (config A,
    both the no_upsampling feature path and the PixelShuffle upsampler)."""
    from bfsr_tpu.models.rdn import rdn_apply

    with linf_modules("rdn") as m:
        torch.manual_seed(0)
        net = m["rdn"].make_rdn(RDNconfig="A", no_upsampling=True)
        net.eval()
        x = rng.random((1, 3, 8, 7)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(x)).numpy()
        params = cv.convert_rdn(net.state_dict(), config="A", no_upsampling=True)
        ours = np.asarray(rdn_apply(params, _nhwc(x), config="A",
                                    no_upsampling=True))
        np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), ref, atol=3e-5)

        net_up = m["rdn"].make_rdn(RDNconfig="A", scale=2, no_upsampling=False)
        net_up.eval()
        with torch.no_grad():
            ref_up = net_up(torch.from_numpy(x)).numpy()
        params_up = cv.convert_rdn(net_up.state_dict(), config="A",
                                   no_upsampling=False)
        ours_up = np.asarray(rdn_apply(params_up, _nhwc(x), config="A", scale=2,
                                       no_upsampling=False))
        np.testing.assert_allclose(np.transpose(ours_up, (0, 3, 1, 2)), ref_up,
                                   atol=3e-5)


def test_linf_patch_full_parity(rng):
    """End-to-end LINFPatch (ps=3) golden parity vs linf.py:218-428:
    query_log_p (z + log_p through the 3*ps^2-dim flow and the
    flow_layers*ps^2*3*2-channel affine head), query_rgb with zmap
    (inverse + F.fold channel order), and the eval-time bilinear LR
    residual add (test.py:169-171)."""
    import torch.nn.functional as F

    patch_cuda_noop()
    with linf_modules("edsr", "flow", "linf") as m:
        torch.manual_seed(0)
        ps = 3
        net = m["linf"].LINFPatch(
            encoder_spec={"name": "edsr-baseline",
                          "args": {"n_resblocks": 2, "n_feats": 8,
                                   "no_upsampling": True}},
            imnet_spec={"name": "flow", "args": {"name": "flow"}},
            flow_layers=3, num_layer=2, hidden_dim=16, patch_size=ps,
        )
        net.eval()
        with torch.no_grad():
            for lin in list(net.imnet.linears) + [net.imnet.last]:
                lin._weight += torch.eye(3 * ps * ps)

        B, h, w = 1, 6, 5
        Hq, Wq = 4, 4  # query grid of patch centers
        inp = rng.random((B, 3, h, w)).astype(np.float32)
        gt = (rng.random((B, 3 * ps * ps, Hq, Wq)) - 0.5).astype(np.float32)
        import utils as ref_utils

        coord = ref_utils.make_coord((Hq * ps, Wq * ps), flatten=False)
        # patch-center coords: stride-ps unfold centers (wrappers.py:516-614)
        coord = coord[ps // 2::ps, ps // 2::ps].unsqueeze(0)
        cell = torch.tensor([[2.0 / (Hq * ps), 2.0 / (Wq * ps)]],
                            dtype=torch.float32)
        with torch.no_grad():
            feat_t = net("gen_feat", inp=torch.from_numpy(inp))
            lp_ref, z_ref = net("query_log_p", inp=torch.from_numpy(inp),
                                feat=feat_t, coord=coord, cell=cell,
                                gt=torch.from_numpy(gt))
            pred_ref = net("query_rgb", inp=torch.from_numpy(inp), feat=feat_t,
                           coord=coord, cell=cell, zmap=z_ref)
            final_ref = pred_ref + F.interpolate(
                torch.from_numpy(inp), size=pred_ref.shape[-2:],
                mode="bilinear", align_corners=False)

        enc_spec = {"name": "edsr-baseline",
                    "args": {"n_resblocks": 2, "n_feats": 8,
                             "no_upsampling": True}}
        params = cv.convert_linf(net.state_dict(), "edsr-baseline",
                                 enc_spec["args"], flow_layers=3, num_layer=2)
        import bfsr_tpu.models  # noqa: F401
        from bfsr_tpu import registry

        ours_model = registry.make({"name": "linf-patch", "args": {
            "encoder_spec": enc_spec,
            "imnet_spec": {"name": "flow", "args": {"name": "flow"}},
            "flow_layers": 3, "num_layer": 2, "hidden_dim": 16,
            "patch_size": ps}})
        ours_model.load_params(params)

        inp_j = _nhwc(inp)
        coord_j = jnp.asarray(coord.numpy())
        cell_j = jnp.asarray(cell.numpy())
        feat = ours_model.gen_feat(params, inp_j)
        lp, z = ours_model.query_log_p(params, inp_j, feat, coord_j, cell_j,
                                       _nhwc(gt))
        np.testing.assert_allclose(
            np.transpose(np.asarray(z), (0, 3, 1, 2)), z_ref.numpy(), atol=5e-4)
        np.testing.assert_allclose(np.asarray(lp), lp_ref.numpy(),
                                   rtol=2e-3, atol=2e-3)

        pred = ours_model.query_rgb(params, inp_j, feat, coord_j, cell_j, zmap=z)
        assert pred.shape == (B, Hq * ps, Wq * ps, 3)
        np.testing.assert_allclose(
            np.transpose(np.asarray(pred), (0, 3, 1, 2)), pred_ref.numpy(),
            atol=1e-3)

        # eval-time residual add (linf_eval.py patch branch vs test.py:169-171)
        from bfsr_tpu.data.np_interp import resize_bilinear_np

        final = np.asarray(pred) + resize_bilinear_np(
            np.asarray(inp_j[0]), pred.shape[1:3])[None]
        np.testing.assert_allclose(
            np.transpose(final, (0, 3, 1, 2)), final_ref.numpy(), atol=1e-3)
