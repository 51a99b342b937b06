"""Golden parity for the SRFlow stack: build the reference torch SRFlowNet
(random init), convert, and compare encode epses / nll and decode output.

Oracle config mirrors confs/SRFlow-LP_DF2K_4X.yml but with nb=4 RRDB blocks
and stackRRDB.blocks=[0,1,2,3] (still (4+1)*64 = 320 conditioning channels —
the coupling hard-codes 320, FlowAffineCouplingsAblation.py:30) and K=2
steps per level to keep CPU time sane.
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from ref_oracle import srflow_modules, reference_available  # noqa: E402
from bfsr_tpu.convert import torch_import as cv  # noqa: E402

pytestmark = pytest.mark.skipif(not reference_available(), reason="no reference mount")

OPT = {
    "scale": 4,
    "datasets": {"train": {"quant": 32}},
    "network_G": {
        "train_RRDB_delay": 0.5,
        "flow": {
            "K": 2,
            "L": 3,
            "noInitialInj": True,
            "coupling": "CondAffineSeparatedAndCond",
            "additionalFlowNoAffine": 2,
            "split": {"enable": True},
            "fea_up0": True,
            "stackRRDB": {"blocks": [0, 1, 2, 3], "concat": True},
        },
    },
}


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _build_oracle():
    with srflow_modules("models.modules.SRFlowNet_arch") as m:
        torch.manual_seed(0)
        net = m["models.modules.SRFlowNet_arch"].SRFlowNet(
            in_nc=3, out_nc=3, nf=64, nb=4, gc=32, scale=4, K=2, opt=OPT
        )
        net.eval()
        return net


def _build_ours():
    import bfsr_tpu.models  # noqa: F401
    from bfsr_tpu import registry

    return registry.make({
        "name": "srflow",
        "args": {"nf": 64, "nb": 4, "gc": 32, "scale": 4, "K": 2, "L": 3,
                 "additional_steps": 2, "stack_blocks": (0, 1, 2, 3),
                 "fea_up0": True, "quant": 32},
    })


def test_srflow_full_parity(rng):
    net = _build_oracle()
    ours = _build_ours()
    params = cv.convert_srflow(net.state_dict(), ours.plan, nb=4, scale=4)
    ours.load_params(params)

    lr = rng.random((1, 3, 8, 8)).astype(np.float32)
    gt = rng.random((1, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        epses_ref = []
        _, nll_ref, logdet_ref = net(gt=torch.from_numpy(gt), lr=torch.from_numpy(lr),
                                     reverse=False, epses=epses_ref, add_gt_noise=False)
        sr_ref, _ = net(lr=torch.from_numpy(lr),
                        epses=[e.clone() for e in epses_ref], reverse=True,
                        eps_std=0.0, add_gt_noise=False)

    epses, nll, logdet = ours.normal_flow(params, _nhwc(gt), _nhwc(lr),
                                          add_gt_noise=False)
    assert len(epses) == len(epses_ref) == 2
    for e_ours, e_ref in zip(epses, epses_ref):
        np.testing.assert_allclose(
            np.transpose(np.asarray(e_ours), (0, 3, 1, 2)), e_ref.numpy(),
            atol=2e-3,
        )
    np.testing.assert_allclose(np.asarray(nll), nll_ref.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(logdet), logdet_ref.numpy(), rtol=1e-3,
                               atol=0.5)

    sr, _ = ours.reverse_flow(params, _nhwc(lr), epses=epses, add_gt_noise=False)
    np.testing.assert_allclose(
        np.transpose(np.asarray(sr), (0, 3, 1, 2)), sr_ref.numpy(), atol=5e-3
    )
    # and the true roundtrip: decode(encode(gt)) == gt
    np.testing.assert_allclose(
        np.transpose(np.asarray(sr), (0, 3, 1, 2)), gt, atol=5e-3
    )


def test_srflow_unet_prior_parity(rng):
    with srflow_modules("models.unet") as m:
        torch.manual_seed(1)
        net = m["models.unet"].UNet(depth=2, dim=8)
        net.eval()
        eps0 = rng.random((1, 6, 16, 16)).astype(np.float32)
        z1 = rng.random((1, 96, 4, 4)).astype(np.float32)
        with torch.no_grad():
            ref = net([torch.from_numpy(eps0), torch.from_numpy(z1)])

    from bfsr_tpu.models.srflow.unet_prior import srflow_unet_apply

    params = cv.convert_srflow_unet(net.state_dict(), depth=2)
    out = srflow_unet_apply(params, [_nhwc(eps0), _nhwc(z1)], depth=2)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(
            np.transpose(np.asarray(o), (0, 3, 1, 2)), r.numpy(), atol=5e-5
        )
