"""Golden parity for the remaining encoder converters: RDN, EDSR with
upsampling tail, RRDB with upsampling head."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from ref_oracle import linf_modules, reference_available  # noqa: E402
from bfsr_tpu.convert import torch_import as cv  # noqa: E402
from bfsr_tpu.models.rdn import rdn_apply  # noqa: E402
from bfsr_tpu.models.edsr import edsr_apply  # noqa: E402

pytestmark = pytest.mark.skipif(not reference_available(), reason="no reference mount")


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _t(o):
    return np.transpose(np.asarray(o), (0, 3, 1, 2))


def test_rdn_parity(rng):
    with linf_modules("rdn") as m:
        torch.manual_seed(0)
        net = m["rdn"].make_rdn(G0=8, RDNconfig="A", no_upsampling=True)
        net.eval()
        x = rng.random((1, 3, 9, 11)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(x)).numpy()
    params = cv.convert_rdn(net.state_dict(), config="A", no_upsampling=True)
    ours = rdn_apply(params, _nhwc(x), config="A", no_upsampling=True)
    np.testing.assert_allclose(_t(ours), ref, atol=2e-5)


def test_rdn_upsampling_parity(rng):
    with linf_modules("rdn") as m:
        torch.manual_seed(1)
        net = m["rdn"].make_rdn(G0=8, RDNconfig="A", scale=4, no_upsampling=False)
        net.eval()
        x = rng.random((1, 3, 6, 6)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(x)).numpy()
    params = cv.convert_rdn(net.state_dict(), config="A", no_upsampling=False)
    ours = rdn_apply(params, _nhwc(x), config="A", scale=4, no_upsampling=False)
    np.testing.assert_allclose(_t(ours), ref, atol=2e-5)


def test_edsr_with_tail_parity(rng):
    with linf_modules("edsr") as m:
        torch.manual_seed(2)
        net = m["edsr"].make_edsr_baseline(n_resblocks=2, n_feats=8, scale=4,
                                           no_upsampling=False)
        net.eval()
        x = rng.random((1, 3, 7, 5)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(x)).numpy()
    params = cv.convert_edsr(net.state_dict(), n_resblocks=2, no_upsampling=False)
    ours = edsr_apply(params, _nhwc(x), no_upsampling=False, scale=4)
    np.testing.assert_allclose(_t(ours), ref, atol=2e-5)


def test_rrdb_with_upsampling_parity(rng):
    with linf_modules("rrdb") as m:
        torch.manual_seed(3)
        net = m["rrdb"].make_rrdb(nf=8, nb=2, gc=4, no_upsampling=False)
        net.eval()
        x = rng.random((1, 3, 6, 6)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(x)).numpy()
    import bfsr_tpu.models  # noqa: F401
    from bfsr_tpu import registry

    ours_model = registry.make({"name": "rrdb",
                                "args": {"nf": 8, "nb": 2, "gc": 4,
                                         "no_upsampling": False}})
    params = cv.convert_rrdb(net.state_dict(), nb=2, upsampling=True)
    ours_model.load_params(params)
    ours = ours_model(_nhwc(x))
    np.testing.assert_allclose(_t(ours), ref, atol=3e-5)


def test_mlp_parity(rng):
    """MLP (A12) numeric parity vs the reference torch module
    (LINF-LP/models/mlp.py:6) — round-2 verdict Weak #7."""
    with linf_modules("mlp") as m:
        torch.manual_seed(4)
        net = m["mlp"].MLP(in_dim=5, out_dim=4, hidden_list=[16, 8])
        net.eval()
        x = rng.random((2, 7, 5)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(x)).numpy()
    import bfsr_tpu.models  # noqa: F401
    from bfsr_tpu import registry

    ours_model = registry.make({"name": "mlp",
                                "args": {"in_dim": 5, "out_dim": 4,
                                         "hidden_list": [16, 8]}})
    ours_model.load_params(cv.convert_mlp(net.state_dict()))
    ours = ours_model(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)
