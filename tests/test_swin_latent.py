"""Swin latent module golden parity vs the reference swin_transformer."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from ref_oracle import linf_modules, reference_available, patch_cuda_noop  # noqa: E402
from bfsr_tpu.convert import torch_import as cv  # noqa: E402
from bfsr_tpu.models.swin_latent import swin_latent_apply  # noqa: E402

pytestmark = pytest.mark.skipif(not reference_available(), reason="no reference mount")


def test_swin_latent_parity(rng):
    patch_cuda_noop()
    with linf_modules("swin_transformer") as m:
        torch.manual_seed(0)
        net = m["swin_transformer"].make_swin_prior(in_chans=3, window_size=7)
        net.eval()
        z = rng.random((1, 3, 10, 12)).astype(np.float32)
        lr = rng.random((1, 3, 6, 6)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(z), torch.from_numpy(lr)).numpy()

    params = cv.convert_swin_latent(net.state_dict())
    ours = swin_latent_apply(
        params,
        jnp.asarray(np.transpose(z, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(lr, (0, 2, 3, 1))),
        window_size=7,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, atol=5e-5
    )


def test_swin_latent_registry(rng):
    import bfsr_tpu.models  # noqa: F401
    from bfsr_tpu import registry

    m = registry.make({"name": "swin_latent", "args": {"in_chans": 3}})
    z = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    lr = jnp.asarray(rng.random((1, 4, 4, 3)).astype(np.float32))
    out = m(z, lr)
    assert out.shape == (1, 8, 8, 3)
