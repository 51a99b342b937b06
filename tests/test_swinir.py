"""SwinIR golden parity against the reference torch module (timm stubbed)."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from ref_oracle import linf_modules, reference_available  # noqa: E402
from bfsr_tpu.convert import torch_import as cv  # noqa: E402
from bfsr_tpu.models.swinir import swinir_encode, init_swinir  # noqa: E402

pytestmark = pytest.mark.skipif(not reference_available(), reason="no reference mount")


def test_swinir_parity_small(rng):
    """Tiny SwinIR (2 layers x depth 2, dim 16, window 4) full parity."""
    with linf_modules("swinir") as m:
        torch.manual_seed(0)
        net = m["swinir"].SwinIR(
            img_size=16, embed_dim=16, depths=[2, 2], num_heads=[2, 2],
            window_size=4, mlp_ratio=2.0, upsampler="none",
        )
        net.eval()
        x = rng.random((1, 3, 12, 14)).astype(np.float32)  # forces window pad
        with torch.no_grad():
            ref = net(torch.from_numpy(x)).numpy()

    params = cv.convert_swinir(net.state_dict(), depths=(2, 2))
    ours = swinir_encode(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                         depths=(2, 2), num_heads=(2, 2), window_size=4)
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, atol=3e-5
    )


def test_swinir_shifted_window_parity(rng):
    """Deeper stack exercising shifted windows + mask on a window-multiple."""
    with linf_modules("swinir") as m:
        torch.manual_seed(1)
        net = m["swinir"].SwinIR(
            img_size=16, embed_dim=8, depths=[3], num_heads=[2],
            window_size=4, mlp_ratio=1.0, upsampler="none",
        )
        net.eval()
        x = rng.random((2, 3, 16, 16)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(x)).numpy()
    params = cv.convert_swinir(net.state_dict(), depths=(3,))
    ours = swinir_encode(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                         depths=(3,), num_heads=(2,), window_size=4)
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, atol=3e-5
    )


def test_swinir_registry_build(rng):
    import bfsr_tpu.models  # noqa: F401
    from bfsr_tpu import registry

    m = registry.make({"name": "swinir", "args": {}})
    assert m.out_dim == 64
