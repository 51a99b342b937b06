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


def test_swinir_training_stochastic_depth(rng):
    """Training mode (r4): drop_path with the reference decay rule
    linspace(0, 0.1, sum(depths)) (swinir.py:653,705) — stochastic with a
    key, deterministic and identical-to-eval without one."""
    import jax

    p = init_swinir(jax.random.PRNGKey(0), embed_dim=16, depths=(2, 2),
                    num_heads=(2, 2), window_size=4, mlp_ratio=2.0,
                    num_feat=8)
    x = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    kw = dict(depths=(2, 2), num_heads=(2, 2), window_size=4)
    e1 = swinir_encode(p, x, **kw)
    e2 = swinir_encode(p, x, **kw, key=None)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    t1 = swinir_encode(p, x, **kw, key=jax.random.PRNGKey(1))
    t2 = swinir_encode(p, x, **kw, key=jax.random.PRNGKey(5))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
    # rate-0 everywhere degrades to eval even with a key
    t0 = swinir_encode(p, x, **kw, key=jax.random.PRNGKey(1),
                       drop_path_rate=0.0)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(e1))
    # Model.apply threads training/key the same way
    from bfsr_tpu import registry
    import bfsr_tpu.models  # noqa: F401

    m = registry.make({"name": "swinir", "args": {
        "embed_dim": 16, "depths": (2, 2), "num_heads": (2, 2),
        "window_size": 4, "mlp_ratio": 2.0, "num_feat": 8}})
    a1 = m.apply(m.params, x, training=True, key=jax.random.PRNGKey(1))
    a2 = m.apply(m.params, x, training=True)  # no key -> deterministic
    a3 = m.apply(m.params, x)
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(a3))
    assert not np.allclose(np.asarray(a1), np.asarray(a3))
