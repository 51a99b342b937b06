"""LPIPS perceptual metric (AlexNet backbone), matching the published
`lpips` package architecture the reference evaluates with
(LINF-LP/test.py:87, SRFlow-LP/code/Measure.py:32-44).

Structure: fixed input scaling -> AlexNet conv features tapped after each
of the 5 ReLUs -> per-tap channel-unit-normalize -> squared difference ->
learned non-negative 1x1 "lin" heads -> spatial mean -> sum over taps.

Pretrained weights are not bundled (no torchvision/lpips in the image and
zero egress); convert once from a torch LPIPS state dict with
``convert_lpips`` and load via ``load_lpips``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bfsr_tpu.ops import nn as fnn

# lpips.ScalingLayer constants (published)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet features: (out_c, kernel, stride, pad); 'M' = maxpool 3x3 s2
_ALEX_CFG = [
    (64, 11, 4, 2), "R", "M",
    (192, 5, 1, 2), "R", "M",
    (384, 3, 1, 1), "R",
    (256, 3, 1, 1), "R",
    (256, 3, 1, 1), "R",
]
_TAP_CHANNELS = [64, 192, 384, 256, 256]


def init_lpips(key):
    convs = []
    cin = 3
    for item in _ALEX_CFG:
        if isinstance(item, tuple):
            cout, k, s, p = item
            key, sub = jax.random.split(key)
            convs.append(fnn.init_conv(sub, k, k, cin, cout))
            cin = cout
    lins = [jnp.zeros((c, 1), jnp.float32) + 1.0 / c for c in _TAP_CHANNELS]
    return {"convs": convs, "lins": lins}


def _alex_taps(params, x):
    taps = []
    ci = 0
    for item in _ALEX_CFG:
        if isinstance(item, tuple):
            _, k, s, p = item
            x = fnn.conv2d(x, params["convs"][ci], stride=s, padding=p)
            ci += 1
        elif item == "R":
            x = fnn.relu(x)
            taps.append(x)
        else:  # maxpool 3x3 stride 2
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
    return taps


def lpips_distance(params, a, b):
    """a, b: (B, H, W, 3) in [-1, 1].  Returns (B,) distances."""
    a = (a - _SHIFT) / _SCALE
    b = (b - _SHIFT) / _SCALE
    taps_a = _alex_taps(params, a)
    taps_b = _alex_taps(params, b)
    total = 0.0
    for ta, tb, lin in zip(taps_a, taps_b, params["lins"]):
        na = ta * jax.lax.rsqrt(jnp.sum(ta ** 2, -1, keepdims=True) + 1e-10)
        nb = tb * jax.lax.rsqrt(jnp.sum(tb ** 2, -1, keepdims=True) + 1e-10)
        diff = (na - nb) ** 2
        val = jnp.einsum("bhwc,co->bhwo", diff, lin)
        total = total + jnp.mean(val, axis=(1, 2, 3))
    return total


class LPIPS:
    """Callable metric on numpy arrays in [-1, 1] NHWC."""

    def __init__(self, params=None):
        self.params = params if params is not None else init_lpips(jax.random.PRNGKey(0))
        self._fn = jax.jit(lpips_distance)

    def __call__(self, a, b):
        out = self._fn(self.params, jnp.asarray(a, jnp.float32),
                       jnp.asarray(b, jnp.float32))
        return float(jnp.mean(out))


def convert_lpips(sd):
    """Convert a torch `lpips.LPIPS(net='alex')` state dict.

    Keys: net.slice{1..5}.{idx}.weight/bias (AlexNet convs, torchvision
    indexing) and lin{0..4}.model.1.weight (1x1 non-negative heads)."""
    from bfsr_tpu.convert.torch_import import _np

    conv_keys = sorted(
        (k for k in sd if k.startswith("net.") and k.endswith(".weight")),
        key=lambda k: (int(k.split(".")[1][5:]), int(k.split(".")[2])),
    )
    convs = []
    for k in conv_keys:
        b = k[: -len("weight")] + "bias"
        convs.append({
            "w": jnp.asarray(_np(sd[k]).transpose(2, 3, 1, 0)),
            "b": jnp.asarray(_np(sd[b])),
        })
    lins = []
    for i in range(5):
        w = _np(sd[f"lin{i}.model.1.weight"])  # (1, C, 1, 1)
        lins.append(jnp.asarray(w.reshape(w.shape[1], 1)))
    return {"convs": convs, "lins": lins}


def load_lpips(path):
    """Load LPIPS weights from a converted .ckpt or a torch .pth/.pt."""
    if path.endswith((".pth", ".pt")):
        from bfsr_tpu.convert.torch_import import load_torch_checkpoint

        return LPIPS(convert_lpips(load_torch_checkpoint(path)))
    from bfsr_tpu.train.checkpoints import load_checkpoint

    return LPIPS(load_checkpoint(path))
