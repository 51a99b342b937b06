"""LINF's per-query pointwise flow (reference: LINF-LP/models/flow.py).

The flow maps a d = 3*ps^2 dimensional RGB(-patch) residual through
``n_layers`` blocks of (dense linear -> conditional elementwise affine) plus
a final dense linear.  The affine parameters come from the Fourier-feature
MLP, packed per query as ``[scale_0, shift_0, ..., scale_{L-1}, shift_{L-1}]``
with each chunk of size d (flow.py:31-49: per-layer slice ``6*ps^2`` =
scale(3ps^2) + shift(3ps^2)).

TPU-first design decisions vs the reference:

* Weights are stacked: one (L+1, d, d) tensor instead of a ModuleList, so
  the whole chain unrolls into a single fused XLA computation per tile.
* Inference inverses use cached ``w_inv`` (computed once, f64, at load time)
  instead of the reference's ``torch.linalg.solve`` per chunk per layer
  (flow.py:120) — frozen weights make the solve dead weight.
* log|det W| is likewise cached; when absent (e.g. while training the flow
  itself) it is computed with ``jnp.linalg.slogdet`` under jit.
* All math runs f32 regardless of input dtype (log-det paths must not drop
  to bf16).

Parameter pytree::

    {'w': (L+1, d, d),   # torch layout: y = x @ w[i].T + b[i]
     'b': (L+1, d),
     # optional frozen-inference cache:
     'w_inv': (L+1, d, d), 'logabsdet': (L+1,)}
"""

import jax
import jax.numpy as jnp
import numpy as np

from bfsr_tpu.ops.flows import LOG2PI

AFFINE_EPS = 1e-4


def init_pointwise_flow(key, n_layers=10, patch_size=1):
    """Uniform(-1/sqrt(8), 1/sqrt(8)) weight init, zero bias
    (flow.py:90-94)."""
    d = 3 * patch_size * patch_size
    stdv = 1.0 / np.sqrt(8)
    w = jax.random.uniform(key, (n_layers + 1, d, d), minval=-stdv, maxval=stdv)
    return {"w": w.astype(jnp.float32), "b": jnp.zeros((n_layers + 1, d), jnp.float32)}


def cache_inverses(params):
    """Host-side: attach f64-grade inverse + slogdet cache for frozen use."""
    w = np.asarray(params["w"], dtype=np.float64)
    w_inv = np.linalg.inv(w)
    logabsdet = np.linalg.slogdet(w)[1]
    out = dict(params)
    out["w_inv"] = jnp.asarray(w_inv, jnp.float32)
    out["logabsdet"] = jnp.asarray(logabsdet, jnp.float32)
    return out


def _matmul_t(x, w):
    """x @ w.T with w (d, d) torch-layout.

    For small d (the pixel model's d=3) an MXU dot wastes 125/128 lanes;
    unrolled scalar-vector FMAs run on the VPU and fuse with the
    surrounding elementwise affine chain.
    """
    d = w.shape[-1]
    if d <= 4:
        cols = [
            sum(x[..., i] * w[o, i] for i in range(d))
            for o in range(d)
        ]
        return jnp.stack(cols, axis=-1)
    return jnp.dot(x, w.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _affine_params(affine_info, i, d):
    """Layer i's (scale, shift), each (N, d), from (N, L*2d) packed info."""
    chunk = jax.lax.dynamic_slice_in_dim(affine_info, i * 2 * d, 2 * d, axis=-1)
    s, t = chunk[..., :d], chunk[..., d:]
    scale = jax.nn.sigmoid(s + 2.0) + AFFINE_EPS
    return scale, t


def forward(params, x, affine_info):
    """x: (N, d) residual; affine_info: (N, n_layers*2d).

    Returns (z, log_p) with log_p: (N,) — total log-det plus standard-normal
    base log-prob (flow.py:44-55).
    """
    x = x.astype(jnp.float32)
    affine_info = affine_info.astype(jnp.float32)
    n_layers = params["w"].shape[0] - 1
    d = params["w"].shape[-1]
    if "logabsdet" in params:
        lad = params["logabsdet"].astype(jnp.float32)
    else:
        lad = jnp.linalg.slogdet(params["w"].astype(jnp.float32))[1]

    z = x
    total = jnp.zeros(x.shape[:-1], jnp.float32)
    for i in range(n_layers):
        z = _matmul_t(z, params["w"][i]) + params["b"][i]
        total = total + lad[i]
        scale, shift = _affine_params(affine_info, i, d)
        z = z * scale + shift
        total = total + jnp.sum(jnp.log(scale), axis=-1)
    z = _matmul_t(z, params["w"][n_layers]) + params["b"][n_layers]
    total = total + lad[n_layers]
    total = total + jnp.sum(-0.5 * (z ** 2 + LOG2PI), axis=-1)
    return z, total


def inverse(params, z, affine_info):
    """Inverse map z -> x; (N, d) x (N, L*2d) -> (N, d) (flow.py:57-63)."""
    z = z.astype(jnp.float32)
    affine_info = affine_info.astype(jnp.float32)
    n_layers = params["w"].shape[0] - 1
    d = params["w"].shape[-1]
    if "w_inv" in params:
        w_inv = params["w_inv"].astype(jnp.float32)

        def lin_inv(i, x):
            return _matmul_t(x - params["b"][i], w_inv[i])
    else:
        def lin_inv(i, x):
            # training-the-flow fallback: direct solve (differentiable)
            sol = jnp.linalg.solve(params["w"][i].astype(jnp.float32), (x - params["b"][i]).T)
            return sol.T

    x = lin_inv(n_layers, z)
    for i in reversed(range(n_layers)):
        scale, shift = _affine_params(affine_info, i, d)
        x = (x - shift) / scale
        x = lin_inv(i, x)
    return x
