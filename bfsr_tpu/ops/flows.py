"""Glow-style flow primitives (NHWC, functional, f32 log-dets).

These are the building blocks of the SRFlow conditional-flow stack
(reference modules: FlowActNorms.py, Permutations.py,
FlowAffineCouplingsAblation.py, Split.py, flow.py) re-designed as pure
functions with explicit ``(y, logdet)`` dataflow:

* every transform takes/returns NHWC activations,
* logdet is a per-sample ``(B,)`` f32 vector accumulated functionally,
* inverses never call a linear solver at runtime: the checkpoint loader
  precomputes ``w_inv``/``logabsdet`` for the frozen 1x1 convs (the reference
  calls ``torch.inverse(W.double())`` on every decode step,
  Permutations.py:41-42 — per-call O(C^3) work this design moves to load
  time).

Channel-ordering notes (decide checkpoint parity):

* ``squeeze2d`` matches torch's (C, fy, fx) channel nesting even though we
  are NHWC (flow.py:122-135).
* ``split_feature('cross')`` is the even/odd channel interleave
  (thops.py:52-61).
"""

import math

import jax
import jax.numpy as jnp

from bfsr_tpu.ops import nn as fnn

LOG2PI = math.log(2 * math.pi)
AFFINE_EPS = 1e-4


def _pixels(x):
    return x.shape[1] * x.shape[2]


# ---------------------------------------------------------------------------
# ActNorm
# ---------------------------------------------------------------------------


def actnorm(x, p, logdet=None, reverse=False):
    """Per-channel affine y = (x + bias) * exp(logs); p = {bias, logs} (C,).

    Data-dependent init is a checkpoint-conversion-time concern (the
    reference initializes from the first batch, FlowActNorms.py:45-59; our
    trainer primes it explicitly via ``actnorm_init_stats``).
    """
    bias = p["bias"].astype(jnp.float32)
    logs = p["logs"].astype(jnp.float32)
    if not reverse:
        y = (x + bias) * jnp.exp(logs)
    else:
        y = x * jnp.exp(-logs) - bias
    if logdet is not None:
        d = jnp.sum(logs) * _pixels(x)
        logdet = logdet + (-d if reverse else d)
    return y, logdet


def actnorm_init_stats(x):
    """Compute (bias, logs) that whiten x per channel (reference
    FlowActNorms.py:53-58)."""
    mean = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.mean((x - mean) ** 2, axis=(0, 1, 2))
    return {"bias": -mean, "logs": -jnp.log(jnp.sqrt(var) + 1e-6)}


# ---------------------------------------------------------------------------
# Invertible 1x1 convolution
# ---------------------------------------------------------------------------


def invconv1x1(x, p, logdet=None, reverse=False):
    """1x1 invertible conv.  p = {'w': (C, C) torch-layout (out, in),
    optional 'w_inv', 'logabsdet'}.

    Forward y_o = sum_i w[o, i] x_i  ==  x @ w.T in NHWC.
    """
    w = p["w"].astype(jnp.float32)
    if "logabsdet" in p:
        dlog = p["logabsdet"].astype(jnp.float32)
    else:
        dlog = jnp.linalg.slogdet(w)[1]
    hi = jax.lax.Precision.HIGHEST
    if not reverse:
        y = jnp.einsum("bhwi,oi->bhwo", x, w,
                       preferred_element_type=jnp.float32, precision=hi)
    else:
        w_inv = p.get("w_inv")
        if w_inv is None:
            w_inv = jnp.linalg.inv(w)
        y = jnp.einsum("bhwi,oi->bhwo", x, w_inv.astype(jnp.float32),
                       preferred_element_type=jnp.float32, precision=hi)
    if logdet is not None:
        d = dlog * _pixels(x)
        logdet = logdet + (-d if reverse else d)
    return y.astype(x.dtype), logdet


def invconv_cache(w):
    """Host-side cache for a frozen invconv weight: inverse + slogdet in
    f64 (mirrors the precision of the reference's double() inverse)."""
    import numpy as np

    w64 = np.asarray(w, dtype=np.float64)
    return {
        "w": jnp.asarray(w, jnp.float32),
        "w_inv": jnp.asarray(np.linalg.inv(w64), jnp.float32),
        "logabsdet": jnp.asarray(np.linalg.slogdet(w64)[1], jnp.float32),
    }


def fold_actnorm_invconv(an, inv):
    """Frozen-inference fusion of actnorm -> invconv into ONE affine
    matmul per direction (f64 on host):

      fwd:  y = ((x + b) * e) @ W^T        = x @ W_fold^T + b_fold
      rev:  x = (z @ W^-T) / e - b         = z @ Winv_fold^T - b

    with e = exp(logs).  The log-det of the pair is the constant
    ``(sum(logs) + log|det W|) * pixels``.  Saves one elementwise pass
    and one scalar reduction per flow step per pass."""
    import numpy as np

    e = np.exp(np.asarray(an["logs"], np.float64))
    b = np.asarray(an["bias"], np.float64)
    w = np.asarray(inv["w"], np.float64)
    w_inv = np.asarray(inv.get("w_inv", np.linalg.inv(w)), np.float64)
    w_fold = w * e[None, :]              # [o, i] * e_i
    return {
        "w_fold": jnp.asarray(w_fold, jnp.float32),
        "b_fold": jnp.asarray(w_fold @ b, jnp.float32),
        "w_inv_fold": jnp.asarray(w_inv / e[:, None], jnp.float32),
        "an_bias": jnp.asarray(b, jnp.float32),
        "logabsdet_fold": jnp.asarray(
            np.sum(np.asarray(an["logs"], np.float64))
            + np.linalg.slogdet(w)[1], jnp.float32),
    }


def an_invconv_fused(x, p, logdet=None, reverse=False):
    """Apply a folded actnorm+invconv pair (``fold_actnorm_invconv``)."""
    hi = jax.lax.Precision.HIGHEST
    if not reverse:
        y = jnp.einsum("bhwi,oi->bhwo", x, p["w_fold"],
                       preferred_element_type=jnp.float32,
                       precision=hi) + p["b_fold"]
    else:
        y = jnp.einsum("bhwi,oi->bhwo", x, p["w_inv_fold"],
                       preferred_element_type=jnp.float32,
                       precision=hi) - p["an_bias"]
    if logdet is not None:
        d = p["logabsdet_fold"].astype(jnp.float32) * _pixels(x)
        logdet = logdet + (-d if reverse else d)
    return y.astype(x.dtype), logdet


# ---------------------------------------------------------------------------
# squeeze / unsqueeze
# ---------------------------------------------------------------------------


def squeeze2d(x, factor=2):
    if factor == 1:
        return x
    B, H, W, C = x.shape
    x = x.reshape(B, H // factor, factor, W // factor, factor, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, H/f, W/f, C, fy, fx
    return x.reshape(B, H // factor, W // factor, C * factor * factor)


def unsqueeze2d(x, factor=2):
    if factor == 1:
        return x
    B, H, W, C = x.shape
    f2 = factor * factor
    x = x.reshape(B, H, W, C // f2, factor, factor)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, fy, W, fx, C/f2
    return x.reshape(B, H * factor, W * factor, C // f2)


# ---------------------------------------------------------------------------
# channel split/concat helpers (thops.py:52-64)
# ---------------------------------------------------------------------------


def split_feature(h, kind="split"):
    c = h.shape[-1]
    if kind == "split":
        return h[..., : c // 2], h[..., c // 2:]
    if kind == "cross":
        return h[..., 0::2], h[..., 1::2]
    raise ValueError(kind)


def cat_feature(a, b):
    return jnp.concatenate([a, b], axis=-1)


# ---------------------------------------------------------------------------
# Gaussian base density (flow.py:86-119)
# ---------------------------------------------------------------------------


def gaussian_likelihood(x, mean=None, logs=None):
    if mean is None and logs is None:
        return -0.5 * (x ** 2 + LOG2PI)
    return -0.5 * (logs * 2.0 + ((x - mean) ** 2) * jnp.exp(-2.0 * logs) + LOG2PI)


def gaussian_logp(x, mean=None, logs=None):
    """Sum of elementwise log-likelihood over all but the batch axis."""
    ll = gaussian_likelihood(x, mean, logs)
    return jnp.sum(ll.astype(jnp.float32), axis=tuple(range(1, x.ndim)))


def gaussian_sample(key, mean, logs, eps_std=1.0):
    eps = jax.random.normal(key, mean.shape, mean.dtype) * eps_std
    return mean + jnp.exp(logs) * eps


# ---------------------------------------------------------------------------
# flow-internal conv nets (flow.py:26-83)
# ---------------------------------------------------------------------------


def flow_conv(x, p):
    """Conv2d + built-in actnorm (flow.Conv2d, do_actnorm=True)."""
    y = fnn.conv2d(x, {"w": p["w"]})
    y, _ = actnorm(y, p["actnorm"])
    return y


def flow_conv_zeros(x, p, logscale_factor=3.0):
    """Zero-initialized conv scaled by exp(logs*3) (flow.Conv2dZeros)."""
    y = fnn.conv2d(x, {"w": p["w"], "b": p["b"]})
    return y * jnp.exp(p["logs"] * logscale_factor)


def init_flow_conv(key, kh, kw, cin, cout, weight_std=0.05):
    p = fnn.init_conv(key, kh, kw, cin, cout, bias=False, mode="normal", gain=weight_std)
    p["actnorm"] = {"bias": jnp.zeros((cout,), jnp.float32), "logs": jnp.zeros((cout,), jnp.float32)}
    return p


def init_flow_conv_zeros(key, kh, kw, cin, cout):
    return {
        "w": jnp.zeros((kh, kw, cin, cout), jnp.float32),
        "b": jnp.zeros((cout,), jnp.float32),
        "logs": jnp.zeros((cout,), jnp.float32),
    }


def flow_f(x, p):
    """The coupling's F(): conv3x3+an -> relu -> conv1x1+an -> relu ->
    convZeros (FlowAffineCouplingsAblation.py:127-135)."""
    h = fnn.relu(flow_conv(x, p["conv1"]))
    h = fnn.relu(flow_conv(h, p["conv2"]))
    return flow_conv_zeros(h, p["out"])


def init_flow_f(key, cin, cout, hidden=64, kernel_hidden=1):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": init_flow_conv(k1, 3, 3, cin, hidden),
        "conv2": init_flow_conv(k2, kernel_hidden, kernel_hidden, hidden, hidden),
        "out": init_flow_conv_zeros(k3, 3, 3, hidden, cout),
    }


# ---------------------------------------------------------------------------
# Conditional affine coupling (CondAffineSeparatedAndCond)
# ---------------------------------------------------------------------------


def _scale_shift(h, eps=AFFINE_EPS):
    shift, scale = split_feature(h, "cross")
    scale = jax.nn.sigmoid(scale + 2.0) + eps
    return scale, shift


def cond_affine_ft(ft, p):
    """Precompute the feature-conditional branch (scale_ft, shift_ft).

    fFeatures depends only on the RRDB conditioning — not on the flow
    state — so all K steps' feature branches can be computed once per
    image and shared between the encode and decode passes (the reference
    recomputes them per step per pass)."""
    return _scale_shift(flow_f(ft, p["fFeatures"]))


def cond_affine_cache(ft, p):
    """Everything in the coupling that depends only on the conditioning.

    Beyond the fFeatures scale/shift, the fAffine tower's FIRST conv runs
    over concat([z1, ft]) — by linearity it splits into a z1 part (a few
    channels, cheap) and a 320-channel ft part that is constant per step
    per image.  Precomputing the ft contribution removes the dominant
    conv (and the concat materialization) from BOTH the encode and the
    decode pass (FlowAffineCouplingsAblation.py:79,92 recompute it 2x48
    times per image)."""
    scale_ft, shift_ft = _scale_shift(flow_f(ft, p["fFeatures"]))
    w = p["fAffine"]["conv1"]["w"]
    c_ft = ft.shape[-1]
    aff1_ft = fnn.conv2d(ft, {"w": w[:, :, w.shape[2] - c_ft:, :]})
    return {"scale_ft": scale_ft, "shift_ft": shift_ft, "aff1_ft": aff1_ft,
            "logdet_ft": _sum_log(scale_ft)}


def cond_affine_cache_batched(ft, ps):
    """``cond_affine_cache`` for ALL K steps of a level in one pass.

    The per-step caches each read the 320-channel conditioning map twice
    (fFeatures.conv1 + the fAffine ft slice): K=16 steps re-read it 32
    times and every conv is 64-out (3-17 TF/s on this chip, CLAUDE.md).
    Concatenating the 2K weight stacks makes it ONE 320 -> 128K conv —
    one read of ft, full MXU output width.  The per-step tails (actnorm,
    1x1 conv, zero-init out conv) batch over a step axis: the 1x1s as a
    step-batched matmul, the 3x3 out convs as one grouped conv.

    ps: list of coupling params; returns a list of per-step cache dicts,
    numerically equivalent to ``cond_affine_cache`` per step.
    """
    n = len(ps)
    c_ft = ft.shape[-1]
    hidden = ps[0]["fFeatures"]["conv1"]["w"].shape[-1]
    w1 = jnp.concatenate(
        [p["fFeatures"]["conv1"]["w"] for p in ps]
        + [p["fAffine"]["conv1"]["w"][:, :, -c_ft:, :] for p in ps], axis=-1)
    y = fnn.conv2d(ft, {"w": w1})  # (B, h, w, 2*n*hidden)
    ff1, aff1 = y[..., : n * hidden], y[..., n * hidden:]

    B, h, w = y.shape[:3]
    z = ff1.reshape(B, h, w, n, hidden)
    an1_b = jnp.stack([p["fFeatures"]["conv1"]["actnorm"]["bias"] for p in ps])
    an1_s = jnp.stack([p["fFeatures"]["conv1"]["actnorm"]["logs"] for p in ps])
    z = fnn.relu((z + an1_b) * jnp.exp(an1_s))
    # conv2 is 1x1 (flow.py kernel_hidden=1): a step-batched matmul
    w2 = jnp.stack([p["fFeatures"]["conv2"]["w"] for p in ps])
    assert w2.shape[1] == 1 and w2.shape[2] == 1, "kernel_hidden != 1"
    z = jnp.einsum("bhwnc,ncd->bhwnd", z, w2[:, 0, 0],
                   preferred_element_type=jnp.float32,
                   precision=fnn.default_precision())
    an2_b = jnp.stack([p["fFeatures"]["conv2"]["actnorm"]["bias"] for p in ps])
    an2_s = jnp.stack([p["fFeatures"]["conv2"]["actnorm"]["logs"] for p in ps])
    z = fnn.relu((z + an2_b) * jnp.exp(an2_s))
    # zero-init out convs (3x3, hidden -> 2C each).  At small spatial sizes
    # (level-3 runs at 64^2) n separate narrow lax convs are dispatch/tiling
    # bound (~0.6 ms each): batch them as one (n, h*w, hid) @ (n, hid, 2C)
    # 9-tap matmul.  At larger sizes the accumulate/transpose traffic of
    # the batched form loses to XLA's conv tiling — keep the per-step loop.
    # (A feature_group_count=n conv lowers ~5x slower than either.)
    if h * w <= 8192:
        wout = jnp.stack([p["fFeatures"]["out"]["w"] for p in ps])
        zb = z.transpose(0, 3, 1, 2, 4).reshape(B * n, h, w, hidden)
        zp = jnp.pad(zb, ((0, 0), (1, 1), (1, 1), (0, 0)))
        o = None
        for dy in range(3):
            for dx in range(3):
                t = jnp.einsum("nhwc,ncd->nhwd", zp[:, dy:dy + h, dx:dx + w],
                               jnp.tile(wout[:, dy, dx], (B, 1, 1)),
                               preferred_element_type=jnp.float32,
                               precision=fnn.default_precision())
                o = t if o is None else o + t
        o = o.reshape(B, n, h, w, -1).transpose(0, 2, 3, 1, 4)  # (B,h,w,n,2C)
    else:
        o = jnp.stack(
            [fnn.conv2d(z[..., s, :], {"w": ps[s]["fFeatures"]["out"]["w"]})
             for s in range(n)], axis=-2)
    bout = jnp.stack([p["fFeatures"]["out"]["b"] for p in ps])
    lout = jnp.stack([p["fFeatures"]["out"]["logs"] for p in ps])
    o = (o + bout) * jnp.exp(lout * 3.0)
    shift, scale = o[..., 0::2], o[..., 1::2]  # split_feature 'cross'
    scale = jax.nn.sigmoid(scale + 2.0) + AFFINE_EPS
    return [
        {"scale_ft": scale[..., s, :], "shift_ft": shift[..., s, :],
         "aff1_ft": aff1[..., s * hidden:(s + 1) * hidden],
         "logdet_ft": _sum_log(scale[..., s, :])}
        for s in range(n)
    ]


def flow_f_split(z1, p, aff1_ft):
    """flow_f over an implicit concat([z1, ft]) with the ft contribution of
    conv1 precomputed (``cond_affine_cache``): conv the z1 slice, add, then
    the shared actnorm + the rest of the tower."""
    w = p["conv1"]["w"]
    c_nn = z1.shape[-1]
    y = fnn.conv2d(z1, {"w": w[:, :, :c_nn, :]}) + aff1_ft
    y, _ = actnorm(y, p["conv1"]["actnorm"])
    h = fnn.relu(y)
    h = fnn.relu(flow_conv(h, p["conv2"]))
    return flow_conv_zeros(h, p["out"])


def cond_affine(x, ft, p, logdet=None, reverse=False, ft_params=None):
    """Two-part conditional affine coupling
    (FlowAffineCouplingsAblation.py:57-97).

    p = {'fFeatures': flow_f params (ft -> 2C), 'fAffine': flow_f params
    ([z1, ft] -> 2*C_co)}.  channels_for_nn = C//2 passes through.
    ft_params: optional precomputed (scale_ft, shift_ft) from
    ``cond_affine_ft``.
    """
    c = x.shape[-1]
    c_nn = c // 2
    logdet_ft = None
    if isinstance(ft_params, dict):
        scale_shift_ft = (ft_params["scale_ft"], ft_params["shift_ft"])
        # sum(log(scale_ft)) is conditioning-only: precomputed in the cache
        # (it otherwise re-reduces an HR-sized tensor per step per pass)
        logdet_ft = ft_params.get("logdet_ft")

        def faffine(z1):
            return _scale_shift(flow_f_split(z1, p["fAffine"],
                                             ft_params["aff1_ft"]))
    else:
        scale_shift_ft = ft_params

        def faffine(z1):
            return _scale_shift(flow_f(jnp.concatenate([z1, ft], -1),
                                       p["fAffine"]))

    if not reverse:
        scale_ft, shift_ft = (scale_shift_ft if scale_shift_ft is not None
                              else cond_affine_ft(ft, p))
        z = (x + shift_ft) * scale_ft
        if logdet is not None:
            logdet = logdet + (logdet_ft if logdet_ft is not None
                               else _sum_log(scale_ft))
        z1, z2 = z[..., :c_nn], z[..., c_nn:]
        scale, shift = faffine(z1)
        z2 = (z2 + shift) * scale
        if logdet is not None:
            logdet = logdet + _sum_log(scale)
        return jnp.concatenate([z1, z2], -1), logdet
    z1, z2 = x[..., :c_nn], x[..., c_nn:]
    scale, shift = faffine(z1)
    z2 = z2 / scale - shift
    z = jnp.concatenate([z1, z2], -1)
    if logdet is not None:
        logdet = logdet - _sum_log(scale)
    scale_ft, shift_ft = (scale_shift_ft if scale_shift_ft is not None
                          else cond_affine_ft(ft, p))
    z = z / scale_ft - shift_ft
    if logdet is not None:
        logdet = logdet - (logdet_ft if logdet_ft is not None
                           else _sum_log(scale_ft))
    return z, logdet


def _sum_log(scale):
    return jnp.sum(jnp.log(scale).astype(jnp.float32), axis=(1, 2, 3))


def init_cond_affine(key, c, c_cond, hidden=64):
    c_nn = c // 2
    c_co = c - c_nn
    k1, k2 = jax.random.split(key)
    return {
        "fFeatures": init_flow_f(k1, c_cond, c * 2, hidden),
        "fAffine": init_flow_f(k2, c_nn + c_cond, c_co * 2, hidden),
    }


# ---------------------------------------------------------------------------
# Split2d with learned conditional prior (Split.py:26-86)
# ---------------------------------------------------------------------------


def split2d_prior(z1, ft, p):
    h = flow_conv_zeros(jnp.concatenate([z1, ft], -1) if ft is not None else z1, p["conv"])
    mean, logs = split_feature(h, "cross")
    return mean, logs


def split2d(x, p, logdet, ft=None, reverse=False, eps=None, eps_std=None,
            key=None, consume_ratio=0.5, logs_eps=0.0):
    """Forward: split channels, emit eps for the consumed half.
    Reverse: reconstruct the consumed half from eps (or sample)."""
    c = x.shape[-1]
    n_consume = int(round(c * consume_ratio)) if not reverse else None
    if not reverse:
        n_pass = c - n_consume
        z1, z2 = x[..., :n_pass], x[..., n_pass:]
        mean, logs = split2d_prior(z1, ft, p)
        out_eps = (z2 - mean) / (jnp.exp(logs) + logs_eps)
        if logdet is not None:
            logdet = logdet + gaussian_logp(z2, mean, logs)
        return z1, logdet, out_eps
    z1 = x
    mean, logs = split2d_prior(z1, ft, p)
    if eps is None:
        if key is None:
            # keyless heat-0 decode: the reference's sample_eps * eps_std
            # is deterministically zero at heat 0 with no RNG involved
            if eps_std:
                raise ValueError("split2d reverse with eps_std > 0 needs a "
                                 "PRNG key (or explicit eps)")
            eps = jnp.zeros(mean.shape, mean.dtype)
        else:
            eps = jax.random.normal(key, mean.shape, mean.dtype) * (
                eps_std if eps_std is not None else 1.0)
    z2 = mean + (jnp.exp(logs) + logs_eps) * eps
    z = jnp.concatenate([z1, z2], -1)
    if logdet is not None:
        logdet = logdet - gaussian_logp(z2, mean, logs)
    return z, logdet, None


def init_split2d(key, c, cond_channels=0, consume_ratio=0.5):
    n_consume = int(round(c * consume_ratio))
    n_pass = c - n_consume
    return {"conv": init_flow_conv_zeros(key, 3, 3, n_pass + cond_channels, n_consume * 2)}
