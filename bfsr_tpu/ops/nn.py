"""Functional NN primitives (NHWC / HWIO) + initializers.

Every network in the framework is built from these pure functions over
parameter dicts.  Conventions:

* conv params: ``{'w': (kh, kw, cin, cout), 'b': (cout,) | absent}``
* linear params: ``{'w': (cin, cout), 'b': (cout,) | absent}``
  (torch ``nn.Linear`` stores (out, in): the checkpoint converter transposes)
* batchnorm params: ``{'scale','bias','mean','var'}`` each (C,)

Convs default to f32 accumulation (``preferred_element_type``) so bf16 inputs
still accumulate exactly; the flow/log-det paths always run f32 (SURVEY §7
"hard parts": TPU matmul defaults must be forced to f32 on flow paths).
"""

import math

import jax
import jax.numpy as jnp

_DIMNUMS = ("NHWC", "HWIO", "NHWC")

# TPU matmuls truncate f32 inputs to bf16 at DEFAULT precision; that breaks
# PSNR parity with the f32 CUDA reference.  HIGH (3-pass bf16, ~f32
# accuracy at half the cost of HIGHEST) is the default for convs/linears;
# the flow/log-det paths pin HIGHEST internally.  Override with
# BFSR_PRECISION=default|high|highest or set_default_precision().
import os as _os

_PREC_NAMES = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}
def _parse_mode(mode):
    """Validate a precision-mode string: a typo ('defualt') must fail loudly
    instead of silently benchmarking HIGH (round-4 advisor)."""
    if mode not in set(_PREC_NAMES) | {"mixed"}:
        raise ValueError(
            f"BFSR_PRECISION={mode!r}: expected one of "
            f"{sorted(set(_PREC_NAMES) | {'mixed'})}")
    return _PREC_NAMES.get(mode, jax.lax.Precision.HIGH)


_MODE = _os.environ.get("BFSR_PRECISION", "high")
_PRECISION = _parse_mode(_MODE)

# BFSR_PRECISION=mixed: a per-STAGE policy (r3 verdict #2) — stages whose
# bf16 output delta measured numerically benign run DEFAULT (single-pass
# bf16), the conditioning-critical rest stays HIGH.  Stage scopes are
# declared at pipeline call sites via ``stage(...)``; attribution tables
# in profiling/prec_split_linf.py / prec_split.py and BENCH_NOTES.
# Default policy = prior-only (measured r4, DIV2K): 6.7 -> 8.4 MP/s at
# 115 dB agreement vs all-HIGH — i.e. near-f32 fidelity.  Adding
# "encoder" buys 8.6 MP/s but drops fidelity to serving-grade 68.5 dB;
# at that point plain BFSR_PRECISION=default (8.7) is the simpler choice.
MIXED_POLICY = {
    "prior": jax.lax.Precision.DEFAULT,
}
_STAGE = None


def set_default_precision(p):
    """p: jax.lax.Precision or 'default'|'high'|'highest'|'mixed'."""
    global _PRECISION, _MODE
    if isinstance(p, str):
        precision = _parse_mode(p)
        _MODE = p
        _PRECISION = precision
    else:
        _MODE = {jax.lax.Precision.DEFAULT: "default",
                 jax.lax.Precision.HIGH: "high",
                 jax.lax.Precision.HIGHEST: "highest"}[p]
        _PRECISION = p


# 2-pass bf16 sentinels — middle precision points between DEFAULT
# (1-pass, ~158 TF/s) and HIGH (3-pass, ~60 TF/s).  Usable as
# MIXED_POLICY stage values; conv2d/linear/conv3x3_y3 implement them,
# raw-einsum call sites map them to HIGH via default_precision().
#   TWO_PASS     = hi@hi + hi@lo: keeps the WEIGHTS' low bits, drops the
#                  activations' (r5 probe: the dropped activation bits
#                  dominated the SRFlow conditioning error — refuted)
#   TWO_PASS_ACT = hi@hi + lo@hi: the complementary split — keeps the
#                  ACTIVATIONS' low bits, drops the weights'
TWO_PASS = "two_pass"
TWO_PASS_ACT = "two_pass_act"
_TWO_PASS_SET = (TWO_PASS, TWO_PASS_ACT)


def default_precision():
    """Stage-resolved jax.lax.Precision for raw einsum/lax call sites
    (the TWO_PASS sentinels degrade to HIGH here — only the ops below
    implement the explicit 2-pass splits)."""
    p = stage_precision()
    return jax.lax.Precision.HIGH if p in _TWO_PASS_SET else p


def stage_precision():
    """Stage-resolved precision, possibly the TWO_PASS sentinel."""
    if _MODE == "mixed":
        return MIXED_POLICY.get(_STAGE, jax.lax.Precision.HIGH)
    return _PRECISION


def default_passes():
    """bf16 pass count for the Pallas s2d kernels under the current
    stage policy: 1 (DEFAULT), 2 (TWO_PASS), 3 (HIGH/HIGHEST).
    TWO_PASS_ACT maps to 3: the kernels' 2-pass form is the
    weight-keeping split, which would silently invert the sentinel's
    semantics — stay exact instead."""
    p = stage_precision()
    if p == TWO_PASS:
        return 2
    return 1 if p == jax.lax.Precision.DEFAULT else 3


def _two_pass(f, x, w, which=TWO_PASS):
    """Evaluate the bilinear op ``f(x, w)`` (f must run its dot at DEFAULT
    precision with f32 accumulation) as hi@hi + hi@lo (TWO_PASS: keep the
    weights' low bits) or hi@hi + lo@hi (TWO_PASS_ACT: keep the
    activations')."""
    xh = x.astype(jnp.bfloat16)
    wh = w.astype(jnp.bfloat16)
    if which == TWO_PASS_ACT:
        xl = (x.astype(jnp.float32) - xh.astype(jnp.float32)
              ).astype(jnp.bfloat16)
        return f(xh, wh) + f(xl, wh)
    wl = (w.astype(jnp.float32) - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    return f(xh, wh) + f(xh, wl)


class stage:
    """Trace-time stage scope for the mixed precision policy (stages trace
    sequentially under jit, so a with-block pins every matmul/conv traced
    inside it)."""

    def __init__(self, name):
        self.name = name

    def __enter__(self):
        global _STAGE
        self.saved = _STAGE
        _STAGE = self.name

    def __exit__(self, *a):
        global _STAGE
        _STAGE = self.saved


def conv2d(x, p, stride=1, padding="SAME", dilation=1, precision=None):
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))

    # stage_precision() (not the module _PRECISION) so the mixed
    # per-stage policy reaches every conv at trace time
    prec = precision or stage_precision()

    def _conv(xx, ww, pr):
        return jax.lax.conv_general_dilated(
            xx, ww, window_strides=stride, padding=padding,
            rhs_dilation=dilation, dimension_numbers=_DIMNUMS,
            preferred_element_type=jnp.float32, precision=pr)

    if prec in _TWO_PASS_SET:
        y = _two_pass(lambda a, b: _conv(a, b, jax.lax.Precision.DEFAULT),
                      x, p["w"], which=prec)
    else:
        y = _conv(x, p["w"], prec)
    if "b" in p and p["b"] is not None:
        y = y + p["b"]
    return y.astype(x.dtype)


def conv3x3_y3(x, w):
    """3x3 SAME conv as a half-im2col: lane-concat the 3 row shifts once
    (K=3C), then 3 accumulated column-shift matmuls.  Beats both the full
    im2col (3x less materialization traffic) and 9 K=C dots (K 3x wider,
    2 accumulate passes instead of 8) for the wide-out scatter-form dense
    blocks (rrdb/unet)."""
    h, wd = x.shape[1], x.shape[2]
    c = x.shape[-1]
    pads = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    colsy = jnp.concatenate([pads[:, dy:dy + h] for dy in range(3)], -1)
    k = w.transpose(1, 0, 2, 3).reshape(3, 3 * c, w.shape[-1])  # (dx, 3C, N)
    prec = stage_precision()

    def _dot(a, b, pr):
        return jnp.einsum("bhwc,co->bhwo", a, b,
                          preferred_element_type=jnp.float32, precision=pr)

    acc = None
    for dx in range(3):
        xs = colsy[:, :, dx:dx + wd]
        if prec in _TWO_PASS_SET:
            y = _two_pass(lambda a, b: _dot(a, b, jax.lax.Precision.DEFAULT),
                          xs, k[dx], which=prec)
        else:
            y = _dot(xs, k[dx], prec)
        acc = y if acc is None else acc + y
    return acc


def linear(x, p, precision=None):
    prec = precision or stage_precision()
    if prec in _TWO_PASS_SET:
        y = _two_pass(
            lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.DEFAULT),
            x, p["w"], which=prec)
    else:
        y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32,
                    precision=prec)
    if "b" in p and p["b"] is not None:
        y = y + p["b"]
    return y.astype(x.dtype)


def relu(x):
    return jnp.maximum(x, 0)


def leaky_relu(x, negative_slope=0.2):
    return jnp.where(x >= 0, x, x * negative_slope)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def batch_norm(x, p, training=False, eps=1e-5):
    """BatchNorm2d on NHWC.  training=True uses batch statistics and returns
    (y, (batch_mean, batch_var)) so the caller can update running stats;
    inference uses the stored running stats."""
    if training:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        y = (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
        # torch normalizes with the biased variance but folds the UNBIASED
        # (n/(n-1)) variance into running_var — return that for the update
        n = x.shape[0] * x.shape[1] * x.shape[2]
        var_unbiased = var * (n / max(n - 1, 1))
        return y, (mean, var_unbiased)
    y = (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps) * p["scale"] + p["bias"]
    return y


def max_pool2d(x, window=2, stride=None):
    stride = stride or window
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "VALID",
    )


def pixel_shuffle(x, factor):
    """Depth-to-space matching torch.nn.PixelShuffle channel ordering.

    torch input (NCHW) channel c = c_out * f^2 + fy * f + fx; in NHWC the
    equivalent reshape is (B,H,W,Cout,f,f) -> interleave.
    """
    B, H, W, C = x.shape
    f = factor
    cout = C // (f * f)
    x = x.reshape(B, H, W, cout, f, f)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, fy, W, fx, cout
    return x.reshape(B, H * f, W * f, cout)


def pad_reflect101(x, pad_h, pad_w):
    """Reflect (edge-not-repeated) spatial padding on NHWC."""
    return jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)), mode="reflect")


# ---------------------------------------------------------------------------
# initializers — numerically mirror the torch defaults the reference relies on
# ---------------------------------------------------------------------------


def init_conv(key, kh, kw, cin, cout, bias=True, mode="torch", gain=1.0):
    """Conv init.

    mode='torch'  — kaiming_uniform(a=sqrt(5)) + uniform bias, torch's
                    nn.Conv2d default (used by EDSR/LINF heads).
    mode='kaiming_normal_fan_in' — kaiming_normal(fan_in) * gain (DenseBlock
                    residual init, unet.py:25-28).
    mode='xavier_normal' — xavier normal * gain (RRDB init, rrdb.py:18-27).
    mode='normal' — N(0, gain) (SRFlow flow Conv2d weight_std=0.05).
    mode='zeros'  — zero weights (Conv2dZeros).
    """
    kw_, kb_ = jax.random.split(key)
    fan_in = kh * kw * cin
    fan_out = kh * kw * cout
    if mode == "torch":
        # torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))
        bound = 1.0 / math.sqrt(fan_in)
        w = jax.random.uniform(kw_, (kh, kw, cin, cout), minval=-bound, maxval=bound)
    elif mode == "kaiming_normal_fan_in":
        std = math.sqrt(2.0 / fan_in)
        w = jax.random.normal(kw_, (kh, kw, cin, cout)) * std * gain
    elif mode == "xavier_normal":
        std = math.sqrt(2.0 / (fan_in + fan_out))
        w = jax.random.normal(kw_, (kh, kw, cin, cout)) * std * gain
    elif mode == "normal":
        w = jax.random.normal(kw_, (kh, kw, cin, cout)) * gain
    elif mode == "zeros":
        w = jnp.zeros((kh, kw, cin, cout))
    else:
        raise ValueError(mode)
    p = {"w": w.astype(jnp.float32)}
    if bias:
        if mode == "torch":
            bound = 1.0 / math.sqrt(fan_in)
            p["b"] = jax.random.uniform(kb_, (cout,), minval=-bound, maxval=bound).astype(jnp.float32)
        else:
            p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def init_linear(key, cin, cout, bias=True):
    kw_, kb_ = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin)
    p = {"w": jax.random.uniform(kw_, (cin, cout), minval=-bound, maxval=bound).astype(jnp.float32)}
    if bias:
        p["b"] = jax.random.uniform(kb_, (cout,), minval=-bound, maxval=bound).astype(jnp.float32)
    return p


def init_batch_norm(c):
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def orthogonal_init(key, n):
    """QR-orthogonal square matrix (InvertibleConv1x1 init,
    Permutations.py:29)."""
    a = jax.random.normal(key, (n, n))
    q, r = jnp.linalg.qr(a)
    return q * jnp.sign(jnp.diag(r))[None, :]
