"""Serving precision mode wiring (round-2 verdict Weak #4).

``BFSR_PRECISION=default`` / ``--precision default`` must flow end-to-end:
ops/nn.py's module default -> the s2d Pallas kernels' pass count
(3-pass bf16 split == XLA HIGH normally; 1-pass bf16 in serving mode).
These are CPU wiring tests — the output-quality delta of the serving mode
is a hardware measurement (BENCH_NOTES 'serving precision mode').
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.ops.pallas.s2d_conv import conv3x3_s2d, s2d_weight, space_to_depth


@pytest.fixture
def restore_precision():
    old = fnn.default_precision()
    yield
    fnn.set_default_precision(old)


def test_setter_roundtrip(restore_precision):
    for name, val in (("default", jax.lax.Precision.DEFAULT),
                      ("high", jax.lax.Precision.HIGH),
                      ("highest", jax.lax.Precision.HIGHEST)):
        fnn.set_default_precision(name)
        assert fnn.default_precision() == val


def test_env_var_selects_mode():
    """BFSR_PRECISION is read at import; check in a subprocess."""
    code = ("import jax; from bfsr_tpu.ops import nn as fnn; "
            "assert fnn.default_precision() == jax.lax.Precision.DEFAULT, "
            "fnn.default_precision(); print('ok')")
    env = dict(os.environ, BFSR_PRECISION="default", JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert "ok" in out.stdout


def test_s2d_passes_follow_precision_mode(rng, restore_precision):
    """conv3x3_s2d(passes=None) must resolve to 1-pass under serving mode
    and 3-pass otherwise — bit-identical to the explicit setting."""
    x = jnp.asarray(rng.random((1, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray((rng.random((3, 3, 4, 4)) - 0.5).astype(np.float32))
    xs, ws = [space_to_depth(x)], s2d_weight(w)

    fnn.set_default_precision("default")
    out_auto = np.asarray(conv3x3_s2d(xs, ws, interpret=True))
    out_p1 = np.asarray(conv3x3_s2d(xs, ws, passes=1, interpret=True))
    np.testing.assert_array_equal(out_auto, out_p1)

    fnn.set_default_precision("high")
    out_auto3 = np.asarray(conv3x3_s2d(xs, ws, interpret=True))
    out_p3 = np.asarray(conv3x3_s2d(xs, ws, passes=3, interpret=True))
    np.testing.assert_array_equal(out_auto3, out_p3)

    # both modes agree to f32-ish tolerance (1-pass truncates to bf16)
    np.testing.assert_allclose(out_p1, out_p3, atol=0.05)
    # and the 3-pass form is genuinely the more accurate one
    ref = np.asarray(fnn.conv2d(x, {"w": w},
                                precision=jax.lax.Precision.HIGHEST))
    from bfsr_tpu.ops.pallas.s2d_conv import depth_to_space

    err1 = np.abs(np.asarray(depth_to_space(jnp.asarray(out_p1))) - ref).max()
    err3 = np.abs(np.asarray(depth_to_space(jnp.asarray(out_p3))) - ref).max()
    assert err3 < err1


def test_cli_precision_flag_wires_through():
    """test.py --precision routes to set_default_precision before any
    compute (test.py:58-69; same block in srflow_test.py:107-118)."""
    code = """
import sys
sys.argv = ["test.py", "--config", "/nonexistent.yaml", "--model", "x.pth",
            "--precision", "default"]
import jax
jax.config.update("jax_platforms", "cpu")
import runpy
try:
    runpy.run_path("test.py", run_name="__main__")
except FileNotFoundError:
    pass  # config doesn't exist — precision was set before the load
from bfsr_tpu.ops import nn as fnn
assert fnn.default_precision() == jax.lax.Precision.DEFAULT, fnn.default_precision()
print("ok")
"""
    env = dict(os.environ)
    env.pop("BFSR_PRECISION", None)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ok" in out.stdout


def test_mixed_mode_stage_policy(restore_precision):
    """BFSR_PRECISION=mixed resolves per-STAGE: encoder/prior run DEFAULT
    (single-pass bf16), untagged stages HIGH (r3 verdict #2)."""
    fnn.set_default_precision("mixed")
    saved = dict(fnn.MIXED_POLICY)
    try:
        fnn.MIXED_POLICY.clear()
        fnn.MIXED_POLICY.update({"encoder": jax.lax.Precision.DEFAULT,
                                 "prior": jax.lax.Precision.DEFAULT})
        assert fnn.default_precision() == jax.lax.Precision.HIGH
        with fnn.stage("encoder"):
            assert fnn.default_precision() == jax.lax.Precision.DEFAULT
            with fnn.stage("head"):  # nesting restores correctly
                assert fnn.default_precision() == jax.lax.Precision.HIGH
            assert fnn.default_precision() == jax.lax.Precision.DEFAULT
        with fnn.stage("prior"):
            assert fnn.default_precision() == jax.lax.Precision.DEFAULT
        assert fnn.default_precision() == jax.lax.Precision.HIGH
        # non-mixed modes ignore stages entirely
        fnn.set_default_precision("high")
        with fnn.stage("encoder"):
            assert fnn.default_precision() == jax.lax.Precision.HIGH
    finally:
        fnn.MIXED_POLICY.clear()
        fnn.MIXED_POLICY.update(saved)


def test_mixed_mode_env(restore_precision):
    code = ("import os; os.environ['BFSR_PRECISION']='mixed'; "
            "import jax; from bfsr_tpu.ops import nn as fnn; "
            "assert fnn.default_precision() == jax.lax.Precision.HIGH; "
            "f = fnn.stage('prior'); f.__enter__(); "
            "assert fnn.default_precision() == jax.lax.Precision.DEFAULT; "
            "print('ok')")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True)
    assert out.returncode == 0 and "ok" in out.stdout, out.stderr[-1500:]


def test_mixed_mode_predictor_runs(rng, restore_precision):
    """The predictor traces under mixed mode on CPU (stage scopes wired in
    linf_eval) and produces finite output differing from all-HIGH only
    within bf16 tolerance on a tiny model."""
    import bfsr_tpu.models  # noqa: F401
    from bfsr_tpu import registry
    from bfsr_tpu.pipelines.linf_eval import LINFPredictor
    from bfsr_tpu.utils.coords import make_cell, make_coord_np

    m = registry.make({"name": "linf", "args": {
        "encoder_spec": {"name": "edsr-baseline",
                         "args": {"n_resblocks": 2, "n_feats": 8,
                                  "no_upsampling": True}},
        "imnet_spec": {"name": "flow", "args": {"name": "flow"}},
        "flow_layers": 2, "num_layer": 2, "hidden_dim": 16}}).freeze()
    prior = registry.make({"name": "unet", "args": {"in_chans": 3, "depth": 2,
                                                    "dim": 8,
                                                    "bilinear": True}})
    h = w = 8
    H = W = 16
    inp = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))
    coord = jnp.asarray(make_coord_np((H, W), flatten=False)[None])
    cell = jnp.asarray(make_cell((H, W))[None])
    gt = jnp.asarray((rng.random((1, H, W, 3)) - 0.5).astype(np.float32))

    fnn.set_default_precision("high")
    ref = np.asarray(LINFPredictor(m, prior).predict(
        m.params, prior.params, inp, coord, cell, gt))
    fnn.set_default_precision("mixed")
    out = np.asarray(LINFPredictor(m, prior).predict(
        m.params, prior.params, inp, coord, cell, gt))
    assert np.isfinite(out).all()
    # CPU backends honor precision loosely; just bound the delta
    assert np.abs(out - ref).max() < 0.1


def _collect_precisions(jaxpr, out):
    """All 'precision' params in a jaxpr, recursing into sub-jaxprs
    (scan/pjit/cond bodies)."""
    from jax.extend import core as jcore

    for eq in jaxpr.eqns:
        if "precision" in eq.params and eq.params["precision"] is not None:
            out.append(eq.params["precision"])
        for v in eq.params.values():
            vs = v if isinstance(v, (tuple, list)) else (v,)
            for sub in vs:
                if isinstance(sub, jcore.ClosedJaxpr):
                    _collect_precisions(sub.jaxpr, out)
                elif isinstance(sub, jcore.Jaxpr):
                    _collect_precisions(sub, out)
    return out


def test_srflow_predictor_mixed_prior_stage(rng, restore_precision):
    """SRFlow mixed mode (r4): the predictor's prior stage traces DEFAULT
    (measured 102 dB benign, BENCH_NOTES SRFlow attribution) while the
    fragile conditioning stages (trunk/ft/flow, ~43-47 dB each) keep
    HIGH.  Asserted on the traced precisions of the full predictor body."""
    import bfsr_tpu.models  # noqa: F401
    from bfsr_tpu import registry
    from bfsr_tpu.pipelines.srflow_eval import SRFlowLPPredictor

    m = registry.make({
        "name": "srflow",
        "args": {"nf": 8, "nb": 2, "gc": 4, "K": 2, "L": 3,
                 "hidden_channels": 8, "stack_blocks": (0, 1),
                 "quant": 32}}).freeze()
    prior = registry.make({"name": "srflow-unet",
                           "args": {"depth": 2, "dim": 8}})
    lr = jnp.zeros((1, 8, 8, 3), jnp.float32)

    def precs(mode):
        fnn.set_default_precision(mode)
        pred = SRFlowLPPredictor(m, prior)
        jx = jax.make_jaxpr(pred._impl)(m.params, prior.params, lr)
        flat = []
        for p in _collect_precisions(jx.jaxpr, []):
            flat.extend(p if isinstance(p, tuple) else (p,))
        return flat

    mixed = precs("mixed")
    assert jax.lax.Precision.DEFAULT in mixed  # the prior went bf16
    assert jax.lax.Precision.HIGH in mixed     # conditioning stayed HIGH
    high = precs("high")
    assert jax.lax.Precision.DEFAULT not in high


def test_conv_linear_consume_stage_policy(rng, restore_precision):
    """Regression (r4): conv2d/linear must read the STAGE-aware
    default_precision(), not the module-level mode constant — under
    mixed, a conv traced inside a DEFAULT-stage must carry
    Precision.DEFAULT in its jaxpr (CPU numerics can't show this;
    assert on the traced primitive params)."""
    x = jnp.zeros((1, 8, 8, 4), jnp.float32)
    p = {"w": jnp.zeros((3, 3, 4, 4), jnp.float32)}
    xl = jnp.zeros((5, 4), jnp.float32)
    pl = {"w": jnp.zeros((4, 6), jnp.float32)}

    def prec_of(jaxpr, prim):
        for eq in jaxpr.jaxpr.eqns:
            if eq.primitive.name == prim:
                return eq.params["precision"]
        raise AssertionError(f"{prim} not in jaxpr")

    fnn.set_default_precision("mixed")
    saved = dict(fnn.MIXED_POLICY)
    try:
        fnn.MIXED_POLICY.clear()
        fnn.MIXED_POLICY.update({"prior": jax.lax.Precision.DEFAULT})

        def in_stage(fn, *a):
            with fnn.stage("prior"):
                return fn(*a)

        jx = jax.make_jaxpr(lambda a, b: in_stage(fnn.conv2d, a, b))(x, p)
        assert prec_of(jx, "conv_general_dilated") == (
            jax.lax.Precision.DEFAULT,) * 2
        jx = jax.make_jaxpr(fnn.conv2d)(x, p)  # unscoped -> HIGH
        assert prec_of(jx, "conv_general_dilated") == (
            jax.lax.Precision.HIGH,) * 2
        jx = jax.make_jaxpr(lambda a, b: in_stage(fnn.linear, a, b))(xl, pl)
        assert prec_of(jx, "dot_general") == (jax.lax.Precision.DEFAULT,) * 2
    finally:
        fnn.MIXED_POLICY.clear()
        fnn.MIXED_POLICY.update(saved)


def test_two_pass_stage_policy(rng, restore_precision):
    """TWO_PASS as a MIXED_POLICY value: conv2d/linear/conv3x3_y3 compute
    the explicit hi@hi + hi@lo split (error ~ activations' bf16 rounding,
    far below 1-pass); raw-einsum call sites degrade it to HIGH via
    default_precision(); the Pallas pass count resolves to 2."""
    x = jnp.asarray(rng.random((1, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray((rng.random((3, 3, 16, 8)) - 0.5).astype(np.float32))
    p = {"w": w}
    hi = fnn.conv2d(x, p, precision=jax.lax.Precision.HIGHEST)

    saved = dict(fnn.MIXED_POLICY)
    try:
        fnn.MIXED_POLICY.clear()
        fnn.MIXED_POLICY["cond"] = fnn.TWO_PASS
        fnn.set_default_precision("mixed")
        with fnn.stage("cond"):
            assert fnn.stage_precision() == fnn.TWO_PASS
            assert fnn.default_precision() == jax.lax.Precision.HIGH
            assert fnn.default_passes() == 2
            tp_conv = fnn.conv2d(x, p)
            tp_y3 = fnn.conv3x3_y3(x, w)
            tp_lin = fnn.linear(x.reshape(-1, 16), {"w": w[0, 0]})
        # outside the scope the policy falls back to HIGH / 3 passes
        assert fnn.default_passes() == 3
        out_conv = fnn.conv2d(x, p)
    finally:
        fnn.MIXED_POLICY.clear()
        fnn.MIXED_POLICY.update(saved)

    # 2-pass keeps the weights' low bits; the remaining error is the
    # activations' bf16 rounding (~2^-9 relative)
    rel = float(jnp.max(jnp.abs(tp_conv - hi)) / jnp.max(jnp.abs(hi)))
    assert 0 < rel < 2e-2, rel
    np.testing.assert_allclose(np.asarray(tp_y3), np.asarray(tp_conv),
                               atol=1e-5)
    hi_lin = fnn.linear(x.reshape(-1, 16), {"w": w[0, 0]},
                        precision=jax.lax.Precision.HIGHEST)
    rel_l = float(jnp.max(jnp.abs(tp_lin - hi_lin))
                  / jnp.max(jnp.abs(hi_lin)))
    assert 0 < rel_l < 2e-2, rel_l
    np.testing.assert_allclose(np.asarray(out_conv), np.asarray(hi),
                               atol=1e-5)


def test_two_pass_act_stage_policy(rng, restore_precision):
    """TWO_PASS_ACT (hi@hi + lo@hi — keep the ACTIVATIONS' low bits, drop
    the weights'): the complementary split to TWO_PASS.  Discriminating
    case: with bf16-exact weights the act-split is exact (its only
    dropped term is xh@wl = 0) while TWO_PASS still carries the
    activations' rounding error.  Raw-einsum sites degrade to HIGH; the
    Pallas pass count maps to 3 (the kernels' 2-pass form is the
    weight-keeping split — wrong semantics for this sentinel)."""
    x = jnp.asarray(rng.random((1, 8, 8, 16)).astype(np.float32))
    w_exact = jnp.asarray(
        (rng.random((3, 3, 16, 8)) - 0.5).astype(np.float32)
    ).astype(jnp.bfloat16).astype(jnp.float32)
    p = {"w": w_exact}
    hi = fnn.conv2d(x, p, precision=jax.lax.Precision.HIGHEST)

    saved = dict(fnn.MIXED_POLICY)
    try:
        fnn.MIXED_POLICY.clear()
        fnn.MIXED_POLICY["cond"] = fnn.TWO_PASS_ACT
        fnn.set_default_precision("mixed")
        with fnn.stage("cond"):
            assert fnn.stage_precision() == fnn.TWO_PASS_ACT
            assert fnn.default_precision() == jax.lax.Precision.HIGH
            assert fnn.default_passes() == 3
            act_conv = fnn.conv2d(x, p)
            act_y3 = fnn.conv3x3_y3(x, w_exact)
            act_lin = fnn.linear(x.reshape(-1, 16), {"w": w_exact[0, 0]})
        fnn.MIXED_POLICY["cond"] = fnn.TWO_PASS
        with fnn.stage("cond"):
            wt_conv = fnn.conv2d(x, p)
    finally:
        fnn.MIXED_POLICY.clear()
        fnn.MIXED_POLICY.update(saved)

    # act-split error on bf16-exact weights is SECOND order (~2^-18: the
    # only dropped terms are xh@wl = 0 and the bf16 rounding of the
    # residual xl) — the weight-keeping split's error stays FIRST order
    # (~2^-9: it drops xl@wh entirely)
    rel_act = float(jnp.max(jnp.abs(act_conv - hi)) / jnp.max(jnp.abs(hi)))
    rel_wt = float(jnp.max(jnp.abs(wt_conv - hi)) / jnp.max(jnp.abs(hi)))
    assert rel_act < 1e-3, rel_act
    assert rel_wt > 5 * rel_act, (rel_wt, rel_act)
    np.testing.assert_allclose(np.asarray(act_y3), np.asarray(act_conv),
                               atol=1e-5)
    hi_lin = fnn.linear(x.reshape(-1, 16), {"w": w_exact[0, 0]},
                        precision=jax.lax.Precision.HIGHEST)
    rel_lin = float(jnp.max(jnp.abs(act_lin - hi_lin))
                    / jnp.max(jnp.abs(hi_lin)))
    assert rel_lin < 1e-3, rel_lin
