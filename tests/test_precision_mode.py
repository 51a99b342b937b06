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
