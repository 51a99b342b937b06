"""Opt-in two-process multi-host test (BFSR_MULTIHOST_TEST=1): wraps
profiling/multihost_dryrun.py — 2 CPU processes x 4 virtual devices,
dp=8 LINF train step with per-host GrainLoader shards == single-process.
~3 min (two jax inits + coordinator); run explicitly:

    BFSR_MULTIHOST_TEST=1 python -m pytest tests/test_multihost.py -q
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("BFSR_MULTIHOST_TEST") != "1",
    reason="opt-in (BFSR_MULTIHOST_TEST=1): spawns 2 jax processes, ~3 min")


def test_two_process_dp_step_matches_single():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(root, "profiling", "multihost_dryrun.py")
    env = dict(os.environ)
    env.pop("PYTEST_CURRENT_TEST", None)
    r = subprocess.run([sys.executable, script], capture_output=True,
                       text=True, timeout=900, env=env, cwd=root)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert "MULTIHOST DRYRUN OK" in r.stdout
