"""Tracing/profiling helpers (SURVEY §5.1).

The reference only has wall-clock timers (LINF-LP/utils.py:29-47,
SRFlow-LP/code/utils/timer.py).  On TPU we add `jax.profiler` trace hooks
and XLA dump toggles alongside the wall-clock equivalents.

Environment toggles:
  BFSR_TRACE_DIR=/path   capture a jax.profiler trace around traced scopes
  BFSR_DEBUG_NANS=1      enable jax_debug_nans
  BFSR_XLA_DUMP=/path    set XLA_FLAGS=--xla_dump_to (call early)
"""

import contextlib
import os
import time

import jax


def apply_env_toggles():
    if os.environ.get("BFSR_DEBUG_NANS"):
        jax.config.update("jax_debug_nans", True)
    dump = os.environ.get("BFSR_XLA_DUMP")
    if dump:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_dump_to" not in flags:
            os.environ["XLA_FLAGS"] = f"{flags} --xla_dump_to={dump}".strip()


@contextlib.contextmanager
def trace(name="bfsr"):
    """jax.profiler trace scope, active when BFSR_TRACE_DIR is set."""
    trace_dir = os.environ.get("BFSR_TRACE_DIR")
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(os.path.join(trace_dir, name)):
        yield


def device_sync(x):
    """Force device completion by fetching one element to the host.

    ``block_until_ready`` can return before execution completes on tunneled
    platforms; a host fetch cannot.
    """
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            # index on DEVICE first: np.asarray(full_leaf) would pull the
            # whole array over the ~5 MB/s tunnel and dominate the
            # measurement.  Skip Python scalars / empty leaves.
            np.asarray(leaf.ravel()[0])
            break
    return x


class ScopeTimer:
    """Wall-clock scope timer (SRFlow-LP/code/utils/timer.py ScopeTimer)."""

    def __init__(self, name="", sync=None):
        self.name = name
        self.sync = sync

    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, *exc):
        if self.sync is not None:
            device_sync(self.sync)
        self.interval = time.time() - self.start
        print(f"{self.name}: {self.interval:.4f}s")
        return False


class TickTock:
    """tick()/tock() accumulator (timer.py TickTock)."""

    def __init__(self):
        self.acc = 0.0
        self.t = None

    def tick(self):
        self.t = time.time()

    def tock(self):
        if self.t is not None:
            self.acc += time.time() - self.t
            self.t = None
        return self.acc
