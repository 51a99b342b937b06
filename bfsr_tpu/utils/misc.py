"""Small host-side helpers: running averages, wall-clock timing, logging.

Reference: LINF-LP/utils.py:15-91 (Averager/Timer/log/compute_num_params)
and SRFlow-LP/code/utils/timer.py.  The tensorboard writer is optional —
scalars always go to a plain JSONL file so headless runs stay dependency-free.
"""

import json
import os
import time

import numpy as np
import jax


class Averager:
    def __init__(self):
        self.n = 0.0
        self.v = 0.0

    def add(self, v, n=1.0):
        self.v = (self.v * self.n + float(v) * n) / (self.n + n)
        self.n += n

    def item(self):
        return self.v


class Timer:
    def __init__(self):
        self.v = time.time()

    def s(self):
        self.v = time.time()

    def t(self):
        return time.time() - self.v


def time_text(t):
    if t >= 3600:
        return "{:.1f}h".format(t / 3600)
    if t >= 60:
        return "{:.1f}m".format(t / 60)
    return "{:.1f}s".format(t)


def compute_num_params(params, text=False):
    """Total parameter count of a pytree (reference: utils.py:83-91)."""
    tot = int(
        sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params) if hasattr(x, "shape"))
    )
    if text:
        if tot >= 1e6:
            return "{:.1f}M".format(tot / 1e6)
        return "{:.1f}K".format(tot / 1e3)
    return tot


_log_path = None


def set_log_path(path):
    global _log_path
    _log_path = path


def log(obj, filename="log.txt"):
    print(obj, flush=True)
    if _log_path is not None:
        with open(os.path.join(_log_path, filename), "a") as f:
            print(obj, file=f)


class ScalarWriter:
    """Scalar logger: JSONL always; TensorBoard when tensorboardX exists."""

    def __init__(self, logdir):
        os.makedirs(logdir, exist_ok=True)
        self._f = open(os.path.join(logdir, "scalars.jsonl"), "a")
        self._tb = None
        try:  # pragma: no cover - optional dependency
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(logdir)
        except Exception:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag, value, step):
        self._f.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def add_scalars(self, tag, value_dict, step):
        for k, v in value_dict.items():
            self.add_scalar(f"{tag}/{k}", v, step)

    def flush(self):
        self._f.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def set_save_path(save_path):
    """Create save dir, wire the file logger, return (log, writer).

    Reference: LINF-LP/utils.py:76-80 (non-interactive: never prompts to
    delete; training resumes into existing directories).
    """
    os.makedirs(save_path, exist_ok=True)
    set_log_path(save_path)
    writer = ScalarWriter(os.path.join(save_path, "tensorboard"))
    return log, writer
