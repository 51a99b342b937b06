"""Checkpoint save/load.

Self-describing checkpoints like the reference's
(``{'prior_model': spec+params, 'optimizer': spec+state, 'epoch': N}``,
LINF-LP/train.py:234-243), stored as a single portable file: a pickle whose
array leaves are numpy (no torch/jax objects), written crash-safe via
tmp+rename (the reference's own trick, SRFlow-LP/code/test.py:165-171).

When orbax-checkpoint is importable, ``save_orbax``/``restore_orbax``
offer async array checkpointing for large training runs; the pickle format
remains the canonical interchange (it round-trips specs and optimizer
hyperparams, not just arrays).
"""

import os
import pickle

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree
    )


def _to_jax(tree):
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x)
        if isinstance(x, np.ndarray) and x.dtype.kind in "fiub"
        else x,
        tree,
    )


def save_checkpoint(path, payload):
    """payload: arbitrary pytree-of-dicts; arrays converted to numpy."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(payload), f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return _to_jax(payload)


def keep_newest(directory, prefix, n_keep=2):
    """Prune old checkpoints, keeping the newest n (BaseModel keeps 2,
    SRFlow-LP/code/models/base_model.py:95-110).  Handles both pickle
    files and orbax checkpoint directories."""
    import shutil

    files = sorted(
        (f for f in os.listdir(directory) if f.startswith(prefix)),
        key=lambda f: os.path.getmtime(os.path.join(directory, f)),
    )
    for f in files[:-n_keep]:
        p = os.path.join(directory, f)
        if os.path.isdir(p):
            shutil.rmtree(p)
        else:
            os.remove(p)


def find_auto_resume(directory, suffix=(".ckpt", ".orbax")):
    """Newest checkpoint in a directory, or None (auto-resume,
    SRFlow-LP/code/utils/util.py:152-164).  Matches pickle files and
    orbax directories alike."""
    if not os.path.isdir(directory):
        return None
    suffixes = (suffix,) if isinstance(suffix, str) else tuple(suffix)
    files = [f for f in os.listdir(directory) if f.endswith(suffixes)]
    if not files:
        return None
    files.sort(key=lambda f: os.path.getmtime(os.path.join(directory, f)))
    return os.path.join(directory, files[-1])


def load_state(path, template=None):
    """Dispatch on the checkpoint form: '.orbax' directories restore via
    orbax (optionally into a structure template — optax states are
    NamedTuples that orbax flattens to lists otherwise), everything else
    through the canonical pickle loader."""
    if path.endswith(".orbax"):
        return restore_orbax(path, template)
    return load_checkpoint(path)


def save_orbax(path, tree):
    """Async-array checkpointing for big training runs (opt-in via the
    trainers' --orbax; the pickle format stays the interchange)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    # force=True: orbax refuses to save onto an existing directory, so a
    # restart into the same save_path at the same iter cadence would crash
    # at the first periodic save; match save_checkpoint's atomic overwrite
    ckptr.save(os.path.abspath(path), _to_numpy(tree), force=True)


def restore_orbax(path, template=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return _to_jax(ckptr.restore(os.path.abspath(path), item=template))
