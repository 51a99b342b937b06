"""Thin model base: a (params, config) holder around pure apply functions.

Mirrors the role of nn.Module in the reference while keeping all compute in
jittable pure functions: ``model.params`` is an ordinary pytree that is
passed explicitly into the jitted step functions; the object itself never
enters a trace.
"""

import jax


class Model:
    def __init__(self):
        self.params = {}

    def load_params(self, params):
        """Install a converted/loaded parameter pytree (shape-checked)."""
        old_leaves, old_def = jax.tree_util.tree_flatten(self.params)
        new_leaves, new_def = jax.tree_util.tree_flatten(params)
        if old_def != new_def:
            raise ValueError(
                f"{type(self).__name__}: parameter tree mismatch:\n"
                f"  expected {old_def}\n  got      {new_def}"
            )
        for o, n in zip(old_leaves, new_leaves):
            if tuple(o.shape) != tuple(n.shape):
                raise ValueError(
                    f"{type(self).__name__}: shape mismatch {o.shape} vs {n.shape}"
                )
        self.params = params

    def spec(self):
        """Self-describing spec (reference checkpoints embed these,
        LINF-LP/train.py:234-243)."""
        return {"name": self.registry_name, "args": self.args, "params": self.params}
