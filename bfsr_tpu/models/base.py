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
        """Install a converted/loaded parameter pytree.

        Every leaf of the model's expected tree must be present with a
        matching shape; the incoming tree may carry extra leaves (e.g. the
        frozen-inference caches ``w_inv``/``logabsdet``).
        """
        expected = jax.tree_util.tree_flatten_with_path(self.params)[0]
        incoming = dict(jax.tree_util.tree_flatten_with_path(params)[0])
        for path, leaf in expected:
            if path not in incoming:
                raise ValueError(
                    f"{type(self).__name__}: missing parameter at "
                    f"{jax.tree_util.keystr(path)}"
                )
            if tuple(incoming[path].shape) != tuple(leaf.shape):
                raise ValueError(
                    f"{type(self).__name__}: shape mismatch at "
                    f"{jax.tree_util.keystr(path)}: expected {leaf.shape}, "
                    f"got {incoming[path].shape}"
                )
        self.params = params

    def spec(self):
        """Self-describing spec (reference checkpoints embed these,
        LINF-LP/train.py:234-243)."""
        return {"name": self.registry_name, "args": self.args, "params": self.params}
