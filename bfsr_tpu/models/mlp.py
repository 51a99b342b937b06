"""Generic MLP (reference: LINF-LP/models/mlp.py, @'mlp'; unused by shipped
configs but part of the registry surface)."""

import jax

from bfsr_tpu.models.base import Model
from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.registry import register


@register("mlp")
class MLP(Model):
    registry_name = "mlp"

    def __init__(self, in_dim, out_dim, hidden_list):
        super().__init__()
        self.args = dict(in_dim=in_dim, out_dim=out_dim, hidden_list=list(hidden_list))
        dims = [in_dim] + list(hidden_list) + [out_dim]
        keys = jax.random.split(jax.random.PRNGKey(0), len(dims))
        self.params = {
            "layers": [
                fnn.init_linear(keys[i], dims[i], dims[i + 1]) for i in range(len(dims) - 1)
            ]
        }

    def apply(self, params, x):
        shape = x.shape[:-1]
        h = x.reshape(-1, x.shape[-1])
        n = len(params["layers"])
        for i, lp in enumerate(params["layers"]):
            h = fnn.linear(h, lp)
            if i < n - 1:
                h = fnn.relu(h)
        return h.reshape(*shape, -1)

    def __call__(self, x):
        return self.apply(self.params, x)
