"""Registered 'flow' model: the LINF pointwise flow as a component
(reference: LINF-LP/models/flow.py:11-63, registered 'flow')."""

import jax

from bfsr_tpu.models.base import Model
from bfsr_tpu.ops import pointwise_flow as pwf
from bfsr_tpu.registry import register


@register("flow")
class Flow(Model):
    registry_name = "flow"

    def __init__(self, flow_layers=10, patch_size=1, name="flow"):
        super().__init__()
        self.args = dict(flow_layers=flow_layers, patch_size=patch_size, name=name)
        self.n_layers = flow_layers
        self.patch_size = patch_size
        self.dim = 3 * patch_size * patch_size
        self.params = pwf.init_pointwise_flow(jax.random.PRNGKey(0), flow_layers, patch_size)

    def freeze(self):
        """Attach the inverse/slogdet cache for frozen inference."""
        self.params = pwf.cache_inverses(self.params)
        return self

    @staticmethod
    def forward(params, x, affine_info):
        return pwf.forward(params, x, affine_info)

    @staticmethod
    def inverse(params, z, affine_info):
        return pwf.inverse(params, z, affine_info)
