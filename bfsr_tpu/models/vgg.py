"""Frozen VGG19 feature extractor for the perceptual loss.

Reference: LINF-LP/models/vgg.py (@'VGGFeatureExtractor'): torchvision VGG19
``features[:feature_layer+1]`` (default 34 -> through conv5_4, pre-ReLU),
with ImageNet input normalization.  Pretrained weights are not bundled —
convert them once from a torchvision checkpoint via
``bfsr_tpu.convert.torch_import.convert_vgg19`` and install with
``load_params``; randomly initialized weights still define a valid
(untrained) perceptual loss for smoke tests.

VGG19 feature config (torchvision):
  64,64,M, 128,128,M, 256,256,256,256,M, 512,512,512,512,M, 512,512,512,512,M
Layer 34 cuts just after the 16th conv (conv5_4), before its ReLU.
"""

import jax
import jax.numpy as jnp

from bfsr_tpu.models.base import Model
from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.registry import register

_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]

_IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
_IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def _layer_plan(feature_layer):
    """torchvision indexing: conv, relu alternate; 'M' single maxpool.
    Returns list of ('conv', cin, cout) / ('relu',) / ('pool',) up to and
    including index ``feature_layer``."""
    plan = []
    idx = 0
    cin = 3
    for v in _VGG19_CFG:
        if v == "M":
            if idx > feature_layer:
                break
            plan.append(("pool",))
            idx += 1
        else:
            if idx > feature_layer:
                break
            plan.append(("conv", cin, v))
            idx += 1
            if idx > feature_layer:
                break
            plan.append(("relu",))
            idx += 1
            cin = v
    return plan


def init_vgg19_features(key, feature_layer=34):
    plan = _layer_plan(feature_layer)
    convs = []
    for item in plan:
        if item[0] == "conv":
            key, sub = jax.random.split(key)
            convs.append(fnn.init_conv(sub, 3, 3, item[1], item[2]))
    return {"convs": convs}


def vgg19_features(params, x, feature_layer=34, use_input_norm=True):
    """x: (B, H, W, 3) in [0, 1] -> feature map."""
    if use_input_norm:
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    ci = 0
    for item in _layer_plan(feature_layer):
        if item[0] == "conv":
            x = fnn.conv2d(x, params["convs"][ci])
            ci += 1
        elif item[0] == "relu":
            x = fnn.relu(x)
        else:
            x = fnn.max_pool2d(x, 2)
    return x


@register("VGGFeatureExtractor")
class VGGFeatureExtractor(Model):
    registry_name = "VGGFeatureExtractor"

    def __init__(self, feature_layer=34, use_bn=False, use_input_norm=True):
        super().__init__()
        if use_bn:
            raise NotImplementedError("vgg19_bn variant is unused by the reference configs")
        self.args = dict(feature_layer=feature_layer, use_bn=use_bn,
                         use_input_norm=use_input_norm)
        self.feature_layer = feature_layer
        self.use_input_norm = use_input_norm
        self.params = init_vgg19_features(jax.random.PRNGKey(0), feature_layer)

    def apply(self, params, x):
        return vgg19_features(params, x, self.feature_layer, self.use_input_norm)

    def __call__(self, x):
        return self.apply(self.params, x)
