"""VGG19 layer-plan indexing (torchvision features order) and forward."""

import numpy as np
import jax.numpy as jnp

from bfsr_tpu.models.vgg import _layer_plan, init_vgg19_features, vgg19_features


def test_layer_plan_34_is_conv5_4():
    plan = _layer_plan(34)
    # torchvision vgg19.features indices: conv/relu pairs with maxpool after
    # each block; index 34 is the 16th conv (conv5_4), pre-ReLU
    convs = [p for p in plan if p[0] == "conv"]
    assert len(convs) == 16
    assert plan[-1][0] == "conv"
    assert convs[-1][1:] == (512, 512)
    pools = [p for p in plan if p[0] == "pool"]
    assert len(pools) == 4  # the 5th pool (idx 36) is past the cut


def test_layer_plan_8():
    plan = _layer_plan(8)
    convs = [p for p in plan if p[0] == "conv"]
    assert [c[2] for c in convs] == [64, 64, 128, 128]


def test_vgg_forward_shape(rng):
    params = init_vgg19_features(__import__("jax").random.PRNGKey(0), 8)
    x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    out = vgg19_features(params, x, feature_layer=8)
    assert out.shape == (1, 16, 16, 128)  # one pool passed at idx 4
