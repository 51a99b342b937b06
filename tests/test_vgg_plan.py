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


def test_vgg19_golden_vs_torch_oracle(rng):
    """convert_vgg19 + vgg19_features vs a torch re-execution of
    torchvision's vgg19.features[:35] on a synthetic state dict with the
    torchvision key format (pretrained weights unavailable in this env;
    reference: LINF-LP/models/vgg.py:8-33)."""
    import pytest
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from bfsr_tpu.convert.torch_import import convert_vgg19

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    g = torch.Generator().manual_seed(0)
    sd = {}
    idx, cin = 0, 3
    plan = []
    for v in cfg:
        if idx > 34:
            break
        if v == "M":
            plan.append(("pool",))
            idx += 1
        else:
            sd[f"features.{idx}.weight"] = (
                torch.randn(v, cin, 3, 3, generator=g) * (2.0 / (cin * 9)) ** 0.5)
            sd[f"features.{idx}.bias"] = torch.randn(v, generator=g) * 0.1
            plan.append(("conv", idx))
            idx += 1
            if idx <= 34:
                plan.append(("relu",))
                idx += 1
            cin = v

    x = rng.random((1, 3, 48, 48)).astype(np.float32)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    with __import__("torch").no_grad():
        t = (torch.from_numpy(x) - mean) / std
        for item in plan:
            if item[0] == "conv":
                t = F.conv2d(t, sd[f"features.{item[1]}.weight"],
                             sd[f"features.{item[1]}.bias"], padding=1)
            elif item[0] == "relu":
                t = F.relu(t)
            else:
                t = F.max_pool2d(t, 2)
        ref = t.numpy()

    params = convert_vgg19(sd, feature_layer=34)
    ours = np.asarray(vgg19_features(params, jnp.asarray(
        np.transpose(x, (0, 2, 3, 1))), feature_layer=34))
    np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), ref,
                               rtol=1e-3, atol=5e-4)
