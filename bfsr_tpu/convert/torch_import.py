"""One-time converters: reference PyTorch state dicts -> bfsr_tpu pytrees.

The reference ships self-describing checkpoints
(``{'model': {'name', 'args', 'sd'}}``, LINF-LP/train.py:234-243 /
test.py:276-281) and BasicSR-style flat state dicts (SRFlow).  These
functions map them to our parameter trees:

* conv: OIHW -> HWIO transpose
* linear: (out, in) -> (in, out) transpose
* batchnorm: weight/bias/running_mean/running_var -> scale/bias/mean/var
* actnorm: (1, C, 1, 1) -> (C,)
* frozen-inference caches (flow W^-1, slogdet) are baked at the end

torch is an optional dependency of this module only (CPU build is in the
image); everything returned is numpy/jnp.
"""

import numpy as np
import jax.numpy as jnp


def _np(t):
    try:
        import torch

        if isinstance(t, torch.Tensor):
            return t.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(t)


def conv_p(sd, prefix, bias=True):
    p = {"w": jnp.asarray(_np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0))}
    if bias and prefix + ".bias" in sd:
        p["b"] = jnp.asarray(_np(sd[prefix + ".bias"]))
    return p


def linear_p(sd, prefix, bias=True):
    p = {"w": jnp.asarray(_np(sd[prefix + ".weight"]).T)}
    if bias and prefix + ".bias" in sd:
        p["b"] = jnp.asarray(_np(sd[prefix + ".bias"]))
    return p


def bn_p(sd, prefix):
    return {
        "scale": jnp.asarray(_np(sd[prefix + ".weight"])),
        "bias": jnp.asarray(_np(sd[prefix + ".bias"])),
        "mean": jnp.asarray(_np(sd[prefix + ".running_mean"])),
        "var": jnp.asarray(_np(sd[prefix + ".running_var"])),
    }


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------


def convert_edsr(sd, n_resblocks=16, no_upsampling=True, prefix=""):
    """LINF-LP/models/edsr.py keys: head.0, body.{i}.body.{0,2}, body.{N}."""
    p = {
        "head": conv_p(sd, prefix + "head.0"),
        "body": [
            {
                "conv1": conv_p(sd, f"{prefix}body.{i}.body.0"),
                "conv2": conv_p(sd, f"{prefix}body.{i}.body.2"),
            }
            for i in range(n_resblocks)
        ],
        "body_tail": conv_p(sd, f"{prefix}body.{n_resblocks}"),
    }
    if not no_upsampling:
        ups = []
        i = 0
        while f"{prefix}tail.0.{i}.weight" in sd:
            ups.append(conv_p(sd, f"{prefix}tail.0.{i}"))
            i += 2  # conv, PixelShuffle alternate
        p["upsampler"] = ups
        p["tail"] = conv_p(sd, prefix + "tail.1")
    return p


def _dense5(sd, prefix):
    return {f"conv{i}": conv_p(sd, f"{prefix}.conv{i}") for i in range(1, 6)}


def convert_rrdb(sd, nb=23, upsampling=False, prefix="", scale=4):
    """rrdb.py / RRDBNet_arch.py keys: conv_first, RRDB_trunk.{i}.RDB{j},
    trunk_conv (+ upconv*/HRconv/conv_last)."""
    p = {
        "conv_first": conv_p(sd, prefix + "conv_first"),
        "trunk": [
            {
                "rdb1": _dense5(sd, f"{prefix}RRDB_trunk.{i}.RDB1"),
                "rdb2": _dense5(sd, f"{prefix}RRDB_trunk.{i}.RDB2"),
                "rdb3": _dense5(sd, f"{prefix}RRDB_trunk.{i}.RDB3"),
            }
            for i in range(nb)
        ],
        "trunk_conv": conv_p(sd, prefix + "trunk_conv"),
    }
    if upsampling:
        p["upconv1"] = conv_p(sd, prefix + "upconv1")
        p["upconv2"] = conv_p(sd, prefix + "upconv2")
        if scale >= 8 and prefix + "upconv3.weight" in sd:
            p["upconv3"] = conv_p(sd, prefix + "upconv3")
        if scale >= 16 and prefix + "upconv4.weight" in sd:
            p["upconv4"] = conv_p(sd, prefix + "upconv4")
        p["hr_conv"] = conv_p(sd, prefix + "HRconv")
        p["conv_last"] = conv_p(sd, prefix + "conv_last")
    return p


def convert_rdn(sd, config="B", no_upsampling=True, prefix=""):
    d, c, g = {"A": (20, 6, 32), "B": (16, 8, 64)}[config]
    p = {
        "sfe1": conv_p(sd, prefix + "SFENet1"),
        "sfe2": conv_p(sd, prefix + "SFENet2"),
        "rdbs": [
            {
                "convs": [conv_p(sd, f"{prefix}RDBs.{i}.convs.{j}.conv.0") for j in range(c)],
                "lff": conv_p(sd, f"{prefix}RDBs.{i}.LFF"),
            }
            for i in range(d)
        ],
        "gff1": conv_p(sd, prefix + "GFF.0"),
        "gff2": conv_p(sd, prefix + "GFF.1"),
    }
    if not no_upsampling:
        ups = []
        i = 0
        while f"{prefix}UPNet.{i}.weight" in sd:
            ups.append(conv_p(sd, f"{prefix}UPNet.{i}"))
            i += 2
        p["upnet"] = ups
    return p


# ---------------------------------------------------------------------------
# LINF
# ---------------------------------------------------------------------------


def convert_pointwise_flow(sd, n_layers=10, prefix="imnet.", freeze=True):
    """flow.py NaiveLinear chain: linears.{i}._weight/bias + last._weight."""
    ws, bs = [], []
    for i in range(n_layers):
        ws.append(_np(sd[f"{prefix}linears.{i}._weight"]))
        bs.append(_np(sd[f"{prefix}linears.{i}.bias"]))
    ws.append(_np(sd[f"{prefix}last._weight"]))
    bs.append(_np(sd[f"{prefix}last.bias"]))
    params = {"w": jnp.asarray(np.stack(ws)), "b": jnp.asarray(np.stack(bs))}
    if freeze:
        from bfsr_tpu.ops.pointwise_flow import cache_inverses

        params = cache_inverses(params)
    return params


def convert_linf(sd, encoder_name, encoder_args, flow_layers=10, num_layer=3,
                 freeze=True):
    """linf.py keys: encoder.*, coef, freq, phase, layers.{0,2,..}, imnet.*."""
    if encoder_name in ("edsr-baseline", "edsr"):
        enc = convert_edsr(sd, encoder_args.get("n_resblocks", 16),
                           encoder_args.get("no_upsampling", True), prefix="encoder.")
    elif encoder_name == "rrdb":
        enc = convert_rrdb(sd, encoder_args.get("nb", 23),
                           upsampling=not encoder_args.get("no_upsampling", True),
                           prefix="encoder.")
    elif encoder_name == "rdn":
        enc = convert_rdn(sd, encoder_args.get("RDNconfig", "B"),
                          encoder_args.get("no_upsampling", True), prefix="encoder.")
    elif encoder_name == "swinir":
        sub = {k[len("encoder."):]: v for k, v in sd.items()
               if k.startswith("encoder.")}
        enc = convert_swinir(sub, tuple(encoder_args.get("depths", (6,) * 6)))
    else:
        raise NotImplementedError(encoder_name)
    mlp = []
    for i in range(num_layer + 1):
        cp = conv_p(sd, f"layers.{2 * i}")
        mlp.append({"w": cp["w"][0, 0], "b": cp["b"]})
    return {
        "encoder": enc,
        "mlp": mlp,
        "coef": conv_p(sd, "coef"),
        "freq": conv_p(sd, "freq"),
        "phase": linear_p(sd, "phase", bias=False),
        "imnet": convert_pointwise_flow(sd, flow_layers, "imnet.", freeze),
    }


# ---------------------------------------------------------------------------
# latent modules
# ---------------------------------------------------------------------------


def _double_conv(sd, prefix):
    return {
        "conv1": conv_p(sd, prefix + ".double_conv.0", bias=False),
        "bn1": bn_p(sd, prefix + ".double_conv.1"),
        "conv2": conv_p(sd, prefix + ".double_conv.3", bias=False),
        "bn2": bn_p(sd, prefix + ".double_conv.4"),
    }


def convert_unet(sd, depth=3):
    """LINF-LP/models/unet.py keys."""
    return {
        "input_proj": _dense5(sd, "input_proj"),
        "lr_proj_conv": conv_p(sd, "lr_proj.0"),
        "lr_proj_dense": _dense5(sd, "lr_proj.2"),
        "inc": _double_conv(sd, "inc"),
        "down": [_double_conv(sd, f"down_layers.{i}.maxpool_conv.1") for i in range(depth)],
        "up": [_double_conv(sd, f"up_layers.{i}.conv") for i in range(depth)],
        "outc": conv_p(sd, "outc.conv"),
    }


def convert_srflow_unet(sd, depth=3):
    """SRFlow-LP/code/models/unet.py: two independent branches 0/1."""
    out = {}
    for b in (0, 1):
        out[f"branch{b}"] = {
            "input_proj": _dense5(sd, f"input_proj{b}"),
            "inc": _double_conv(sd, f"inc{b}"),
            "down": [_double_conv(sd, f"down_layers{b}.{i}.maxpool_conv.1")
                     for i in range(depth)],
            "up": [_double_conv(sd, f"up_layers{b}.{i}.conv") for i in range(depth)],
            "outc": conv_p(sd, f"outc{b}.conv"),
        }
    return out


def convert_mlp(sd, prefix="layers."):
    """Generic MLP (LINF-LP/models/mlp.py): nn.Sequential of Linear/ReLU;
    linears sit at even sequential indices."""
    idxs = sorted({int(k[len(prefix):].split(".")[0])
                   for k in sd if k.startswith(prefix)})
    return {"layers": [linear_p(sd, f"{prefix}{i}") for i in idxs]}


def convert_edsr_latent(sd, n_resblocks=16):
    return {
        "input_proj": _dense5(sd, "input_proj"),
        "lr_proj_conv": conv_p(sd, "lr_proj.0"),
        "lr_proj_dense": _dense5(sd, "lr_proj.2"),
        "body": [
            {"conv1": conv_p(sd, f"body.{i}.body.0"),
             "conv2": conv_p(sd, f"body.{i}.body.2")}
            for i in range(n_resblocks)
        ],
        "last_conv": conv_p(sd, "last_conv"),
    }


# ---------------------------------------------------------------------------
# SRFlow
# ---------------------------------------------------------------------------


def _actnorm_p(sd, prefix):
    return {
        "bias": jnp.asarray(_np(sd[prefix + ".bias"]).reshape(-1)),
        "logs": jnp.asarray(_np(sd[prefix + ".logs"]).reshape(-1)),
    }


def _flow_conv_p(sd, prefix):
    return {
        "w": jnp.asarray(_np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)),
        "actnorm": _actnorm_p(sd, prefix + ".actnorm"),
    }


def _flow_conv_zeros_p(sd, prefix):
    return {
        "w": jnp.asarray(_np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)),
        "b": jnp.asarray(_np(sd[prefix + ".bias"])),
        "logs": jnp.asarray(_np(sd[prefix + ".logs"]).reshape(-1)),
    }


def _flow_f_p(sd, prefix):
    return {
        "conv1": _flow_conv_p(sd, prefix + ".0"),
        "conv2": _flow_conv_p(sd, prefix + ".2"),
        "out": _flow_conv_zeros_p(sd, prefix + ".4"),
    }


def convert_srflow(sd, plan, nb=23, scale=4, freeze=True):
    """SRFlowNet: RRDB.* + flowUpsamplerNet.layers.{i}.* aligned with the
    static plan (module indices match plan order; SqueezeLayer has no
    params).  The unused `flowUpsamplerNet.f` head is skipped."""
    from bfsr_tpu.ops.flows import invconv_cache

    rrdb = convert_rrdb(sd, nb, upsampling=True, prefix="RRDB.", scale=scale)
    layers = []
    for i, entry in enumerate(plan):
        pre = f"flowUpsamplerNet.layers.{i}"
        if entry["kind"] == "squeeze":
            layers.append({})
        elif entry["kind"] in ("step_nc", "step_cond"):
            w = _np(sd[pre + ".invconv.weight"])
            p = {
                "actnorm": _actnorm_p(sd, pre + ".actnorm"),
                "invconv": invconv_cache(w) if freeze else {"w": jnp.asarray(w)},
            }
            if entry["kind"] == "step_cond":
                p["affine"] = {
                    "fFeatures": _flow_f_p(sd, pre + ".affine.fFeatures"),
                    "fAffine": _flow_f_p(sd, pre + ".affine.fAffine"),
                }
            layers.append(p)
        elif entry["kind"] == "split":
            layers.append({"conv": _flow_conv_zeros_p(sd, pre + ".conv")})
    return {"rrdb": rrdb, "flow": {"layers": layers}}


def convert_swinir(sd, depths=(6,) * 6):
    """LINF-LP/models/swinir.py keys -> our SwinIR tree."""
    def ln(prefix):
        return {"scale": jnp.asarray(_np(sd[prefix + ".weight"])),
                "bias": jnp.asarray(_np(sd[prefix + ".bias"]))}

    p = {
        "conv_first": conv_p(sd, "conv_first"),
        "patch_norm": ln("patch_embed.norm") if "patch_embed.norm.weight" in sd else None,
        "layers": [],
        "norm": ln("norm"),
        "conv_after_body": conv_p(sd, "conv_after_body"),
        "conv_before_upsample": conv_p(sd, "conv_before_upsample.0"),
    }
    for li, depth in enumerate(depths):
        blocks = []
        for bi in range(depth):
            pre = f"layers.{li}.residual_group.blocks.{bi}"
            blocks.append({
                "norm1": ln(pre + ".norm1"),
                "attn": {
                    "qkv": linear_p(sd, pre + ".attn.qkv"),
                    "proj": linear_p(sd, pre + ".attn.proj"),
                    "bias_table": jnp.asarray(
                        _np(sd[pre + ".attn.relative_position_bias_table"])),
                },
                "norm2": ln(pre + ".norm2"),
                "mlp_fc1": linear_p(sd, pre + ".mlp.fc1"),
                "mlp_fc2": linear_p(sd, pre + ".mlp.fc2"),
            })
        p["layers"].append({"blocks": blocks, "conv": conv_p(sd, f"layers.{li}.conv")})
    return p


def convert_swin_latent(sd, depths=(2, 2, 6, 2)):
    """LINF-LP/models/swin_transformer.py @'swin_latent' keys."""
    def ln(prefix):
        return {"scale": jnp.asarray(_np(sd[prefix + ".weight"])),
                "bias": jnp.asarray(_np(sd[prefix + ".bias"]))}

    p = {
        "input_proj": _dense5(sd, "input_proj"),
        "lr_proj_conv": conv_p(sd, "lr_proj.0"),
        "lr_proj_dense": _dense5(sd, "lr_proj.2"),
        "layers": [],
        "norm": ln("norm"),
        "head": [conv_p(sd, f"head.{i}") for i in (0, 2, 4)],
    }
    for li, depth in enumerate(depths):
        blocks = []
        for bi in range(depth):
            pre = f"layers.{li}.blocks.{bi}"
            blocks.append({
                "norm1": ln(pre + ".norm1"),
                "attn": {
                    "qkv": linear_p(sd, pre + ".attn.qkv"),
                    "proj": linear_p(sd, pre + ".attn.proj"),
                    "bias_table": jnp.asarray(
                        _np(sd[pre + ".attn.relative_position_bias_table"])),
                },
                "norm2": ln(pre + ".norm2"),
                "mlp_fc1": linear_p(sd, pre + ".mlp.fc1"),
                "mlp_fc2": linear_p(sd, pre + ".mlp.fc2"),
            })
        p["layers"].append({"blocks": blocks})
    return p


def convert_vgg19(sd, feature_layer=34):
    """torchvision vgg19().features state dict -> our conv stack."""
    convs = []
    for i in range(feature_layer + 1):
        if f"features.{i}.weight" in sd:
            convs.append(conv_p(sd, f"features.{i}"))
        elif f"{i}.weight" in sd:  # bare features module
            convs.append(conv_p(sd, f"{i}"))
    return {"convs": convs}


# ---------------------------------------------------------------------------
# checkpoint-level entry points
# ---------------------------------------------------------------------------


def load_torch_checkpoint(path):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def convert_linf_checkpoint(ckpt, freeze=True):
    """Convert a self-describing LINF checkpoint dict ({'model': spec+sd})
    into a bfsr_tpu spec consumable by registry.make(load_params=True)."""
    spec = ckpt["model"] if "model" in ckpt else ckpt
    args = dict(spec["args"])
    sd = spec["sd"]
    enc_spec = args["encoder_spec"]
    params = convert_linf(
        sd, enc_spec["name"], enc_spec.get("args", {}) or {},
        flow_layers=args.get("flow_layers", 10),
        num_layer=args.get("num_layer", 3), freeze=freeze,
    )
    return {"name": spec["name"], "args": args, "params": params}


def convert_prior_checkpoint(ckpt):
    spec = ckpt["prior_model"] if "prior_model" in ckpt else ckpt
    args = dict(spec.get("args", {}) or {})
    sd = spec["sd"]
    name = spec["name"]
    if name == "unet":
        if "input_proj0.conv1.weight" in sd:  # SRFlow two-branch flavor
            return {"name": "srflow-unet", "args": args,
                    "params": convert_srflow_unet(sd, args.get("depth", 3))}
        return {"name": "unet", "args": args,
                "params": convert_unet(sd, args.get("depth", 3))}
    if name == "edsr-baseline-latent":
        return {"name": name, "args": args,
                "params": convert_edsr_latent(sd, args.get("n_resblocks", 16))}
    if name == "swin_latent":
        return {"name": name, "args": args, "params": convert_swin_latent(sd)}
    raise NotImplementedError(name)
