"""Test-only helpers to import reference PyTorch modules as golden oracles.

The reference at /root/reference is mounted read-only; we import individual
module files with stubbed package scaffolding (fake 'models'/'utils'
packages pointing into the reference tree) so that missing optional deps
(timm, torchvision, natsort, lpips) never load.  Reference code is never
copied — only executed in-process to produce golden outputs for parity
tests.  Everything here is skipped when the mount is absent.
"""

import importlib
import os
import sys
import types
from contextlib import contextmanager

LINF_ROOT = "/root/reference/LINF-LP"
SRFLOW_ROOT = "/root/reference/SRFlow-LP/code"


def reference_available():
    return os.path.isdir(LINF_ROOT)


def patch_cuda_noop():
    """Make .cuda() a no-op so reference GPU-hard-coded code runs on CPU."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


@contextmanager
def _scoped_modules(new_modules, path_entries):
    saved = {}
    for name in new_modules:
        saved[name] = sys.modules.pop(name, None)
    # also drop any previously imported submodules of these packages
    for mod in list(sys.modules):
        if any(mod.startswith(p + ".") for p in new_modules):
            saved[mod] = sys.modules.pop(mod)
    sys.modules.update(new_modules)
    for p in path_entries:
        sys.path.insert(0, p)
    try:
        yield
    finally:
        for p in path_entries:
            sys.path.remove(p)
        for mod in list(sys.modules):
            if mod in new_modules or any(mod.startswith(p + ".") for p in new_modules):
                del sys.modules[mod]
        for name, mod in saved.items():
            if mod is not None:
                sys.modules[name] = mod


def _fake_timm():
    """Minimal timm.models.layers stub (DropPath/to_2tuple/trunc_normal_)
    so the reference swinir/swin_transformer modules import without timm."""
    import torch
    import torch.nn as tnn

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(tnn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std + mean, b * std + mean)
        return tensor

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    timm.models = models
    return {"timm": timm, "timm.models": models, "timm.models.layers": layers}


@contextmanager
def linf_modules(*names):
    """Yield a dict of imported LINF-LP model modules, e.g.
    linf_modules('edsr', 'flow', 'linf')."""
    fake = types.ModuleType("models")
    fake.__path__ = [os.path.join(LINF_ROOT, "models")]
    mods_map = {"models": fake}
    if "timm" not in sys.modules:
        mods_map.update(_fake_timm())
    with _scoped_modules(mods_map, [LINF_ROOT]):
        reg = importlib.import_module("models.models")
        fake.register = reg.register
        fake.make = reg.make
        fake.models = reg
        mods = {}
        for n in names:
            mods[n] = importlib.import_module(f"models.{n}")
        yield mods


def _fake_torchvision():
    """Minimal torchvision.transforms shim (ToPILImage/Resize/ToTensor —
    the only pieces the reference dataset wrappers use, wrappers.py:241-244)
    implemented on PIL, matching real torchvision semantics."""
    import torch
    from PIL import Image as PILImage

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")

    class ToPILImage:
        def __call__(self, pic):
            if isinstance(pic, torch.Tensor):
                if pic.is_floating_point():
                    pic = pic.mul(255).byte()
                arr = pic.permute(1, 2, 0).numpy()
            else:
                arr = pic
            return PILImage.fromarray(arr)

    class Resize:
        def __init__(self, size, interpolation=PILImage.BILINEAR):
            self.size = size
            self.interpolation = interpolation

        def __call__(self, img):
            if isinstance(self.size, int):
                w, h = img.size
                if h <= w:
                    oh, ow = self.size, max(1, round(self.size * w / h))
                else:
                    ow, oh = self.size, max(1, round(self.size * h / w))
            else:
                oh, ow = self.size
            return img.resize((ow, oh), self.interpolation)

    class ToTensor:
        def __call__(self, img):
            import numpy as np

            arr = np.asarray(img, dtype=np.uint8)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(arr.transpose(2, 0, 1).copy())
            return t.float().div(255.0)

    transforms.ToPILImage = ToPILImage
    transforms.Resize = Resize
    transforms.ToTensor = ToTensor
    tv.transforms = transforms
    return {"torchvision": tv, "torchvision.transforms": transforms}


@contextmanager
def linf_dataset_modules(*names):
    """Yield imported LINF-LP dataset modules, e.g.
    linf_dataset_modules('wrappers').  Shims torchvision (not in the image)
    and routes 'utils' to the reference's utils.py (tensorboardX shimmed)."""
    fake_ds = types.ModuleType("datasets")
    fake_ds.__path__ = [os.path.join(LINF_ROOT, "datasets")]
    fake_tbx = types.ModuleType("tensorboardX")
    fake_tbx.SummaryWriter = type("SummaryWriter", (), {})
    mods_map = {"datasets": fake_ds}
    if "tensorboardX" not in sys.modules:
        mods_map["tensorboardX"] = fake_tbx
    if "torchvision" not in sys.modules:
        mods_map.update(_fake_torchvision())
    saved_utils = sys.modules.pop("utils", None)
    with _scoped_modules(mods_map, [LINF_ROOT]):
        try:
            reg = importlib.import_module("datasets.datasets")
            fake_ds.register = reg.register
            fake_ds.make = reg.make
            fake_ds.datasets = reg
            mods = {n: importlib.import_module(f"datasets.{n}") for n in names}
            yield mods
        finally:
            sys.modules.pop("utils", None)
            if saved_utils is not None:
                sys.modules["utils"] = saved_utils


@contextmanager
def linf_utils():
    """Yield the reference LINF-LP/utils.py module (calc_psnr,
    calculate_ssim, make_coord, ...).  Only tensorboardX needs a stub —
    cv2 and torch are present in the image."""
    fake_tbx = types.ModuleType("tensorboardX")

    class _FakeWriter:  # never instantiated by the metric fns
        def __init__(self, *a, **k):
            pass

    fake_tbx.SummaryWriter = _FakeWriter
    new = {"tensorboardX": fake_tbx} if "tensorboardX" not in sys.modules else {}
    saved_utils = sys.modules.pop("utils", None)  # force a fresh 'utils' import
    with _scoped_modules(new, [LINF_ROOT]):
        try:
            mod = importlib.import_module("utils")
            yield mod
        finally:
            sys.modules.pop("utils", None)
            if saved_utils is not None:
                sys.modules["utils"] = saved_utils


@contextmanager
def srflow_modules(*names):
    """Yield imported SRFlow-LP module files, e.g.
    srflow_modules('models.modules.SRFlowNet_arch')."""
    fake_models = types.ModuleType("models")
    fake_models.__path__ = [os.path.join(SRFLOW_ROOT, "models")]
    fake_modules = types.ModuleType("models.modules")
    fake_modules.__path__ = [os.path.join(SRFLOW_ROOT, "models", "modules")]
    fake_models.modules = fake_modules
    fake_utils = types.ModuleType("utils")
    fake_utils.__path__ = []
    util = types.ModuleType("utils.util")

    def opt_get(opt, keys, default=None):
        if opt is None:
            return default
        ret = opt
        for k in keys:
            ret = ret.get(k, None)
            if ret is None:
                return default
        return ret

    util.opt_get = opt_get
    fake_utils.util = util
    new = {
        "models": fake_models,
        "models.modules": fake_modules,
        "utils": fake_utils,
        "utils.util": util,
    }
    with _scoped_modules(new, [SRFLOW_ROOT]):
        mods = {n: importlib.import_module(n) for n in names}
        yield mods
