"""LPIPS-alex golden parity: our jnp net + ``convert_lpips`` vs a torch
re-execution of the published lpips-package math (SRFlow-LP/code/Measure.py
uses lpips.LPIPS(net='alex'); the pretrained weights are not obtainable in
this environment, so the oracle runs the same architecture on a synthetic
state dict with the package's exact key format — validating conversion,
architecture, scaling and normalization math end-to-end)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from bfsr_tpu.models.lpips import LPIPS, convert_lpips, _SHIFT, _SCALE  # noqa: E402

# torchvision alexnet.features conv layout: (index, cin, cout, k, stride, pad)
_CONVS = [(0, 3, 64, 11, 4, 2), (3, 64, 192, 5, 1, 2), (6, 192, 384, 3, 1, 1),
          (8, 384, 256, 3, 1, 1), (10, 256, 256, 3, 1, 1)]
_SLICE_OF = {0: 1, 3: 2, 6: 3, 8: 4, 10: 5}


def _fake_lpips_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for idx, cin, cout, k, _, _ in _CONVS:
        sd[f"net.slice{_SLICE_OF[idx]}.{idx}.weight"] = (
            torch.randn(cout, cin, k, k, generator=g) * (2.0 / (cin * k * k)) ** 0.5)
        sd[f"net.slice{_SLICE_OF[idx]}.{idx}.bias"] = torch.randn(cout, generator=g) * 0.1
    for i, (_, _, cout, _, _, _) in enumerate(_CONVS):
        sd[f"lin{i}.model.1.weight"] = torch.rand(1, cout, 1, 1, generator=g) * 0.1
    return sd


def _torch_lpips(sd, a, b):
    """Published lpips forward in torch ops: scaling layer -> AlexNet taps
    after each ReLU (maxpool 3x3 s2 between slices 1-2-3) -> channel
    unit-normalize -> squared diff -> 1x1 lin heads -> spatial mean -> sum."""
    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def taps(x):
        x = (x - shift) / scale
        out = []
        for i, (idx, _, _, _, s, p) in enumerate(_CONVS):
            if i in (1, 2):  # maxpool before convs at features idx 3 and 6
                x = F.max_pool2d(x, 3, 2)
            w = sd[f"net.slice{_SLICE_OF[idx]}.{idx}.weight"]
            bia = sd[f"net.slice{_SLICE_OF[idx]}.{idx}.bias"]
            x = F.relu(F.conv2d(x, w, bia, stride=s, padding=p))
            out.append(x)
        return out

    total = 0.0
    for i, (ta, tb) in enumerate(zip(taps(a), taps(b))):
        na = ta / torch.sqrt(torch.sum(ta ** 2, 1, keepdim=True) + 1e-10)
        nb = tb / torch.sqrt(torch.sum(tb ** 2, 1, keepdim=True) + 1e-10)
        val = F.conv2d((na - nb) ** 2, sd[f"lin{i}.model.1.weight"])
        total = total + val.mean(dim=(1, 2, 3))
    return total


def test_lpips_golden_vs_torch_oracle(rng):
    sd = _fake_lpips_state_dict()
    a = (rng.random((2, 3, 64, 64)) * 2 - 1).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), -1, 1).astype(np.float32)
    with torch.no_grad():
        ref = _torch_lpips(sd, torch.from_numpy(a), torch.from_numpy(b)).numpy()

    model = LPIPS(convert_lpips(sd))
    ours = model(np.transpose(a, (0, 2, 3, 1)), np.transpose(b, (0, 2, 3, 1)))
    np.testing.assert_allclose(ours, float(ref.mean()), rtol=1e-4, atol=1e-5)


def test_lpips_identical_inputs_zero(rng):
    sd = _fake_lpips_state_dict(1)
    a = (rng.random((1, 64, 64, 3)) * 2 - 1).astype(np.float32)
    model = LPIPS(convert_lpips(sd))
    assert abs(model(a, a)) < 1e-6


def test_convert_checkpoint_lpips_roundtrip(tmp_path, rng):
    """convert_checkpoint.py --kind lpips: torch .pth -> .ckpt -> load_lpips
    produces the same metric values."""
    import subprocess
    import sys

    sd = _fake_lpips_state_dict(2)
    pth = str(tmp_path / "lpips_alex.pth")
    out = str(tmp_path / "lpips.ckpt")
    torch.save(sd, pth)
    r = subprocess.run([sys.executable, "/root/repo/convert_checkpoint.py",
                        pth, out, "--kind", "lpips"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    from bfsr_tpu.models.lpips import load_lpips

    a = (rng.random((1, 32, 32, 3)) * 2 - 1).astype(np.float32)
    b = (rng.random((1, 32, 32, 3)) * 2 - 1).astype(np.float32)
    m_ckpt = load_lpips(out)
    m_pth = load_lpips(pth)
    np.testing.assert_allclose(m_ckpt(a, b), m_pth(a, b), rtol=1e-6)
