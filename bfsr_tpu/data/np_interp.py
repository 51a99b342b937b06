"""Host-side (numpy) resampling twins of bfsr_tpu.ops.interp plus the PIL
bicubic ``resize_fn`` the reference wrappers use for on-the-fly downsampling
(wrappers.py:241-244: ToPILImage -> Resize(BICUBIC) -> ToTensor; note
ToPILImage truncates float*255 to uint8)."""

import numpy as np
from PIL import Image


def _axis_weights(in_size, out_size, align_corners=False):
    out_idx = np.arange(out_size, dtype=np.float64)
    if align_corners and out_size > 1:
        src = out_idx * ((in_size - 1) / (out_size - 1))
    else:
        src = (out_idx + 0.5) * (in_size / out_size) - 0.5
    src = np.clip(src, 0.0, in_size - 1.0)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    return i0, i1, w1


def resize_bilinear_np(x_hwc, out_hw, align_corners=False):
    """torch F.interpolate(bilinear) twin on (H, W, C) numpy arrays."""
    h, w = x_hwc.shape[:2]
    oh, ow = out_hw
    y0, y1, wy = _axis_weights(h, oh, align_corners)
    x0, x1, wx = _axis_weights(w, ow, align_corners)
    top = x_hwc[y0]
    bot = x_hwc[y1]
    xh = top + (bot - top) * wy[:, None, None]
    left = xh[:, x0]
    right = xh[:, x1]
    return left + (right - left) * wx[None, :, None]


def resize_fn_pil(img_hwc, size):
    """Reference ``resize_fn``: float [0,1] HWC -> uint8 (truncating like
    torchvision ToPILImage) -> PIL BICUBIC resize -> float [0,1].

    size: int (shorter side, torchvision Resize semantics) or (h, w).
    """
    arr = img_hwc
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0).astype(np.uint8)
    pil = Image.fromarray(arr)
    if isinstance(size, int):
        w, h = pil.size  # PIL (width, height)
        if h <= w:
            oh, ow = size, max(1, round(size * w / h))
        else:
            ow, oh = size, max(1, round(size * h / w))
    else:
        oh, ow = size
    out = pil.resize((ow, oh), Image.BICUBIC)
    return np.asarray(out, dtype=np.float32) / 255.0
