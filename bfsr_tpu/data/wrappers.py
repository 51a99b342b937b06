"""Dataset wrappers: the sr-implicit-* family.

Reference: LINF-LP/datasets/wrappers.py (all 10 registered wrappers).
Arrays are float32 HWC in [0, 1]; emitted dict keys and value semantics
match the reference (coord in (h, w) [-1,1] grid-center order, cell =
(2/H_hr, 2/W_hr), residuals in [-1, 1] after (x-0.5)/0.5 normalization).

Host-side numpy: these run in loader threads, not on the TPU.
"""

import math
import random

import numpy as np

from bfsr_tpu.data.np_interp import resize_bilinear_np, resize_fn_pil
from bfsr_tpu.registry import register
from bfsr_tpu.utils.coords import make_coord_np


def _augment_factory(augment):
    if not augment:
        return lambda x: x
    hflip = random.random() < 0.5
    vflip = random.random() < 0.5
    dflip = random.random() < 0.5

    def fn(x_hwc):
        if hflip:
            x_hwc = x_hwc[::-1, :, :]
        if vflip:
            x_hwc = x_hwc[:, ::-1, :]
        if dflip:
            x_hwc = np.transpose(x_hwc, (1, 0, 2))
        return np.ascontiguousarray(x_hwc)

    return fn


def _residuals(crop_lr, crop_hr_shape):
    """lr_up ([-1,1] bilinear upsample) and the up-down-up residual
    (wrappers.py:132-134).  Uses the native C++ kernel when built."""
    from bfsr_tpu import native

    lr_norm = (crop_lr - 0.5) / 0.5
    if native.available():
        return native.updownup_residual(lr_norm, crop_hr_shape[:2])
    lr_up = resize_bilinear_np(lr_norm, crop_hr_shape[:2])
    lr_up_down = resize_bilinear_np(lr_up, crop_lr.shape[:2])
    lr_up_residual = lr_up - resize_bilinear_np(lr_up_down, crop_hr_shape[:2])
    return lr_up.astype(np.float32), lr_up_residual.astype(np.float32)


def _cell(hr_shape):
    return np.asarray([2.0 / hr_shape[0], 2.0 / hr_shape[1]], np.float32)


def _patchify_stride_ps(x_hwc, ps, pad_end_h, pad_end_w):
    """Non-overlapping ps-stride unfold with end padding; channel layout
    (c, ky, kx) flattened (wrappers.py:225-228)."""
    x = np.pad(x_hwc, ((0, pad_end_h), (0, pad_end_w), (0, 0)))
    H, W, C = x.shape
    x = x.reshape(H // ps, ps, W // ps, ps, C)
    x = x.transpose(0, 2, 4, 1, 3)  # Hq, Wq, C, ky, kx
    return np.ascontiguousarray(x.reshape(H // ps, W // ps, C * ps * ps))


def _patchify_stride_1(x_hwc, ps):
    """'Same' stride-1 unfold with ps//2 zero padding; per-pixel (c, ky, kx)
    patch channels (wrappers.py:473-476)."""
    pad = ps // 2
    x = np.pad(x_hwc, ((pad, pad), (pad, pad), (0, 0)))
    H, W, C = x_hwc.shape
    windows = np.lib.stride_tricks.sliding_window_view(x, (ps, ps), axis=(0, 1))
    # windows: (H, W, C, ps, ps)
    return np.ascontiguousarray(windows.reshape(H, W, C * ps * ps))


def _center_coords(coord_hw2, ps, pad_h, pad_w):
    c = np.pad(coord_hw2, ((0, pad_h), (0, pad_w), (0, 0)))
    return np.ascontiguousarray(c[ps // 2::ps, ps // 2::ps, :])


def _pad_amount(n, ps):
    return (ps - n % ps) if n % ps else 0


# ---------------------------------------------------------------------------


@register("sr-implicit-paired")
class SRImplicitPaired:
    """LIIF-style flat coord/rgb samples from LR/HR pairs (wrappers.py:16-80)."""

    def __init__(self, dataset, inp_size=None, augment=False, sample_q=None):
        self.dataset = dataset
        self.inp_size = inp_size
        self.augment = augment
        self.sample_q = sample_q

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        img_lr, img_hr = self.dataset[idx]
        s = img_hr.shape[0] // img_lr.shape[0]
        if self.inp_size is None:
            h_lr, w_lr = img_lr.shape[:2]
            crop_lr, crop_hr = img_lr, img_hr[: h_lr * s, : w_lr * s]
        else:
            w_lr = self.inp_size
            x0 = random.randint(0, img_lr.shape[0] - w_lr)
            y0 = random.randint(0, img_lr.shape[1] - w_lr)
            crop_lr = img_lr[x0: x0 + w_lr, y0: y0 + w_lr]
            w_hr = w_lr * s
            crop_hr = img_hr[x0 * s: x0 * s + w_hr, y0 * s: y0 * s + w_hr]
        aug = _augment_factory(self.augment)
        crop_lr, crop_hr = aug(crop_lr), aug(crop_hr)

        hr_coord = make_coord_np(crop_hr.shape[:2])
        hr_rgb = crop_hr.reshape(-1, crop_hr.shape[-1])
        if self.sample_q is not None:
            sel = np.random.choice(len(hr_coord), self.sample_q, replace=False)
            hr_coord, hr_rgb = hr_coord[sel], hr_rgb[sel]
        cell = np.ones_like(hr_coord)
        cell[:, 0] *= 2 / crop_hr.shape[0]
        cell[:, 1] *= 2 / crop_hr.shape[1]
        return {"inp": crop_lr, "coord": hr_coord, "cell": cell, "gt": hr_rgb}


@register("sr-implicit-paired-fast")
class SRImplicitPairedFast:
    """Paired with grid coords + up-down-up residual (wrappers.py:82-152);
    the shipped test config's wrapper."""

    def __init__(self, dataset, inp_size=None, augment=False):
        self.dataset = dataset
        self.inp_size = inp_size
        self.augment = augment

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        img_lr, img_hr = self.dataset[idx]
        s = img_hr.shape[0] // img_lr.shape[0]
        if self.inp_size is None:
            h_lr, w_lr = img_lr.shape[:2]
            h_hr, w_hr = h_lr * s, w_lr * s
            crop_lr, crop_hr = img_lr, img_hr[:h_hr, :w_hr]
        else:
            h_lr = w_lr = self.inp_size
            x0 = random.randint(0, img_lr.shape[0] - w_lr)
            y0 = random.randint(0, img_lr.shape[1] - w_lr)
            crop_lr = img_lr[x0: x0 + w_lr, y0: y0 + w_lr]
            w_hr = w_lr * s
            h_hr = h_lr * s
            crop_hr = img_hr[x0 * s: x0 * s + w_hr, y0 * s: y0 * s + w_hr]
        aug = _augment_factory(self.augment)
        crop_lr, crop_hr = aug(crop_lr), aug(crop_hr)

        hr_coord = make_coord_np((h_hr, w_hr), flatten=False)
        hr_rgb = crop_hr
        _, lr_up_residual = _residuals(crop_lr, crop_hr.shape)

        if self.inp_size is not None:
            x0 = random.randint(0, h_hr - h_lr)
            y0 = random.randint(0, w_hr - w_lr)
            hr_coord = hr_coord[x0: x0 + h_lr, y0: y0 + w_lr]
            hr_rgb = crop_hr[x0: x0 + h_lr, y0: y0 + w_lr]
            lr_up_residual = lr_up_residual[x0: x0 + h_lr, y0: y0 + w_lr]

        return {"inp": crop_lr, "coord": hr_coord, "cell": _cell(crop_hr.shape),
                "gt": hr_rgb, "gt_lr_up": lr_up_residual}


@register("sr-implicit-paired-fast-patch")
class SRImplicitPairedFastPatch:
    """Paired + ps-stride patch unfold, patch-center coords
    (wrappers.py:154-238)."""

    def __init__(self, dataset, inp_size=None, augment=False, patch_size=3):
        self.dataset = dataset
        self.inp_size = inp_size
        self.augment = augment
        self.patch_size = patch_size

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        base = SRImplicitPairedFast(
            _SingleItem(self.dataset[idx]), inp_size=self.inp_size, augment=self.augment
        )[0]
        ps = self.patch_size
        hr_coord = base["coord"]
        h, w = hr_coord.shape[:2]
        pad_h, pad_w = ps - h % ps, ps - w % ps  # reference always pads (even if %==0)
        coord_center = _center_coords(hr_coord, ps, pad_h, pad_w)
        lr_up_patch = _patchify_stride_ps(base["gt_lr_up"], ps, pad_h, pad_w)
        return {"inp": base["inp"], "gt_lr_up": lr_up_patch, "coord": coord_center,
                "cell": base["cell"], "gt": base["gt"]}


class _SingleItem:
    def __init__(self, item):
        self.item = item

    def __len__(self):
        return 1

    def __getitem__(self, idx):
        return self.item


def _downsample_crop(img, s, inp_size):
    """Shared random-scale crop+PIL-downsample logic (wrappers.py:335-355)."""
    if inp_size is None:
        h_lr = math.floor(img.shape[0] / s + 1e-9)
        w_lr = math.floor(img.shape[1] / s + 1e-9)
        h_hr, w_hr = round(h_lr * s), round(w_lr * s)
        crop_hr = img[:h_hr, :w_hr]
        crop_lr = resize_fn_pil(crop_hr, (h_lr, w_lr))
    else:
        h_lr = w_lr = inp_size
        h_hr, w_hr = round(h_lr * s), round(w_lr * s)
        x0 = random.randint(0, img.shape[0] - w_hr)
        y0 = random.randint(0, img.shape[1] - w_hr)
        crop_hr = img[x0: x0 + w_hr, y0: y0 + w_hr]
        crop_lr = resize_fn_pil(crop_hr, w_lr)
    return crop_lr, crop_hr, h_lr, w_lr, h_hr, w_hr


@register("sr-implicit-downsampled")
class SRImplicitDownsampled:
    """Random-scale on-the-fly downsample, flat samples (wrappers.py:247-316)."""

    def __init__(self, dataset, inp_size=None, scale_min=1, scale_max=None,
                 augment=False, sample_q=None):
        self.dataset = dataset
        self.inp_size = inp_size
        self.scale_min = scale_min
        self.scale_max = scale_max if scale_max is not None else scale_min
        self.augment = augment
        self.sample_q = sample_q

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        img = self.dataset[idx]
        s = random.uniform(self.scale_min, self.scale_max)
        crop_lr, crop_hr, *_ = _downsample_crop(img, s, self.inp_size)
        aug = _augment_factory(self.augment)
        crop_lr, crop_hr = aug(crop_lr), aug(crop_hr)
        hr_coord = make_coord_np(crop_hr.shape[:2])
        hr_rgb = crop_hr.reshape(-1, crop_hr.shape[-1])
        if self.sample_q is not None:
            sel = np.random.choice(len(hr_coord), self.sample_q, replace=False)
            hr_coord, hr_rgb = hr_coord[sel], hr_rgb[sel]
        cell = np.ones_like(hr_coord)
        cell[:, 0] *= 2 / crop_hr.shape[0]
        cell[:, 1] *= 2 / crop_hr.shape[1]
        return {"inp": crop_lr, "coord": hr_coord, "cell": cell, "gt": hr_rgb}


@register("sr-implicit-downsampled-fast")
class SRImplicitDownsampledFast:
    """+ gt_pixel (HR-lr_up residual) and gt_lr_up residual; random query
    subset of h_lr*w_lr when inp_size is set (wrappers.py:319-409)."""

    def __init__(self, dataset, inp_size=None, scale_min=1, scale_max=None,
                 augment=False):
        self.dataset = dataset
        self.inp_size = inp_size
        self.scale_min = scale_min
        self.scale_max = scale_max if scale_max is not None else scale_min
        self.augment = augment

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        img = self.dataset[idx]
        s = random.uniform(self.scale_min, self.scale_max)
        crop_lr, crop_hr, h_lr, w_lr, h_hr, w_hr = _downsample_crop(img, s, self.inp_size)
        aug = _augment_factory(self.augment)
        crop_lr, crop_hr = aug(crop_lr), aug(crop_hr)

        hr_coord = make_coord_np((h_hr, w_hr), flatten=False)
        hr_rgb = crop_hr
        lr_up, lr_up_residual = _residuals(crop_lr, crop_hr.shape)
        hr_rgb_residual = ((crop_hr - 0.5) / 0.5) - lr_up

        if self.inp_size is not None:
            sel = np.random.choice(h_hr * w_hr, h_lr * w_lr, replace=False)
            hr_coord = hr_coord.reshape(-1, 2)[sel].reshape(h_lr, w_lr, 2)
            hr_rgb = crop_hr.reshape(-1, 3)[sel].reshape(h_lr, w_lr, 3)
            lr_up_residual = lr_up_residual.reshape(-1, 3)[sel].reshape(h_lr, w_lr, 3)
            hr_rgb_residual = hr_rgb_residual.reshape(-1, 3)[sel].reshape(h_lr, w_lr, 3)

        return {"inp": crop_lr, "coord": hr_coord, "cell": _cell(crop_hr.shape),
                "gt": hr_rgb, "gt_pixel": hr_rgb_residual.astype(np.float32),
                "gt_lr_up": lr_up_residual}


@register("sr-implicit-downsampled-fast-patch")
class SRImplicitDownsampledFastPatch:
    """Stride-1 'same' patch unfold of both residuals, random query subset
    (wrappers.py:412-513)."""

    def __init__(self, dataset, inp_size=None, scale_min=1, scale_max=None,
                 augment=False, patch_size=3):
        self.dataset = dataset
        self.inp_size = inp_size
        self.scale_min = scale_min
        self.scale_max = scale_max if scale_max is not None else scale_min
        self.augment = augment
        self.patch_size = patch_size

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        img = self.dataset[idx]
        s = random.uniform(self.scale_min, self.scale_max)
        crop_lr, crop_hr, h_lr, w_lr, h_hr, w_hr = _downsample_crop(img, s, self.inp_size)
        aug = _augment_factory(self.augment)
        crop_lr, crop_hr = aug(crop_lr), aug(crop_hr)
        ps = self.patch_size

        hr_coord = make_coord_np((h_hr, w_hr), flatten=False)
        lr_up, lr_up_residual = _residuals(crop_lr, crop_hr.shape)
        hr_rgb_residual = ((crop_hr - 0.5) / 0.5) - lr_up
        hr_rgb = crop_hr

        hr_rgb_patch = _patchify_stride_1(hr_rgb_residual.astype(np.float32), ps)
        lr_up_patch = _patchify_stride_1(lr_up_residual, ps)

        if self.inp_size is not None:
            sel = np.random.choice(h_hr * w_hr, h_lr * w_lr, replace=False)
            hr_coord = hr_coord.reshape(-1, 2)[sel].reshape(h_lr, w_lr, 2)
            d = hr_rgb_patch.shape[-1]
            hr_rgb_patch = hr_rgb_patch.reshape(-1, d)[sel].reshape(h_lr, w_lr, d)
            lr_up_patch = lr_up_patch.reshape(-1, d)[sel].reshape(h_lr, w_lr, d)
            hr_rgb = hr_rgb.reshape(-1, 3)[sel].reshape(h_lr, w_lr, 3)

        return {"inp": crop_lr, "coord": hr_coord, "cell": _cell(crop_hr.shape),
                "gt": hr_rgb, "gt_patch": hr_rgb_patch, "gt_lr_up": lr_up_patch}


@register("sr-implicit-downsampled-fast-patch-test")
class SRImplicitDownsampledFastPatchTest:
    """Eval-time variant: ps-stride unfold + patch-center coords
    (wrappers.py:516-613)."""

    def __init__(self, dataset, inp_size=None, scale_min=1, scale_max=None,
                 augment=False, patch_size=3):
        self.dataset = dataset
        self.inp_size = inp_size
        self.scale_min = scale_min
        self.scale_max = scale_max if scale_max is not None else scale_min
        self.augment = augment
        self.patch_size = patch_size

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        img = self.dataset[idx]
        s = random.uniform(self.scale_min, self.scale_max)
        crop_lr, crop_hr, h_lr, w_lr, h_hr, w_hr = _downsample_crop(img, s, self.inp_size)
        aug = _augment_factory(self.augment)
        crop_lr, crop_hr = aug(crop_lr), aug(crop_hr)
        ps = self.patch_size

        hr_coord = make_coord_np((h_hr, w_hr), flatten=False)
        hr_rgb = crop_hr
        _, lr_up_residual = _residuals(crop_lr, crop_hr.shape)

        if self.inp_size is not None:
            x0 = random.randint(0, h_hr - h_lr)
            y0 = random.randint(0, w_hr - w_lr)
            hr_coord = hr_coord[x0: x0 + h_lr, y0: y0 + w_lr]
            hr_rgb = crop_hr[x0: x0 + h_lr, y0: y0 + w_lr]

        h, w = hr_coord.shape[:2]
        pad_h, pad_w = _pad_amount(h, ps), _pad_amount(w, ps)
        coord_center = _center_coords(hr_coord, ps, pad_h, pad_w)
        lr_up_patch = _patchify_stride_ps(lr_up_residual, ps, pad_h, pad_w)
        return {"inp": crop_lr, "gt_lr_up": lr_up_patch, "coord": coord_center,
                "cell": _cell(crop_hr.shape), "gt": hr_rgb}


@register("sr-implicit-downsampled-fast-crop")
class SRImplicitDownsampledFastCrop:
    """Train-time: aligned HR/coord/residual window crops
    (wrappers.py:616-682; train.py appends '-crop' to the wrapper name)."""

    def __init__(self, dataset, inp_size=48, scale_max=4, augment=False):
        self.dataset = dataset
        self.out_size = inp_size
        self.scale_max = scale_max
        self.augment = augment

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        img = self.dataset[idx]
        s = random.uniform(1, self.scale_max)
        h_lr = w_lr = self.out_size
        h_hr, w_hr = round(h_lr * s), round(w_lr * s)
        x0 = random.randint(0, img.shape[0] - h_hr)
        y0 = random.randint(0, img.shape[1] - w_hr)
        crop_hr = img[x0: x0 + w_hr, y0: y0 + w_hr]
        crop_lr = resize_fn_pil(crop_hr, (h_lr, w_lr))
        aug = _augment_factory(self.augment)
        crop_lr, crop_hr = aug(crop_lr), aug(crop_hr)

        hr_coord = make_coord_np((h_hr, w_hr), flatten=False)
        hr_rgb = crop_hr
        lr_up, lr_up_residual = _residuals(crop_lr, crop_hr.shape)
        hr_rgb_residual = (((crop_hr - 0.5) / 0.5) - lr_up).astype(np.float32)

        x0 = random.randint(0, hr_rgb.shape[0] - self.out_size)
        y0 = random.randint(0, hr_rgb.shape[1] - self.out_size)
        sl = np.s_[x0: x0 + self.out_size, y0: y0 + self.out_size]
        return {"inp": crop_lr, "coord": hr_coord[sl], "cell": _cell(crop_hr.shape),
                "gt": hr_rgb[sl], "gt_lr_up": lr_up_residual[sl],
                "gt_pixel": hr_rgb_residual[sl]}


@register("sr-implicit-downsampled-fast-crop-patch")
class SRImplicitDownsampledFastCropPatch:
    """Patch train-time variant with interpolate_coord for the VGG-loss
    residual add (wrappers.py:686-784)."""

    def __init__(self, dataset, inp_size=48, scale_max=4, augment=False, patch_size=3):
        self.dataset = dataset
        self.out_size = inp_size * patch_size
        self.scale_max = scale_max
        self.augment = augment
        self.patch_size = patch_size

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        img = self.dataset[idx]
        s = random.uniform(1, self.scale_max)
        ps = self.patch_size
        h_lr = w_lr = self.out_size
        h_hr, w_hr = round(h_lr * s), round(w_lr * s)
        x0 = random.randint(0, img.shape[0] - h_hr)
        y0 = random.randint(0, img.shape[1] - w_hr)
        crop_hr = img[x0: x0 + w_hr, y0: y0 + w_hr]
        crop_lr = resize_fn_pil(crop_hr, (h_lr, w_lr))
        aug = _augment_factory(self.augment)
        crop_lr, crop_hr = aug(crop_lr), aug(crop_hr)

        hr_coord = make_coord_np((h_hr, w_hr), flatten=False)
        hr_rgb = crop_hr
        lr_up, lr_up_residual = _residuals(crop_lr, crop_hr.shape)
        hr_rgb_residual = (((crop_hr - 0.5) / 0.5) - lr_up).astype(np.float32)

        hr_rgb_patch = _patchify_stride_1(hr_rgb_residual, ps)
        lr_up_patch = _patchify_stride_1(lr_up_residual, ps)

        x0 = random.randint(0, hr_rgb.shape[0] - self.out_size)
        y0 = random.randint(0, hr_rgb.shape[1] - self.out_size)
        sl = np.s_[x0: x0 + self.out_size, y0: y0 + self.out_size]
        hr_coord = hr_coord[sl]
        hr_rgb = hr_rgb[sl]
        hr_rgb_patch = hr_rgb_patch[sl]
        lr_up_patch = lr_up_patch[sl]

        # center-sample the stride-1 patches at ps-stride positions
        hr_rgb_patch_center = hr_rgb_patch[ps // 2::ps, ps // 2::ps]
        lr_up_patch_center = lr_up_patch[ps // 2::ps, ps // 2::ps]

        h, w = hr_coord.shape[:2]
        pad_h, pad_w = _pad_amount(h, ps), _pad_amount(w, ps)
        coord_center = _center_coords(hr_coord, ps, pad_h, pad_w)

        return {"inp": crop_lr, "coord": coord_center, "cell": _cell(crop_hr.shape),
                "gt": hr_rgb, "gt_patch": hr_rgb_patch_center,
                "gt_lr_up": lr_up_patch_center, "interpolate_coord": hr_coord}


@register("sr-implicit-uniform-varied")
class SRImplicitUniformVaried:
    """Varied HR size schedule (legacy LIIF; wrappers.py:785-833)."""

    def __init__(self, dataset, size_min, size_max=None, augment=False,
                 gt_resize=None, sample_q=None):
        self.dataset = dataset
        self.size_min = size_min
        self.size_max = size_max if size_max is not None else size_min
        self.augment = augment
        self.gt_resize = gt_resize
        self.sample_q = sample_q

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        img_lr, img_hr = self.dataset[idx]
        p = idx / (len(self.dataset) - 1)
        w_hr = round(self.size_min + (self.size_max - self.size_min) * p)
        img_hr = resize_fn_pil(img_hr, w_hr)
        if self.augment and random.random() < 0.5:
            img_lr = np.ascontiguousarray(img_lr[:, ::-1])
            img_hr = np.ascontiguousarray(img_hr[:, ::-1])
        if self.gt_resize is not None:
            img_hr = resize_fn_pil(img_hr, self.gt_resize)
        hr_coord = make_coord_np(img_hr.shape[:2])
        hr_rgb = img_hr.reshape(-1, img_hr.shape[-1])
        if self.sample_q is not None:
            sel = np.random.choice(len(hr_coord), self.sample_q, replace=False)
            hr_coord, hr_rgb = hr_coord[sel], hr_rgb[sel]
        cell = np.ones_like(hr_coord)
        cell[:, 0] *= 2 / img_hr.shape[0]
        cell[:, 1] *= 2 / img_hr.shape[1]
        return {"inp": img_lr, "coord": hr_coord, "cell": cell, "gt": hr_rgb}
