"""LRHR pickle dataset for SRFlow training (conf `mode: LRHR_PKL`).

The reference release references this mode (confs/SRFlow-LP_DF2K_4X.yml:29)
but omits its loader (evaluation-only release); this follows the upstream
SRFlow semantics: paired pklv4 crop lists (see prepare_data.py), uint8 ->
[0,1] float, optional horizontal flips, optional n_max cap.
"""

import pickle
import random

import numpy as np

from bfsr_tpu.registry import register


@register("lrhr-pkl")
class LRHRPkl:
    def __init__(self, dataroot_GT, dataroot_LQ, use_flip=False, n_max=None,
                 gt_size=None):
        with open(dataroot_GT, "rb") as f:
            self.hrs = pickle.load(f)
        with open(dataroot_LQ, "rb") as f:
            self.lqs = pickle.load(f)
        assert len(self.hrs) == len(self.lqs)
        if n_max:
            self.hrs = self.hrs[:n_max]
            self.lqs = self.lqs[:n_max]
        self.use_flip = use_flip
        self.gt_size = gt_size

    def __len__(self):
        return len(self.hrs)

    def __getitem__(self, idx):
        hr = np.asarray(self.hrs[idx], np.float32) / 255.0
        lq = np.asarray(self.lqs[idx], np.float32) / 255.0
        if self.gt_size and (hr.shape[0] > self.gt_size
                             or hr.shape[1] > self.gt_size):
            # crop each axis independently: non-square frames (or one axis
            # already <= gt_size) must not feed an empty randint range
            s = hr.shape[0] // lq.shape[0]
            gy = min(self.gt_size, hr.shape[0])
            gx = min(self.gt_size, hr.shape[1])
            y0 = random.randint(0, hr.shape[0] - gy)
            x0 = random.randint(0, hr.shape[1] - gx)
            y0 -= y0 % s
            x0 -= x0 % s
            hr = hr[y0: y0 + gy, x0: x0 + gx]
            lq = lq[y0 // s: (y0 + gy) // s, x0 // s: (x0 + gx) // s]
        if self.use_flip and random.random() < 0.5:
            hr = np.ascontiguousarray(hr[:, ::-1])
            lq = np.ascontiguousarray(lq[:, ::-1])
        return {"GT": hr, "LQ": lq}
