#!/usr/bin/env python
"""DIV2K/DF2K crop-pickle preparation for SRFlow training
(mirror of SRFlow-LP/code/prepare_data.py).

Usage: python prepare_data.py /path/to/DIV2K_train_HR

Produces ``<parent>/pkls/<name>.pklv4`` (160px HR crops, 47 per image),
``<name>_X4.pklv4`` (MATLAB-bicubic 0.25x LQ crops) and 1% subsets.
"""

import os
import pickle
import random
import sys

import numpy as np
from PIL import Image

from bfsr_tpu.ops.imresize import imresize
from bfsr_tpu.utils.measure import natsorted


def random_crop(img, size, rng):
    h, w = img.shape[:2]
    hs = rng.integers(0, h - size)
    ws = rng.integers(0, w - size)
    return img[hs: hs + size, ws: ws + size]


def to_pklv4(obj, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f, protocol=4)
    print(f"dumped {len(obj)} crops to {path}")


def main(dir_path, crops_per_image=47, crop_size=160, scale=4, seed=0):
    rng = np.random.default_rng(seed)
    paths = natsorted(
        os.path.join(dir_path, p) for p in os.listdir(dir_path)
        if p.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    hrs, lqs = [], []
    for p in paths:
        img = np.asarray(Image.open(p).convert("RGB"))
        for _ in range(crops_per_image):
            crop = random_crop(img, crop_size, rng)
            hrs.append(crop)
            lqs.append(imresize(crop, scale=1.0 / scale))
    combined = list(zip(hrs, lqs))
    random.Random(seed).shuffle(combined)
    hrs[:], lqs[:] = zip(*combined)

    base_dir = os.path.dirname(dir_path.rstrip("/"))
    name = os.path.basename(dir_path.rstrip("/"))
    hrs_path = os.path.join(base_dir, "pkls", name + ".pklv4")
    lqs_path = os.path.join(base_dir, "pkls", name + f"_X{scale}.pklv4")
    to_pklv4(hrs, hrs_path)
    to_pklv4(lqs, lqs_path)
    n = int(round(len(hrs) * 0.01))
    to_pklv4(hrs[:n], hrs_path.replace(".", "_1pct.", 1))
    to_pklv4(lqs[:n], lqs_path.replace(".", "_1pct.", 1))


if __name__ == "__main__":
    assert len(sys.argv) > 1 and os.path.isdir(sys.argv[1])
    main(sys.argv[1])
