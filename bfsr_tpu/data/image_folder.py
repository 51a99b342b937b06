"""Image folder datasets (reference: LINF-LP/datasets/image_folder.py).

Images are float32 HWC in [0, 1].  Cache modes: 'none' (decode per access),
'bin' (one-time pickle of the raw decoded array next to the folder),
'in_memory' (decoded once at construction).
"""

import json
import os
import pickle

import numpy as np
from PIL import Image

from bfsr_tpu.registry import register


def _load_image(path):
    return np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0


@register("image-folder")
class ImageFolder:
    def __init__(self, root_path, split_file=None, split_key=None, first_k=None,
                 repeat=1, cache="none"):
        self.repeat = repeat
        self.cache = cache

        if split_file is None:
            filenames = sorted(os.listdir(root_path))
        else:
            with open(split_file) as f:
                filenames = json.load(f)[split_key]
        if first_k is not None:
            filenames = filenames[:first_k]

        self.files = []
        for filename in filenames:
            file = os.path.join(root_path, filename)
            if cache == "none":
                self.files.append(file)
            elif cache == "bin":
                bin_root = os.path.join(os.path.dirname(root_path),
                                        "bin_" + os.path.basename(root_path))
                os.makedirs(bin_root, exist_ok=True)
                bin_file = os.path.join(bin_root, filename.split(".")[0] + ".pkl")
                if not os.path.exists(bin_file):
                    with open(bin_file, "wb") as f:
                        pickle.dump(np.asarray(Image.open(file).convert("RGB")), f)
                self.files.append(bin_file)
            elif cache == "in_memory":
                self.files.append(_load_image(file))
            else:
                raise ValueError(cache)

    def __len__(self):
        return len(self.files) * self.repeat

    def __getitem__(self, idx):
        x = self.files[idx % len(self.files)]
        if self.cache == "none":
            return _load_image(x)
        if self.cache == "bin":
            with open(x, "rb") as f:
                arr = pickle.load(f)
            return np.asarray(arr, dtype=np.float32) / 255.0
        return x


@register("image-folder-DF2K")
class ImageFolderDF2K:
    """DIV2K (cached per `cache`) + Flickr2K (always lazily decoded)
    (image_folder.py:76-187)."""

    def __init__(self, root_path_D2K, root_path_F2K, first_k=None, repeat=1,
                 cache="none"):
        self.repeat = repeat
        self.cache = cache
        self.files = []
        d2k = ImageFolder(root_path_D2K, first_k=first_k, repeat=1, cache=cache)
        self.files.extend(d2k.files)
        self._d2k_cache = cache
        self._n_d2k = len(d2k.files)
        filenames = sorted(os.listdir(root_path_F2K))
        if first_k is not None:
            filenames = filenames[:first_k]
        self.files.extend(os.path.join(root_path_F2K, f) for f in filenames)

    def __len__(self):
        return len(self.files) * self.repeat

    def __getitem__(self, idx):
        x = self.files[idx % len(self.files)]
        if isinstance(x, str):
            if x.endswith(".pkl"):
                with open(x, "rb") as f:
                    arr = pickle.load(f)
                return np.asarray(arr, dtype=np.float32) / 255.0
            return _load_image(x)
        return x


@register("paired-image-folders")
class PairedImageFolders:
    def __init__(self, root_path_1, root_path_2, **kwargs):
        self.dataset_1 = ImageFolder(root_path_1, **kwargs)
        self.dataset_2 = ImageFolder(root_path_2, **kwargs)

    def __len__(self):
        return len(self.dataset_1)

    def __getitem__(self, idx):
        return self.dataset_1[idx], self.dataset_2[idx]
