"""Datasets and wrappers.  Importing registers:
'image-folder', 'image-folder-DF2K', 'paired-image-folders', and the
sr-implicit-* wrapper family.
"""

from bfsr_tpu.data import image_folder  # noqa: F401
from bfsr_tpu.data import wrappers  # noqa: F401
from bfsr_tpu.data import pkl_dataset  # noqa: F401
from bfsr_tpu.data.loader import DataLoader  # noqa: F401
