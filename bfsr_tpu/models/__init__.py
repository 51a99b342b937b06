"""Model zoo.  Importing this package registers every model by name.

Registered names mirror the reference registries:
'edsr-baseline', 'edsr', 'rrdb', 'rdn', 'linf', 'linf-patch', 'flow',
'unet', 'edsr-baseline-latent', 'mlp', 'srflow', 'srflow-unet',
'VGGFeatureExtractor'.
"""

from bfsr_tpu.registry import register, make  # noqa: F401

from bfsr_tpu.models import edsr  # noqa: F401
from bfsr_tpu.models import rrdb  # noqa: F401
from bfsr_tpu.models import rdn  # noqa: F401
from bfsr_tpu.models import flow_linf  # noqa: F401
from bfsr_tpu.models import linf  # noqa: F401
from bfsr_tpu.models import unet  # noqa: F401
from bfsr_tpu.models import edsr_latent  # noqa: F401
from bfsr_tpu.models import swinir  # noqa: F401
from bfsr_tpu.models import swin_latent  # noqa: F401
from bfsr_tpu.models import lpips  # noqa: F401
from bfsr_tpu.models import mlp  # noqa: F401
from bfsr_tpu.models import vgg  # noqa: F401
from bfsr_tpu.models.srflow import srflow_net  # noqa: F401
from bfsr_tpu.models.srflow import unet_prior  # noqa: F401
