"""Device mesh + sharding helpers.

The reference's only parallelism is nn.DataParallel (LINF-LP/train.py:199-207)
and an unused DDP branch; the TPU-native design scales through
``jax.sharding``:

* **dp** — batch data parallelism for training (batch axis sharded, params
  replicated, gradients all-reduced by XLA's psum insertion).
* **sp** — "query parallelism": arbitrary-scale SR evaluates millions of
  independent per-pixel flow queries; sharding the HR query-grid rows over
  chips is this workload's sequence-parallel analogue (SURVEY §5.7).  The
  prior UNet's convolutions over the spatially-sharded latent get their
  halo exchanges inserted by XLA automatically.

All collectives ride ICI via jit-placed psum/all-gather — no hand-written
NCCL-style code.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes, devices=None):
    """axes: dict name->size, e.g. {'dp': 2, 'sp': 4}.  Sizes must multiply
    to the device count (use -1 for one inferred axis)."""
    devices = devices if devices is not None else jax.devices()
    names = list(axes.keys())
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    mesh_devices = np.asarray(devices[: int(np.prod(sizes))]).reshape(sizes)
    return Mesh(mesh_devices, names)


def replicate(tree, mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh, specs):
    """Place batch dict on the mesh.  specs: key -> PartitionSpec (missing
    keys are replicated)."""
    out = {}
    for k, v in batch.items():
        spec = specs.get(k, P())
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def batch_specs_srflow():
    """PartitionSpecs for an SRFlow training batch (GT/LQ image pairs):
    batch over dp — the reference's only parallelism axis (SURVEY §5.8,
    SRFlow-LP/code/models/SRFlow_model.py:42-53)."""
    return {"GT": P("dp"), "LQ": P("dp")}


def batch_specs_linf(sp=None):
    """Default PartitionSpecs for a LINF-LP training batch: batch over dp,
    HR query rows over sp (when given)."""
    dp = "dp"
    return {
        "inp": P(dp),
        "coord": P(dp, sp),
        "cell": P(dp),
        "gt": P(dp, sp),
        "gt_lr_up": P(dp, sp),
        "gt_pixel": P(dp, sp),
        "gt_patch": P(dp, sp),
        "interpolate_coord": P(dp, sp),
    }
