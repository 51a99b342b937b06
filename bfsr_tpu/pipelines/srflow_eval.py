"""SRFlow-LP inference pipeline (mirror of SRFlow-LP/code/test.py:85-176).

Per image: pad LR to a multiple of 2 (reflect), bilinear-upsample LR x scale,
encode epses with no quantization noise, standardize each eps per-pixel
across channels, run the two-branch UNet prior, decode — all inside one
jitted program per LR shape.
"""

import numpy as np

import jax
import jax.numpy as jnp

from bfsr_tpu.models.srflow.srflow_net import standardize_epses
from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.ops.interp import resize_bilinear


class SRFlowLPPredictor:
    """pad_multiple > 2 buckets LR shapes (reflect-pad up, crop the SR
    back) so a dataset sweep compiles one program per bucket instead of
    one per image — first compiles take minutes on this platform.  The
    reference protocol's %2 pad (test.py:100-106) is the lower bound."""

    def __init__(self, model, prior_model, pad_multiple=2,
                 use_step_kernel=None):
        self.model = model
        self.prior = prior_model
        self.pad_multiple = max(2, int(pad_multiple or 2))
        if use_step_kernel is None:
            # OFF by default: hardware A/B (BENCH_NOTES r4) measured the
            # fused FlowStep Pallas path LOSING in the full pipeline —
            # standalone the level-3 chain wins 1.05-1.14x, but in-program
            # the pad/unpad boundaries and layout transitions cost more
            # than the kernel saves (83.5 -> 95.9 ms, 0.86-0.88x).
            # BFSR_SRFLOW_STEP_KERNEL: on|1 enables (level 3, the only
            # standalone winner), comma levels e.g. "2,3" picks exactly
            # those, off (default) keeps the XLA path.  Requires real
            # Mosaic (interpret mode is CPU-testing only) + frozen anic.
            import os

            env = os.environ.get("BFSR_SRFLOW_STEP_KERNEL", "off").lower()
            if env in ("off", "0", "false", "none", "auto"):
                use_step_kernel = False
            elif env in ("on", "1", "true"):
                use_step_kernel = jax.default_backend() == "tpu"
            else:
                try:
                    use_step_kernel = tuple(int(x) for x in env.split(","))
                except ValueError:
                    raise ValueError(
                        f"BFSR_SRFLOW_STEP_KERNEL={env!r}: expected "
                        "on|off or a comma-separated list of flow levels "
                        "(e.g. '2,3')") from None
        # True -> the standalone-win level set; a tuple -> exactly those
        # levels (see BENCH_NOTES r4 for the per-level numbers).
        if use_step_kernel is True:
            self.kernel_levels = (3,)
        elif use_step_kernel:
            self.kernel_levels = tuple(use_step_kernel)
        else:
            self.kernel_levels = None
        self.use_step_kernel = bool(use_step_kernel)
        self._fn = jax.jit(self._impl)

    def _impl(self, params, prior_params, lr):
        model = self.model
        s = model.scale
        h, w = lr.shape[1], lr.shape[2]
        lr_up = resize_bilinear(lr, (h * s, w * s))
        lr_enc = model.preprocess(params, lr)
        ft_cache = model.precompute_ft(params, lr_enc)
        kctx = (model.prep_kernel_ctx(params, ft_cache,
                                      levels=self.kernel_levels)
                if self.use_step_kernel else None)
        epses, _, _ = model.normal_flow(params, lr_up, lr, add_gt_noise=False,
                                        lr_enc=lr_enc, ft_cache=ft_cache,
                                        want_logdet=False, kernel_ctx=kctx)
        epses = standardize_epses(epses)
        # stage scope: under BFSR_PRECISION=mixed the prior runs bf16
        # (measured 102.0 dB benign, BENCH_NOTES SRFlow attribution) while
        # the fragile conditioning stages (~43-47 dB each) stay HIGH
        with fnn.stage("prior"):
            learned = self.prior.apply(prior_params, epses)
        sr, _ = model.reverse_flow(params, lr, epses=learned,
                                   add_gt_noise=False, lr_enc=lr_enc,
                                   ft_cache=ft_cache, want_logdet=False,
                                   kernel_ctx=kctx)
        return sr

    def predict(self, lr_img01):
        """lr_img01: (h, w, 3) float [0,1] numpy.  Returns SR numpy [0,1],
        cropped to h*scale x w*scale."""
        h, w = lr_img01.shape[:2]
        m = self.pad_multiple
        pad_h = int(np.ceil(h / m) * m - h)
        pad_w = int(np.ceil(w / m) * m - w)
        # 'symmetric' = the reference's flipped-image pad (LINF test.py
        # window mechanics); valid for pads up to the image size
        padded = np.pad(lr_img01, ((0, pad_h), (0, pad_w), (0, 0)),
                        "symmetric" if m > 2 else "reflect")
        sr = self._fn(self.model.params, self.prior.params,
                      jnp.asarray(padded[None], jnp.float32))
        sr = np.asarray(jnp.clip(sr, 0.0, 1.0))[0]
        s = self.model.scale
        return sr[: h * s, : w * s]


class SRFlowSpatialPredictor:
    """ONE image spatially sharded across devices (image width over a mesh
    axis) — the reference's DataParallel can only put different images on
    different GPUs (SRFlow_model.py:42-53); this puts one DIV2K-size image
    on a whole slice.

    TPU-native design: instead of hand-written halo exchanges, the
    existing predictor body is jitted with W-sharded in/out shardings and
    XLA's SPMD partitioner inserts collective-permute halo exchanges for
    every conv (the conditioning cache uses the plain NHWC form — the
    phase-decomposed s2d level-1 cache hand-places border rings, which
    would partition as scattered updates).  Verified sharded == unsharded
    in tests/test_sharded.py; the compiled module's collectives are
    inspectable via ``.lowered.compile()``.
    """

    def __init__(self, model, prior_model, mesh, axis="sp"):
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.model = model
        self.prior = prior_model
        self.mesh = mesh
        self.axis = axis
        self.n_shards = mesh.shape[axis]
        rep = NamedSharding(mesh, P())
        col = NamedSharding(mesh, P(None, None, axis, None))
        self._fn = jax.jit(self._impl, in_shardings=(rep, rep, col),
                           out_shardings=col)

    def _impl(self, params, prior_params, lr):
        from bfsr_tpu.models.srflow import flow_upsampler as fup

        model = self.model
        s = model.scale
        h, w = lr.shape[1], lr.shape[2]
        lr_up = resize_bilinear(lr, (h * s, w * s))
        lr_enc = model.preprocess(params, lr)
        ft_cache = fup.precompute_ft(params["flow"], model.plan,
                                     model._conds(lr_enc), lvl1_s2d=False)
        epses, _, _ = model.normal_flow(params, lr_up, lr, add_gt_noise=False,
                                        lr_enc=lr_enc, ft_cache=ft_cache,
                                        want_logdet=False)
        epses = standardize_epses(epses)
        with fnn.stage("prior"):
            learned = self.prior.apply(prior_params, epses)
        sr, _ = model.reverse_flow(params, lr, epses=learned,
                                   add_gt_noise=False, lr_enc=lr_enc,
                                   ft_cache=ft_cache, want_logdet=False)
        return sr

    def predict(self, lr_img01):
        """lr_img01: (h, w, 3) float [0,1] numpy.  Pads W so every flow
        level and prior stage shards evenly (multiple of 8 * n_shards),
        H to the %2 protocol pad.  Returns SR numpy [0,1]."""
        h, w = lr_img01.shape[:2]
        mw = 8 * self.n_shards
        pad_h = int(np.ceil(h / 2) * 2 - h)
        pad_w = int(np.ceil(w / mw) * mw - w)
        padded = np.pad(lr_img01, ((0, pad_h), (0, pad_w), (0, 0)),
                        "symmetric")
        with self.mesh:
            sr = self._fn(self.model.params, self.prior.params,
                          jnp.asarray(padded[None], jnp.float32))
        sr = np.asarray(jnp.clip(sr, 0.0, 1.0))[0]
        s = self.model.scale
        return sr[: h * s, : w * s]


def validate(model, batches, heats=(0.0, 0.5, 0.75, 1.0), n_sample=3, seed=0,
             limit=None):
    """Validation mirror of SRFlowModel.test() (SRFlow_model.py:178-189):
    sample SR at each heat x n_sample and compute the mean NLL of GT.

    batches: iterable of {'GT': (1,H,W,3), 'LQ': (1,h,w,3)} numpy dicts.
    GT spatial dims must be divisible by 2^L (the flow squeezes; training
    crops are 160 = 8*20).  Returns (mean_nll, samples dict
    {(heat, i): np image} for the last batch).
    """
    import jax

    # jit the three device programs once (per LQ/GT shape): running the
    # flow eagerly costs ~1-1.5 ms of dispatch PER OP on this platform
    pre = jax.jit(lambda p, lq: model.preprocess(p, lq))
    rev = jax.jit(lambda p, lq, z, heat, key, enc: model.reverse_flow(
        p, lq, z=z, eps_std=heat, key=key, lr_enc=enc,
        want_logdet=False)[0])
    nfl = jax.jit(lambda p, gt, lq, key, enc: model.normal_flow(
        p, gt, lq, key=key, add_gt_noise=True, lr_enc=enc)[1])

    nlls = []
    samples = {}
    for bi, batch in enumerate(batches):
        if limit is not None and bi >= limit:
            break
        lq = jnp.asarray(batch["LQ"], jnp.float32)
        gt = jnp.asarray(batch["GT"], jnp.float32)
        key = jax.random.PRNGKey(seed + bi)
        # RRDB conditioning computed once per batch, shared across all
        # heats/samples and the NLL pass (the reference recomputes it per
        # reverse call, SRFlow_model.py:178-189)
        lr_enc = pre(model.params, lq)
        for heat in heats:
            for i in range(n_sample):
                key, sub = jax.random.split(key)
                z = model.sample_z(sub, heat, lq.shape[0], lq.shape[1:3])
                sr = rev(model.params, lq, z, jnp.float32(heat), sub, lr_enc)
                samples[(heat, i)] = np.asarray(jnp.clip(sr, 0, 1))[0]
        key, sub = jax.random.split(key)
        nll = nfl(model.params, gt, lq, sub, lr_enc)
        nlls.append(float(jnp.mean(nll)))
    return float(np.mean(nlls)), samples


def sample_sr(model, lr_img01, heat=0.0, seed=0):
    """Plain SRFlow sampling at temperature `heat` (SRFlow_model.get_sr).

    The jitted decode is cached ON the model (heat rides in as a traced
    scalar) so repeated calls dispatch the compiled program instead of
    retracing a fresh jit wrapper every time."""
    h, w = lr_img01.shape[:2]
    pad_h = int(np.ceil(h / 2) * 2 - h)
    pad_w = int(np.ceil(w / 2) * 2 - w)
    padded = np.pad(lr_img01, ((0, pad_h), (0, pad_w), (0, 0)), "reflect")
    lr = jnp.asarray(padded[None], jnp.float32)
    key = jax.random.PRNGKey(seed)
    z = model.sample_z(key, heat, 1, lr.shape[1:3])
    # cache key includes the global precision mode: the traced program
    # bakes the conv precision in, so a mode switch mid-process (e.g. a
    # serving-vs-HIGH sweep) must not re-dispatch the stale compile
    from bfsr_tpu.ops import nn as _fnn

    cache = getattr(model, "_sample_sr_fns", None)
    if cache is None:
        cache = model._sample_sr_fns = {}
    fn = cache.get(_fnn.default_precision())
    if fn is None:
        fn = jax.jit(lambda p, x, z_, h_, k: model.get_sr(p, x, heat=h_,
                                                          z=z_, key=k))
        cache[_fnn.default_precision()] = fn
    sr = fn(model.params, lr, z, jnp.float32(heat), key)
    s = model.scale
    return np.asarray(jnp.clip(sr, 0.0, 1.0))[0][: h * s, : w * s]
