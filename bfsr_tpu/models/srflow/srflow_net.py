"""SRFlowNet: RRDB conditioning + FlowUpsamplerNet, NLL in bits/dim.

Reference: SRFlow-LP/code/models/modules/SRFlowNet_arch.py.  The model:

* ``rrdb_preprocess`` runs the RRDB trunk with taps, concatenates blocks
  [1, 8, 15, 22] and appends their nearest-resized stack to every ``fea_up*``
  conditioning map (SRFlowNet_arch.py:118-138) -> 320 channels per level.
* ``normal_flow`` (encode): optional uniform quantization noise +
  ``-log(quant)*pixels`` logdet, flow encode, NLL in bits/dim
  (:83-116).
* ``reverse_flow`` (decode): z or epses -> SR image (:145-158).

Registered as 'srflow'.  The learned-prior eval path
(SRFlow-LP/code/test.py:134-148) is ``encode_epses`` -> per-pixel channel
standardization -> two-branch UNet -> ``decode``.
"""

import math

import jax
import jax.numpy as jnp

from bfsr_tpu.models.base import Model
from bfsr_tpu.models.rrdb import init_rrdb, rrdb_apply_steps
from bfsr_tpu.models.srflow import flow_upsampler as fup
from bfsr_tpu.ops import flows
from bfsr_tpu.ops.interp import resize_nearest
from bfsr_tpu.registry import register


def rrdb_preprocess(params, lr, scale=4, block_idxs=(1, 8, 15, 22), concat=True,
                    fea_up0=True, fea_upm1=False):
    results = rrdb_apply_steps(params, lr, scale=scale, block_idxs=block_idxs,
                               fea_up0=fea_up0, fea_upm1=fea_upm1)
    if block_idxs and concat:
        stack = jnp.concatenate([results[f"block_{i}"] for i in block_idxs], -1)
        keys = ["last_lr_fea", "fea_up1", "fea_up2", "fea_up4"]
        if "fea_up0" in results:
            keys.append("fea_up0")
        if "fea_up-1" in results:
            keys.append("fea_up-1")
        if scale >= 8:
            keys.append("fea_up8")
        if scale == 16:
            keys.append("fea_up16")
        for k in keys:
            h, w = results[k].shape[1], results[k].shape[2]
            results[k] = jnp.concatenate(
                [results[k], resize_nearest(stack, (h, w))], -1
            )
    return results


@register("srflow")
class SRFlowNet(Model):
    registry_name = "srflow"

    def __init__(self, in_nc=3, out_nc=3, nf=64, nb=23, gc=32, scale=4, K=16, L=3,
                 hidden_channels=64, additional_steps=2, split_enable=True,
                 stack_blocks=(1, 8, 15, 22), stack_concat=True, fea_up0=True,
                 fea_upm1=False, quant=32):
        super().__init__()
        self.args = dict(in_nc=in_nc, out_nc=out_nc, nf=nf, nb=nb, gc=gc, scale=scale,
                         K=K, L=L, hidden_channels=hidden_channels,
                         additional_steps=additional_steps, split_enable=split_enable,
                         stack_blocks=tuple(stack_blocks), stack_concat=stack_concat,
                         fea_up0=fea_up0, fea_upm1=fea_upm1, quant=quant)
        self.scale = scale
        self.L = L
        self.quant = quant
        self.stack_blocks = tuple(stack_blocks)
        self.stack_concat = stack_concat
        self.fea_up0 = fea_up0
        self.fea_upm1 = fea_upm1
        self.plan, self.final_c = fup.build_plan(
            scale, L, K, additional_steps, split_enable, base_c=in_nc
        )
        cond_channels = (len(stack_blocks) + 1) * nf if stack_concat else nf
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        self.params = {
            "rrdb": init_rrdb(k1, in_nc, out_nc, nf, nb, gc, scale, upsampling=True),
            "flow": fup.init_flow_upsampler(k2, self.plan, cond_channels, hidden_channels),
        }

    def freeze(self):
        self.params = dict(self.params)
        self.params["flow"] = fup.cache_flow_inverses(self.params["flow"])
        return self

    def prime_actnorms(self, params, gt, lr):
        """Data-dependent actnorm init from one (gt, lr) batch (reference
        FlowActNorms.py:45-59).  Returns a new params tree; only meaningful
        on random-init params (converted checkpoints carry trained stats),
        and must run before :meth:`freeze`."""
        lr_enc = self.preprocess(params, lr)
        flow = fup.prime_actnorms(params["flow"], self.plan, gt,
                                  self._conds(lr_enc))
        out = dict(params)
        out["flow"] = flow
        return out

    # -- pure functions ---------------------------------------------------

    def preprocess(self, params, lr):
        return rrdb_preprocess(params["rrdb"], lr, self.scale, self.stack_blocks,
                               self.stack_concat, self.fea_up0, self.fea_upm1)

    def _conds(self, lr_enc):
        names = fup.LEVEL_NAMES[self.scale]
        return {lvl: lr_enc[names[lvl]] for lvl in range(1, self.L + 1)}

    def prep_kernel_ctx(self, params, ft_cache, interpret=False, levels=None):
        """Fused FlowStep kernel operands (fup.prep_kernel_ctx) for the
        B=1 frozen-eval predictors; None when the params/caches do not
        qualify (unfrozen, batched, or missing caches).  ``levels``
        restricts the kernel to those flow levels (see fup docstring:
        only level 3 wins standalone, and even that loses in-program —
        the predictor defaults the kernel OFF)."""
        if ft_cache is None:
            return None
        return fup.prep_kernel_ctx(params["flow"], self.plan, ft_cache,
                                   interpret=interpret, levels=levels)

    def normal_flow(self, params, gt, lr, key=None, add_gt_noise=True, lr_enc=None,
                    collect_epses=True, ft_cache=None, want_logdet=True,
                    kernel_ctx=None):
        """Encode GT -> (epses, nll, logdet) (SRFlowNet_arch.py:83-116).

        ``want_logdet=False`` drops the whole log-det chain (54 per-step
        reductions + cached ft log-dets): the eval path only needs the
        epses, so the predictors skip it (nll/logdet return None)."""
        if lr_enc is None:
            lr_enc = self.preprocess(params, lr)
        B = gt.shape[0]
        pixels = gt.shape[1] * gt.shape[2]
        logdet = jnp.zeros((B,), jnp.float32) if want_logdet else None
        z = gt
        if add_gt_noise:
            noise = (jax.random.uniform(key, gt.shape, gt.dtype) - 0.5) / self.quant
            z = z + noise
            if logdet is not None:
                logdet = logdet + (-math.log(self.quant) * pixels)
        epses, logdet = fup.encode(params["flow"], self.plan, z, self._conds(lr_enc),
                                   logdet, ft_cache=ft_cache,
                                   kernel_ctx=kernel_ctx)
        z_final = epses[-1]
        if logdet is not None:
            objective = logdet + flows.gaussian_logp(z_final)
            nll = -objective / (math.log(2.0) * pixels)
        else:
            nll = None
        if collect_epses:
            return epses, nll, logdet
        return z_final, nll, logdet

    def reverse_flow(self, params, lr, z=None, epses=None, eps_std=None, key=None,
                     add_gt_noise=True, lr_enc=None, ft_cache=None,
                     want_logdet=True, kernel_ctx=None):
        """Decode z/epses -> SR image (SRFlowNet_arch.py:145-158)."""
        if lr_enc is None:
            lr_enc = self.preprocess(params, lr)
        B = lr.shape[0]
        pixels = lr.shape[1] * lr.shape[2] * self.scale ** 2
        logdet = jnp.zeros((B,), jnp.float32) if want_logdet else None
        if add_gt_noise and logdet is not None:
            logdet = logdet + math.log(self.quant) * pixels
        sr, logdet = fup.decode(params["flow"], self.plan, self._conds(lr_enc), logdet,
                                z=z, epses=epses, eps_std=eps_std, key=key,
                                ft_cache=ft_cache, kernel_ctx=kernel_ctx)
        return sr, logdet

    def precompute_ft(self, params, lr_enc):
        """One pass of the per-step feature-conditional branches, shared
        by every encode/decode on this image (see fup.precompute_ft).

        For scale=4 with stacked-block concat, the level-1 conditioning
        (fea_up2 + nearest-up stack) is phase-decomposed to base
        resolution (fs2d.cond_affine_cache_batched_nearest)."""
        return fup.precompute_ft(params["flow"], self.plan,
                                 self._conds(lr_enc),
                                 lvl1_parts=self._lvl1_parts(params, lr_enc))

    def _lvl1_parts(self, params, lr_enc):
        if not (self.scale == 4 and self.stack_concat and self.stack_blocks):
            return None
        nf = params["rrdb"]["upconv1"]["w"].shape[2]
        base = lr_enc["last_lr_fea"][..., :nf]
        if base.shape[1] < 2 or base.shape[2] < 2:
            return None
        stack = jnp.concatenate(
            [lr_enc[f"block_{i}"] for i in self.stack_blocks], -1)
        return {"base": base, "stack": stack,
                "upconv": params["rrdb"]["upconv1"]}

    # -- wrapper-level helpers (SRFlow_model.py) --------------------------

    def get_encode_epses(self, params, lq, gt, add_gt_noise=True, key=None):
        epses, _, _ = self.normal_flow(params, gt, lq, key=key,
                                       add_gt_noise=add_gt_noise,
                                       want_logdet=False)
        return epses

    def get_sr(self, params, lq, heat=None, z=None, epses=None, key=None):
        if z is None and epses is None:
            z = self.sample_z(key, heat, lq.shape[0], lq.shape[1:3])
        sr, _ = self.reverse_flow(params, lq, z=z, epses=epses, eps_std=heat,
                                  key=key, want_logdet=False)
        return sr

    def sample_z(self, key, heat, batch_size, lr_hw):
        """Latent shape math (SRFlow_model.py:224-237): final latent is
        C=final_c at (scale*h/2^L, scale*w/2^L)."""
        h = self.scale * lr_hw[0] // (2 ** self.L)
        w = self.scale * lr_hw[1] // (2 ** self.L)
        shape = (batch_size, h, w, self.final_c)
        if not heat:
            return jnp.zeros(shape, jnp.float32)
        return jax.random.normal(key, shape, jnp.float32) * heat


def standardize_epses(epses, eps=1e-8):
    """Per-pixel channel standardization of encoded epses
    (SRFlow-LP/code/test.py:142-145; torch.std is ddof=1)."""
    out = []
    for e in epses:
        mean = jnp.mean(e, axis=-1, keepdims=True)
        std = jnp.std(e, axis=-1, keepdims=True, ddof=1)
        out.append((e - mean) / (std + eps))
    return out
