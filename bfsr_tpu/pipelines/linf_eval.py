"""LINF(-LP) inference + evaluation pipeline.

TPU-first redesign of the reference eval path (LINF-LP/test.py):

* The reference row-chunks the HR grid 256 rows at a time with a host loop
  of eager calls (test.py:20-47).  Here the whole image is ONE jitted
  program: the query grid is flattened, padded to a static tile size, and
  ``lax.scan`` runs the Fourier-head + flow over tiles — encoder, flow
  forward, prior UNet, and flow inverse all stay resident on device with
  no host round-trips.
* Tiles are query-count-based (not row-based) so the compiled program's
  shapes depend only on (LR shape, #tiles), maximising jit cache hits.
* The learned-prior path (encode -> UNet -> invert) is fused into the same
  program (BASELINE.json north star: single predict-then-invert pass).

Metrics run host-side in float64 per the reference protocol.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.ops.interp import resize_bilinear
from bfsr_tpu.utils import metrics as M
from bfsr_tpu.utils.coords import make_coord_np
from bfsr_tpu.utils.misc import Averager
from bfsr_tpu.ops.imresize import imresize


def device_psnr(pred01, gt01, dataset=None, scale=1):
    """On-device PSNR (f32) mirroring utils.metrics.calc_psnr — used when
    only the scalar is needed, so full images never cross the host link
    (host fetches can dominate on tunneled TPUs)."""
    diff = pred01 - gt01
    if dataset == "benchmark":
        coeffs = jnp.asarray([65.738, 129.057, 25.064], jnp.float32) / 256.0
        diff = jnp.sum(diff * coeffs, axis=-1, keepdims=True)
    if dataset in ("benchmark", "div2k"):
        diff = diff[:, scale:-scale, scale:-scale]
    mse = jnp.mean(diff.astype(jnp.float32) ** 2)
    return -10.0 * jnp.log10(mse)


class LINFPredictor:
    """Jitted whole-image predictor for a LINF(-patch) model + optional
    prior module.

    Requires separable (regular) query grids — coord[b,i,j,0] varying only
    with i, coord[b,i,j,1] only with j — which holds for every
    make_coord-derived grid the eval paths use.  The per-query affine
    parameters are computed ONCE per image with per-axis slice-gathers
    (the reference recomputes them for the forward and inverse passes and
    uses 2-D grid_sample gathers, linf.py:40-114 vs :116-195).
    """

    def __init__(self, model, prior_model=None, tile_queries=65536, use_pallas=None):
        self.model = model
        self.prior = prior_model
        self.tile_queries = tile_queries
        if use_pallas is None:
            # patch models (d=27) included: the generic-d cm kernels beat
            # the XLA scan path there too (13.6 vs 16.7 ms at 516^2)
            use_pallas = jax.default_backend() == "tpu"
            # the tuned d=3 kernels pad affine-info to 64 rows — flows
            # deeper than 10 layers (2*3*L > 64) need the jnp path
            n_layers = getattr(model, "flow_layers", None)
            if (use_pallas and getattr(model, "dim", 3) == 3
                    and n_layers is not None and 2 * 3 * n_layers > 64):
                use_pallas = False
        self.use_pallas = use_pallas
        self._predict = jax.jit(self._predict_impl, static_argnames=("use_prior", "sample"))

    def _tile_rows(self, W, H=None):
        rows = max(8, self.tile_queries // max(W, 1))
        rows = max(8, (rows // 8) * 8)
        if H is None:
            return rows
        # equalize rows across tiles: ceil(H/W-derived-count) padded the
        # last tile by up to T-1 rows (Set5 woman 344x228: T=280 -> Hp=560,
        # 63% dead queries).  Same tile count, least T covering H — this
        # includes the single-tile case (H <= rows), where the budget tile
        # used to over-pad short-wide images ~3x (ADVICE r3).
        n_tiles = max(1, -(-H // rows))
        return max(8, -(-(-(-H // n_tiles)) // 8) * 8)

    def _predict_impl(self, linf_params, prior_params, inp, coord, cell, gt_lr_up,
                      temperature, key, use_prior, sample):
        """inp: (1,h,w,3) normalized; coord: (1,H,W,2); cell: (1,2);
        gt_lr_up: (1,H,W,d) residual (prior path).  Returns pred
        (1,H*,W*,3) where H*=H (pixel) or H*ps (patch)."""
        from bfsr_tpu.models.linf import linf_affine_info_grid
        from bfsr_tpu.ops import pointwise_flow as pwf

        model = self.model
        d = model.dim
        B, H, W, _ = coord.shape
        T = self._tile_rows(W, H)
        n_tiles = -(-H // T)
        Hp = n_tiles * T
        with fnn.stage("encoder"):
            feat = model.gen_feat(linf_params, inp)

        coord_y = coord[:, :, 0, 0]  # (B, H)
        coord_x = coord[:, 0, :, 1]  # (B, W)
        cy = jnp.pad(coord_y, ((0, 0), (0, Hp - H)), mode="edge")
        cy_t = cy.reshape(B, n_tiles, T).transpose(1, 0, 2)  # (nt, B, T)

        def info_of(cy_tile):
            return linf_affine_info_grid(linf_params, feat, cy_tile, coord_x,
                                         cell, model.hidden_dim)

        if self.use_pallas and B == 1:
            return self._predict_pallas(linf_params, prior_params, inp, coord,
                                        cell, gt_lr_up, temperature, key,
                                        use_prior, sample, feat, cy_t, coord_x,
                                        H, W, Hp, T, n_tiles)

        if use_prior:
            gt_p = jnp.pad(gt_lr_up, ((0, 0), (0, Hp - H), (0, 0), (0, 0)))
            gt_t = gt_p.reshape(B, n_tiles, T, W, -1).transpose(1, 0, 2, 3, 4)

            def enc_body(_, xs):
                cy_tile, g_tile = xs
                info = info_of(cy_tile)
                z, _ = pwf.forward(linf_params["imnet"], g_tile.reshape(-1, d),
                                   info.reshape(B * T * W, -1))
                return None, (info, z.reshape(B, T, W, d))

            _, (info_t, z_t) = jax.lax.scan(enc_body, None, (cy_t, gt_t))
            z_map = z_t.transpose(1, 0, 2, 3, 4).reshape(B, Hp, W, d)[:, :H]
            with fnn.stage("prior"):
                z_learned = self.prior.apply(prior_params, z_map, inp)
            if z_learned.shape[1:3] != z_map.shape[1:3]:
                z_learned = resize_bilinear(z_learned, z_map.shape[1:3])
            zl_p = jnp.pad(z_learned, ((0, 0), (0, Hp - H), (0, 0), (0, 0)))
            zl_t = zl_p.reshape(B, n_tiles, T, W, d).transpose(1, 0, 2, 3, 4)

            def dec_body(_, xs):
                info, zm = xs
                res = pwf.inverse(linf_params["imnet"], zm.reshape(-1, d),
                                  info.reshape(B * T * W, -1))
                return None, res.reshape(B, T, W, d)

            _, res_t = jax.lax.scan(dec_body, None, (info_t, zl_t))
        else:
            if sample:
                keys = jax.random.split(key, n_tiles)

                def body(_, xs):
                    cy_tile, k = xs
                    info = info_of(cy_tile)
                    z = jax.random.normal(k, (B * T * W, d)) * temperature
                    res = pwf.inverse(linf_params["imnet"], z,
                                      info.reshape(B * T * W, -1))
                    return None, res.reshape(B, T, W, d)

                _, res_t = jax.lax.scan(body, None, (cy_t, keys))
            else:
                def body(_, cy_tile):
                    info = info_of(cy_tile)
                    z = jnp.zeros((B * T * W, d), jnp.float32)
                    res = pwf.inverse(linf_params["imnet"], z,
                                      info.reshape(B * T * W, -1))
                    return None, res.reshape(B, T, W, d)

                _, res_t = jax.lax.scan(body, None, cy_t)

        res = res_t.transpose(1, 0, 2, 3, 4).reshape(B, Hp, W, d)[:, :H]
        if model.patch_size == 1:
            from bfsr_tpu.ops.interp import grid_sample_bilinear_separable

            lr_up = grid_sample_bilinear_separable(
                inp, coord[:, :, 0, 0], coord[:, 0, :, 1],
                padding_mode="border")
            return res + lr_up
        return model._fold(res)

    def _apply_prior(self, prior_params, z_map, inp):
        """Prior UNet forward; the fused s2d-Pallas inference path when the
        model/geometry supports it (UNet prior, even H/W, B=1)."""
        from bfsr_tpu.models.unet import UNet, unet_apply_fused

        with fnn.stage("prior"):
            # both paths inside the scope so the mixed precision policy
            # reaches the fused UNet too (its convs/kernels read
            # default_precision() at trace time)
            if (self.use_pallas and isinstance(self.prior, UNet)
                    and z_map.shape[0] == 1
                    and z_map.shape[1] % 2 == 0 and z_map.shape[2] % 2 == 0):
                return unet_apply_fused(prior_params, z_map, inp,
                                        depth=self.prior.depth)
            return self.prior.apply(prior_params, z_map, inp)

    def _predict_pallas(self, linf_params, prior_params, inp, coord, cell,
                        gt_lr_up, temperature, key, use_prior, sample, feat,
                        cy_t, coord_x, H, W, Hp, T, n_tiles):
        """Fused-kernel pipeline: affine info computed ONCE by the
        DMA-tiled Pallas kernel straight from the LR maps (no HR-resolution
        intermediates), flow forward/inverse run channel-major."""
        from bfsr_tpu.ops import nn as fnn
        from bfsr_tpu.ops.pallas.linf_flow import flow_forward_cm, flow_inverse_cm
        from bfsr_tpu.ops.pallas.linf_info import fused_affine_info_cm, T_R
        from bfsr_tpu.ops.interp import grid_sample_bilinear_separable

        model = self.model
        imnet = linf_params["imnet"]
        d = model.dim
        from bfsr_tpu.ops.pallas.linf_flow import cm_rows
        from bfsr_tpu.ops.pallas.linf_info import WT

        rows = cm_rows(d) if d != 3 else 8

        # pad HR rows/cols to the fused kernel's tile sizes
        Hp8 = -(-H // T_R) * T_R
        Wp = -(-W // WT) * WT
        # at wide-enough W and scale>=1.5 the info kernel can run 256-col
        # tiles, but only if W divides: pad to the next 256 multiple — the
        # extra (cropped) columns cost less than halving every LR window
        # DMA (DIV2K 1408->1536, +13%, measured 85.6 -> 71.7 ms) as long
        # as the pad stays moderate (x6 OOD's 576->768 would be +33%)
        s_est = H / max(inp.shape[1], 1)
        if W > 512 and s_est >= 1.5 and Wp % 256:
            wp256 = -(-W // 256) * 256
            if wp256 - W <= 0.15 * W:
                Wp = wp256
        coord_y = jnp.pad(coord[0, :, 0, 0], (0, Hp8 - H), mode="edge")
        coord_x = jnp.pad(coord[0, 0, :, 1], (0, Wp - W), mode="edge")
        n = Hp8 * Wp

        with fnn.stage("head"):
            coef = fnn.conv2d(feat, linf_params["coef"])
            freq = fnn.conv2d(feat, linf_params["freq"])
            info_cm = fused_affine_info_cm(linf_params, coef, freq, coord_y,
                                           coord_x, cell, model.hidden_dim)

        def to_cm(img):  # (1, H*, W*, d) -> (rows, n) with H/W padding
            img = jnp.pad(img, ((0, 0), (0, Hp8 - img.shape[1]),
                                (0, Wp - img.shape[2]), (0, 0)))
            x = img.reshape(n, d).T
            return jnp.pad(x, ((0, rows - d), (0, 0)))

        if use_prior:
            z_cm = flow_forward_cm(imnet, to_cm(gt_lr_up), info_cm)
            z_map = z_cm[:d].T.reshape(1, Hp8, Wp, d)[:, :H, :W]
            z_learned = self._apply_prior(prior_params, z_map, inp)
            if z_learned.shape[1:3] != z_map.shape[1:3]:
                z_learned = resize_bilinear(z_learned, z_map.shape[1:3])
            res_cm = flow_inverse_cm(imnet, to_cm(z_learned), info_cm)
        elif sample:
            z_cm = jnp.pad(jax.random.normal(key, (d, n)) * temperature,
                           ((0, rows - d), (0, 0)))
            res_cm = flow_inverse_cm(imnet, z_cm, info_cm)
        else:
            res_cm = flow_inverse_cm(imnet, jnp.zeros((rows, n), jnp.float32),
                                     info_cm)

        res = res_cm[:d].T.reshape(1, Hp8, Wp, d)[:, :H, :W]
        if model.patch_size != 1:
            return model._fold(res)
        with fnn.stage("addback"):
            lr_up = grid_sample_bilinear_separable(
                inp, coord[:, :, 0, 0], coord[:, 0, :, 1],
                padding_mode="border")
        return res + lr_up

    def predict(self, linf_params, prior_params, inp, coord, cell, gt_lr_up=None,
                temperature=0.0, key=None):
        use_prior = self.prior is not None and gt_lr_up is not None
        sample = (not use_prior) and (temperature != 0.0)
        if key is None:
            key = jax.random.PRNGKey(0)
        return self._predict(linf_params, prior_params, inp, coord, cell,
                             gt_lr_up if gt_lr_up is not None else coord[..., :1] * 0,
                             jnp.float32(temperature), key,
                             use_prior=use_prior, sample=sample)


_PREDICTOR_CACHE = {}


def warmup_predictor(model, prior_model, lr_shapes, scale, pad_multiple=0,
                     tile_queries=65536, use_prior=None, log_fn=print):
    """Precompile the eval predictor for every LR shape bucket.

    First compiles of the big fused programs take 1-5 minutes on this
    platform; with `test.py --pad_multiple` bucketing, a dataset sweep
    touches only a handful of distinct shapes.  This runs one dummy
    predict per bucket so the production sweep (and the persistent XLA
    compile cache at ~/.cache/bfsr_jax) is hot before any image is timed.

    lr_shapes: iterable of (h, w) LR sizes; duplicates/bucket-collisions
    are deduped after padding.  Returns the list of compiled buckets.
    """
    import time as _time

    cache_key = (id(model), id(prior_model), tile_queries)
    predictor = _PREDICTOR_CACHE.get(cache_key)
    if predictor is None:
        predictor = LINFPredictor(model, prior_model, tile_queries=tile_queries)
        _PREDICTOR_CACHE[cache_key] = predictor

    buckets = []
    seen = set()
    for (h, w) in lr_shapes:
        if pad_multiple:
            h = (h // pad_multiple + 1) * pad_multiple
            w = (w // pad_multiple + 1) * pad_multiple
        if (h, w) not in seen:
            seen.add((h, w))
            buckets.append((h, w))

    use_prior = use_prior if use_prior is not None else prior_model is not None
    d = getattr(model, "dim", 3)
    ps = getattr(model, "patch_size", 1)
    for (h, w) in buckets:
        t0 = _time.perf_counter()
        inp = jnp.zeros((1, h, w, 3), jnp.float32)
        H, W = scale * h, scale * w
        if ps > 1:
            # patch models query the PATCH-CENTER grid (the wrapper always
            # pads, even at %ps==0 — wrappers.py:198) at d=3*ps^2 channels;
            # warming the full grid would compile programs the sweep never
            # runs
            hc = (H + (ps - H % ps)) // ps
            wc = (W + (ps - W % ps)) // ps
            coord = jnp.asarray(make_coord_np((hc, wc), flatten=False)[None])
            gt_lr_up = (jnp.zeros((1, hc, wc, d), jnp.float32)
                        if use_prior else None)
        else:
            coord = jnp.asarray(make_coord_np((H, W), flatten=False)[None])
            gt_lr_up = (jnp.zeros((1, H, W, d), jnp.float32)
                        if use_prior else None)
        cell = jnp.asarray([[2.0 / H, 2.0 / W]], jnp.float32)
        r = predictor.predict(model.params,
                              prior_model.params if prior_model else None,
                              inp, coord, cell, gt_lr_up)
        jax.block_until_ready(r)
        log_fn(f"warmup: LR {h}x{w} (scale {scale}) compiled in "
               f"{_time.perf_counter() - t0:.1f}s")
    return buckets


def eval_psnr(loader, model, prior_model=None, data_norm=None, eval_type=None,
              eval_bsize=None, window_size=0, scale_max=4, verbose=False,
              detail=False, randomness=False, temperature=0.0, patch=False,
              tile_queries=65536, lpips_model=None, log_fn=print, limit=None,
              sample=0, save_path=None, pad_multiple=0):
    """Mirror of LINF-LP/test.py:50-236 on the jitted predictor.

    Batches come from bfsr_tpu.data.DataLoader (HWC numpy).  batch_size must
    be 1 for full-image eval (the reference uses 1 as well).
    """
    if data_norm is None:
        data_norm = {"inp": {"sub": [0], "div": [1]}, "gt": {"sub": [0], "div": [1]}}
    inp_sub = np.array(data_norm["inp"]["sub"], np.float32)
    inp_div = np.array(data_norm["inp"]["div"], np.float32)
    gt_sub = np.array(data_norm["gt"]["sub"], np.float32)
    gt_div = np.array(data_norm["gt"]["div"], np.float32)

    if eval_type is None:
        psnr_fn = M.calc_psnr
        scale = scale_max
    elif eval_type.startswith("div2k"):
        scale = int(eval_type.split("-")[1])
        psnr_fn = partial(M.calc_psnr, dataset="div2k", scale=scale)
    elif eval_type.startswith("benchmark"):
        scale = int(eval_type.split("-")[1])
        psnr_fn = partial(M.calc_psnr, dataset="benchmark", scale=scale)
    else:
        raise NotImplementedError(eval_type)

    if eval_bsize:
        # reference semantics: max queries per flow call
        # (configs eval_bsize: 300000); bounded by our memory-safe default
        tile_queries = min(tile_queries, int(eval_bsize))
    # reuse predictors across calls (periodic validation during training
    # would otherwise rebuild the jit wrapper and recompile every time)
    cache_key = (id(model), id(prior_model), tile_queries)
    predictor = _PREDICTOR_CACHE.get(cache_key)
    if predictor is None:
        predictor = LINFPredictor(model, prior_model, tile_queries=tile_queries)
        _PREDICTOR_CACHE[cache_key] = predictor
    val_psnr, val_ssim, val_lpips, val_lr, val_div = (Averager() for _ in range(5))

    n_samples = 5 if randomness else 1
    for idx, batch in enumerate(loader):
        if limit is not None and idx >= limit:
            break
        inp = (batch["inp"] - inp_sub) / inp_div
        gt = batch["gt"]  # (1,H,W,3) raw [0,1]
        # pad_multiple reuses the SwinIR window mechanics as compile-cache
        # bucketing: reflect-pad LR to a shape bucket; pred is cropped back
        # to gt below, so metrics differ only by border receptive fields
        eff_window = window_size or pad_multiple
        if eff_window != 0 and patch:
            # the padded-grid rebuild below replaces the wrapper's
            # patch-center coords with a full HR grid, which the patch
            # predictor would misinterpret (each query folds to a ps x ps
            # patch); the reference never combines window with patch
            raise ValueError("window/pad_multiple cannot be combined with "
                             "patch mode: patch eval queries patch-center "
                             "grids, not the padded full grid")
        if eff_window != 0:
            # SwinIR protocol: reflect-pad LR to a window multiple and query
            # the padded HR grid; pred is cropped to gt below
            # (reference test.py:99-107)
            h_old, w_old = inp.shape[1], inp.shape[2]
            h_pad = (h_old // eff_window + 1) * eff_window - h_old
            w_pad = (w_old // eff_window + 1) * eff_window - w_old
            inp = np.concatenate([inp, inp[:, ::-1]], axis=1)[:, : h_old + h_pad]
            inp = np.concatenate([inp, inp[:, :, ::-1]], axis=2)[:, :, : w_old + w_pad]
            coord = jnp.asarray(make_coord_np(
                (scale * (h_old + h_pad), scale * (w_old + w_pad)),
                flatten=False)[None])
        else:
            coord = jnp.asarray(batch["coord"])
        inp_j = jnp.asarray(inp)
        cell = jnp.asarray(batch["cell"])
        gt_lr_up = jnp.asarray(batch["gt_lr_up"]) if "gt_lr_up" in batch else None
        if gt_lr_up is not None and gt_lr_up.shape[1:3] != coord.shape[1:3]:
            # window padding enlarged the query grid; zero-pad the residual
            dh = coord.shape[1] - gt_lr_up.shape[1]
            dw = coord.shape[2] - gt_lr_up.shape[2]
            gt_lr_up = jnp.pad(gt_lr_up, ((0, 0), (0, dh), (0, dw), (0, 0)))

        fast_scalar = (not detail and not randomness
                       and not (idx < sample and save_path) and not patch)
        if fast_scalar:
            # scalar-only path: PSNR computed on device — full images never
            # cross the host link (which can be the eval bottleneck)
            key = jax.random.PRNGKey(idx * 131)
            pred_dev = predictor.predict(
                model.params, prior_model.params if prior_model else None,
                inp_j, coord, cell, gt_lr_up,
                temperature=temperature, key=key,
            )[..., : gt.shape[1], : gt.shape[2], :]
            pred01 = jnp.clip(pred_dev * jnp.asarray(gt_div)
                              + jnp.asarray(gt_sub), 0, 1)
            dataset = (None if eval_type is None
                       else ("benchmark" if eval_type.startswith("benchmark")
                             else "div2k"))
            val_psnr.add(float(device_psnr(pred01, jnp.asarray(gt), dataset,
                                           scale)), 1)
            if verbose:
                log_fn(f"[{idx}] psnr {val_psnr.item():.4f}")
            continue

        preds = []
        for s in range(n_samples):
            key = jax.random.PRNGKey(idx * 131 + s)
            pred = predictor.predict(
                model.params, prior_model.params if prior_model else None,
                inp_j, coord, cell, gt_lr_up,
                temperature=temperature, key=key,
            )
            pred = np.asarray(pred)[..., : gt.shape[1], : gt.shape[2], :]
            if patch:
                # patch model predicts the folded residual; add LR back
                from bfsr_tpu.data.np_interp import resize_bilinear_np

                pred = pred + resize_bilinear_np(inp[0], pred.shape[1:3])[None]
            preds.append(pred)

        denorm = [np.clip(p * gt_div + gt_sub, 0, 1) for p in preds]

        if idx < sample and save_path:
            from PIL import Image
            import os

            os.makedirs(save_path, exist_ok=True)
            img = np.round(denorm[0][0] * 255.0).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(save_path, f"{800 + idx + 1}x{scale}.png"))

        # PSNR (averaged over samples when randomness)
        ps = [psnr_fn(np.transpose(p, (0, 3, 1, 2)), np.transpose(gt, (0, 3, 1, 2)))
              for p in denorm]
        val_psnr.add(sum(ps) / len(ps), 1)

        if detail:
            ss = [M.calculate_ssim(p[0] * 255.0, gt[0] * 255.0) for p in denorm]
            val_ssim.add(sum(ss) / len(ss), 1)
            if lpips_model is not None:
                lp = [
                    float(lpips_model(np.clip(p, -1, 1), (gt - gt_sub) / gt_div))
                    for p in preds
                ]
                val_lpips.add(sum(lp) / len(lp), 1)
            lr_ps = []
            for p in denorm:
                lr_recon = imresize(p[0].astype(np.float64), scale=1.0 / scale)
                lr_ps.append(psnr_fn(np.transpose(lr_recon[None], (0, 3, 1, 2)),
                                     np.transpose(batch["inp"], (0, 3, 1, 2))))
            val_lr.add(sum(lr_ps) / len(lr_ps), 1)
        if randomness:
            stack = np.stack([np.round(p[0] * 255.0) for p in denorm])
            # torch.std is unbiased (ddof=1) — reference test.py:202-209
            val_div.add(float(np.std(stack, axis=0, ddof=1).mean()), 1)

        if verbose:
            log_fn(f"[{idx}] psnr {val_psnr.item():.4f}")

    if detail:
        out = {"psnr": val_psnr.item(), "ssim": val_ssim.item(),
               "lpips": val_lpips.item() if lpips_model is not None else float("nan"),
               "LR recon": val_lr.item()}
        if randomness:
            out["diversity"] = val_div.item()
        return out
    return val_psnr.item()
