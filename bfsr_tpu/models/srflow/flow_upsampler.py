"""FlowUpsamplerNet: the Glow pyramid of SRFlow as a *static layer plan*.

Reference: SRFlow-LP/code/models/modules/FlowUpsamplerNet.py.  The reference
builds an nn.ModuleList and re-derives each layer's pyramid level at runtime
from ``log2(160 / output_shape)``; here the whole architecture is a static
plan computed once — under jit every layer unrolls into one fused XLA
program, and levels/conditioning are resolved at trace time.

Plan for scale=4, L=3, K=16, additionalFlowNoAffine=2, split enabled
(confs/SRFlow-LP_DF2K_4X.yml):

  level 1: squeeze(3->12)   2x[actnorm,invconv]  16x[actnorm,invconv,affine]
           split (12 -> pass 6, eps 6)
  level 2: squeeze(6->24)   2x[...]              16x[...]
  level 3: squeeze(24->96)  2x[...]              16x[...]
  final z: 96ch at H/8;  eps0: 6ch at H/2

Conditioning: each level L reads the RRDB pyramid entry named by
``level_names[scale][L]`` (FlowUpsamplerNet.py:49-74), 320 channels with
stackRRDB.concat.
"""

import math

import jax
import jax.numpy as jnp

from bfsr_tpu.ops import flows
from bfsr_tpu.ops import flows_s2d as fs2d
from bfsr_tpu.ops import nn as fnn

LEVEL_NAMES = {
    16: {0: "fea_up16", 1: "fea_up8", 2: "fea_up4", 3: "fea_up2", 4: "fea_up1"},
    8: {0: "fea_up8", 1: "fea_up4", 2: "fea_up2", 3: "fea_up1", 4: "fea_up0"},
    4: {0: "fea_up4", 1: "fea_up2", 2: "fea_up1", 3: "fea_up0", 4: "fea_up-1"},
}


def build_plan(scale=4, L=3, K=16, additional_steps=2, split_enable=True,
               consume_ratio=0.5, base_c=3):
    """Returns (plan, final_c).  plan entries:
    {'kind': 'squeeze'|'step_nc'|'step_cond'|'split', 'level': int, 'c': int}
    """
    if isinstance(K, int):
        K = [K] * (L + 1)
    plan = []
    c = base_c
    h = 160  # reference construction-time size; only log2-ratios matter
    for level in range(1, L + 1):
        c, h = c * 4, h // 2
        lvl = int(round(math.log2(160 / h)))
        plan.append({"kind": "squeeze", "level": lvl, "c": c})
        for _ in range(additional_steps):
            plan.append({"kind": "step_nc", "level": lvl, "c": c})
        for _ in range(K[level]):
            plan.append({"kind": "step_cond", "level": lvl, "c": c})
        # split at levels with L_cur < L - 1 + 1 … i.e. level < L - 1 + 1;
        # reference: `if split.enable and level < levels - correction`
        # with correction=1 (FlowUpsamplerNet.py:149-152) -> level 1 only
        # when L == 3.
        if split_enable and level < L - 1:
            n_consume = int(round(c * consume_ratio))
            plan.append({"kind": "split", "level": lvl, "c": c,
                         "consume": n_consume})
            c = c - n_consume
    return plan, c


def init_flow_upsampler(key, plan, cond_channels=320, hidden_channels=64):
    params = []
    for entry in plan:
        key, sub = jax.random.split(key)
        c = entry["c"]
        if entry["kind"] == "squeeze":
            params.append({})
        elif entry["kind"] in ("step_nc", "step_cond"):
            k1, k2, k3 = jax.random.split(sub, 3)
            p = {
                "actnorm": {"bias": jnp.zeros((c,), jnp.float32),
                            "logs": jnp.zeros((c,), jnp.float32)},
                "invconv": {"w": fnn.orthogonal_init(k1, c)},
            }
            if entry["kind"] == "step_cond":
                p["affine"] = flows.init_cond_affine(k2, c, cond_channels, hidden_channels)
            params.append(p)
        elif entry["kind"] == "split":
            params.append(flows.init_split2d(sub, c, cond_channels=0))
        else:
            raise ValueError(entry["kind"])
    return {"layers": params}


def actnorms_unprimed(params):
    """True iff every step actnorm still carries its all-zero init (no
    data-dependent priming, no training, no converted checkpoint)."""
    for p in params["layers"]:
        if "actnorm" in p:
            a = p["actnorm"]
            if bool(jnp.any(a["bias"] != 0)) or bool(jnp.any(a["logs"] != 0)):
                return False
    return True


def prime_actnorms(params, plan, gt, conds):
    """Data-dependent actnorm initialization from one batch (reference
    FlowActNorms.py:45-59 primes each ActNorm2d the first time data flows
    through it).  Runs one eager encode, setting each step's actnorm to
    whiten its incoming activation *before* applying it, exactly the
    reference ordering.  Returns a new flow-params tree; call before
    :func:`cache_flow_inverses` (priming invalidates the anic folds).

    gt: (B, H, W, 3) first-batch GT; conds: as for :func:`encode`.
    """
    layers = []
    x = gt
    for entry, p in zip(plan, params["layers"]):
        kind = entry["kind"]
        p = dict(p)
        if kind == "squeeze":
            x = flows.squeeze2d(x)
        elif kind in ("step_nc", "step_cond"):
            p["actnorm"] = flows.actnorm_init_stats(x)
            x, _ = flows.actnorm(x, p["actnorm"], None)
            x, _ = flows.invconv1x1(x, p["invconv"], None)
            if kind == "step_cond":
                x, _ = flows.cond_affine(x, conds[entry["level"]],
                                         p["affine"], None)
        elif kind == "split":
            x, _, _ = flows.split2d(x, p, None, ft=None)
        layers.append(p)
    return {"layers": layers}


def cache_flow_inverses(params):
    """Attach w_inv/logabsdet caches to every invconv (frozen inference),
    plus the folded actnorm+invconv affine (one matmul per step pair,
    constant log-det — see flows.fold_actnorm_invconv)."""
    out = {"layers": []}
    for p in params["layers"]:
        p = dict(p)
        if "invconv" in p:
            p["invconv"] = flows.invconv_cache(p["invconv"]["w"])
            if "actnorm" in p:
                p["anic"] = flows.fold_actnorm_invconv(p["actnorm"],
                                                       p["invconv"])
        out["layers"].append(p)
    return out


def _step_forward(x, p, ft, logdet, cond, ft_params=None):
    if "anic" in p:
        x, logdet = flows.an_invconv_fused(x, p["anic"], logdet)
    else:
        x, logdet = flows.actnorm(x, p["actnorm"], logdet)
        x, logdet = flows.invconv1x1(x, p["invconv"], logdet)
    if cond:
        x, logdet = flows.cond_affine(x, ft, p["affine"], logdet,
                                      ft_params=ft_params)
    return x, logdet


def _step_reverse(x, p, ft, logdet, cond, ft_params=None):
    if cond:
        x, logdet = flows.cond_affine(x, ft, p["affine"], logdet, reverse=True,
                                      ft_params=ft_params)
    if "anic" in p:
        x, logdet = flows.an_invconv_fused(x, p["anic"], logdet, reverse=True)
    else:
        x, logdet = flows.invconv1x1(x, p["invconv"], logdet, reverse=True)
        x, logdet = flows.actnorm(x, p["actnorm"], logdet, reverse=True)
    return x, logdet


def precompute_ft(params, plan, conds, lvl1_s2d=True, lvl1_parts=None):
    """Per-step conditioning-only work: fFeatures (scale_ft, shift_ft) AND
    the fAffine first-conv 320-channel ft contribution.  With
    ``lvl1_s2d`` (default) every level whose maps have even spatial dims
    stores its caches in the space-to-depth layout consumed by the fs2d
    fast path (level 1 additionally computes them at base resolution via
    the phase decomposition).

    These depend only on the RRDB conditioning, so one pass serves every
    encode AND decode call on the image — the reference recomputes the
    fFeatures conv stack and the concat([z1, ft]) conv inside each of the
    2 x 48 coupling evaluations (FlowAffineCouplingsAblation.py:63-92).
    All K steps of a level batch into one wide conv over the conditioning
    map (``flows.cond_affine_cache_batched``)."""
    by_level = {}
    for i, entry in enumerate(plan):
        if entry["kind"] == "step_cond":
            by_level.setdefault(entry["level"], []).append(i)
    out = [None] * len(plan)
    lvl1_s2d = lvl1_s2d and any(e["level"] >= 2 for e in plan)
    for lvl, idxs in by_level.items():
        step_ps = [params["layers"][i]["affine"] for i in idxs]
        even = (conds[lvl].shape[1] % 2 == 0 and conds[lvl].shape[2] % 2 == 0
                and conds[lvl].shape[1] >= 2 and conds[lvl].shape[2] >= 2)
        if lvl == 1 and lvl1_s2d and lvl1_parts is not None:
            caches = fs2d.cond_affine_cache_batched_nearest(
                lvl1_parts["base"], lvl1_parts["stack"],
                lvl1_parts["upconv"], step_ps)
        else:
            caches = flows.cond_affine_cache_batched(conds[lvl], step_ps)
            # Only level 1 nets a win from the s2d step path: running
            # levels 2/3 s2d was measured SLOWER end-to-end (83.1 ->
            # 85-87 ms per 512^2 image) — the cache/state relayouts
            # exceed the lane-waste savings at their small extents.  The
            # encode/decode transitions below support any s2d level set,
            # so flipping this condition is all it takes to re-test.
            if lvl1_s2d and even and lvl == 1:
                caches = [fs2d.cache_to_s2d(c) for c in caches]
        for i, c in zip(idxs, caches):
            out[i] = c
    return out


def prep_kernel_ctx(params, plan, ft_cache, interpret=False, levels=None):
    """Per-step operand bundles for the fused FlowStep Pallas path
    (``ops.pallas.flow_step``), keyed by plan index.  Frozen eval only
    (needs the ``anic`` fold); the caches must come from
    :func:`precompute_ft` (s2d level 1).

    ``levels``: restrict the kernel to those flow levels (steps at other
    levels keep the XLA path — encode/decode fall through per index).
    None = all levels.  Hardware A/B (BENCH_NOTES r4): standalone, the
    16-step chain wins only at level 3 (96-ch 64^2 state, 1.05-1.14x);
    levels 1/2 run 0.54-0.90x — their larger extents make XLA's fusions
    stream-bound-efficient while the kernel pays masked VPU work and
    thin-matmul (24/48-lane) MXU waste per tap.  In the FULL pipeline
    even the level-3-only form regresses (83.5 -> 95.9 ms, 0.86x:
    pad/unpad boundaries + layout transitions), so the predictor default
    is OFF (profiling/flowstep_probe.py, flowstep_level_probe.py).

    Built once per image and shared by encode and decode — the padded
    cache windows replace (not duplicate) the plain cache reads, and the
    weight prep is tiny.  Returns None when no step qualifies."""
    from bfsr_tpu.ops.pallas import flow_step as fsk

    s2d_levels = _cache_s2d_levels(plan, ft_cache)
    ctx = {}
    for i, (entry, p) in enumerate(zip(plan, params["layers"])):
        if entry["kind"] != "step_cond":
            continue
        if levels is not None and entry["level"] not in levels:
            continue
        if "anic" not in p or ft_cache[i] is None:
            return None
        cache = ft_cache[i]
        if cache["scale_ft"].shape[0] != 1:
            return None  # kernel path is B=1 (the shard_map predictors)
        s2d = entry["level"] in s2d_levels
        P = 4 if s2d else 1
        h, w = cache["scale_ft"].shape[1], cache["scale_ft"].shape[2]
        prep = fsk.prep_step(p, entry["c"], phases=P)
        ctx[i] = {"prep": prep, "cond": fsk.pack_cache(cache, h, w),
                  "h": h, "w": w, "interpret": interpret}
    return ctx or None


def _kernel_chain(x, idxs, params, plan, ctx, reverse):
    """Run a consecutive run of cond steps through the fused kernel.
    x enters/leaves in the plain state layout of its domain."""
    from bfsr_tpu.ops.pallas import flow_step as fsk

    first = ctx[idxs[0]]
    h, w = first["h"], first["w"]
    C = x.shape[-1]
    zp = fsk.pad_state(x)
    for i in idxs:
        e = ctx[i]
        zp = fsk.step_apply(zp, e["cond"], e["prep"], h, w, reverse=reverse,
                            interpret=e["interpret"])
    return fsk.unpad_state(zp, h, w, C)


def _cache_s2d_levels(plan, ft_cache):
    """Levels whose step caches are in the s2d layout.  Detected
    structurally (shape), never via a pytree leaf — a boolean leaf would
    be traced under jit."""
    levels = set()
    if ft_cache is None:
        return levels
    seen = set()
    for entry, c in zip(plan, ft_cache):
        if entry["kind"] == "step_cond" and entry["level"] not in seen:
            seen.add(entry["level"])
            if c and c["scale_ft"].shape[-1] == 4 * entry["c"]:
                levels.add(entry["level"])
    return levels


def encode(params, plan, gt, conds, logdet, ft_cache=None, kernel_ctx=None):
    """gt: (B, H, W, 3); conds: {level: (B, h, w, C_cond)}.

    Returns (epses list [eps0..., z_final], logdet).
    (FlowUpsamplerNet.encode, :217-251)

    kernel_ctx (``prep_kernel_ctx``): route every run of consecutive
    conditional steps through the fused FlowStep Pallas kernel (frozen
    B=1 eval; logdet must be None — the kernel drops it).
    """
    s2d_levels = _cache_s2d_levels(plan, ft_cache)
    if kernel_ctx is not None:
        assert logdet is None, "kernel path is eval-only (no logdet)"
    x = gt
    in_s2d = False
    epses = []
    skip_until = -1
    for i, (entry, p) in enumerate(zip(plan, params["layers"])):
        if i < skip_until:
            continue
        kind = entry["kind"]
        if (kernel_ctx is not None and kind == "step_cond"
                and i in kernel_ctx):
            j = i
            while (j < len(plan) and plan[j]["kind"] == "step_cond"
                   and j in kernel_ctx):
                j += 1
            x = _kernel_chain(x, list(range(i, j)), params, plan,
                              kernel_ctx, reverse=False)
            skip_until = j
            continue
        if kind == "squeeze":
            if in_s2d:
                # s2d state of level l-1 == squeeze2d output of level l,
                # channel-reordered: a relayout, no resolution change
                x = fs2d.squeeze_to_next_level(x)
                in_s2d = False
            else:
                x = flows.squeeze2d(x)
            if entry["level"] in s2d_levels:
                x = fs2d.to_s2d(x)
                in_s2d = True
        elif kind == "step_nc":
            if in_s2d:
                x, logdet = fs2d.step_forward(x, p, logdet, cond=False)
            else:
                x, logdet = _step_forward(x, p, None, logdet, cond=False)
        elif kind == "step_cond":
            if in_s2d:
                x, logdet = fs2d.step_forward(x, p, logdet, cond=True,
                                              ft_params=ft_cache[i])
            else:
                x, logdet = _step_forward(x, p, conds[entry["level"]], logdet,
                                          cond=True,
                                          ft_params=ft_cache[i] if ft_cache else None)
        elif kind == "split":
            if in_s2d:
                x, logdet, eps = fs2d.split2d(x, p, logdet)
            else:
                x, logdet, eps = flows.split2d(x, p, logdet, ft=None)
            epses.append(eps)
    if in_s2d:
        x = fs2d.from_s2d(x)
    epses.append(x)
    return epses, logdet


def decode(params, plan, conds, logdet, z=None, epses=None, eps_std=None, key=None,
           ft_cache=None, kernel_ctx=None):
    """Inverse pass; consumes epses back-to-front (z_final popped first).
    (FlowUpsamplerNet.decode, :267-303)"""
    s2d_levels = _cache_s2d_levels(plan, ft_cache)
    if kernel_ctx is not None:
        assert logdet is None, "kernel path is eval-only (no logdet)"
    if epses is not None:
        epses = list(epses)
        x = epses.pop()
    else:
        x = z
    n = len(plan)
    last_level = max((e["level"] for e in plan), default=0)
    in_s2d = last_level in s2d_levels
    if in_s2d:
        x = fs2d.to_s2d(x)
    skip_down_to = n
    for ri, (entry, p) in enumerate(zip(reversed(plan), reversed(params["layers"]))):
        i = n - 1 - ri
        if i >= skip_down_to and skip_down_to < n:
            continue
        kind = entry["kind"]
        if (kernel_ctx is not None and kind == "step_cond"
                and i in kernel_ctx):
            k = i
            while (k >= 0 and plan[k]["kind"] == "step_cond"
                   and k in kernel_ctx):
                k -= 1
            x = _kernel_chain(x, list(range(i, k, -1)), params, plan,
                              kernel_ctx, reverse=True)
            skip_down_to = k + 1
            continue
        if kind == "squeeze":
            if in_s2d:
                x = fs2d.from_s2d(x)
                in_s2d = False
            prev_s2d = (entry["level"] - 1) in s2d_levels
            if prev_s2d:
                # re-enter level l-1's s2d form: pure channel reorder
                x = fs2d.unsqueeze_from_next_level(x)
                in_s2d = True
            else:
                x = flows.unsqueeze2d(x)
        elif kind == "step_nc":
            if in_s2d:
                x, logdet = fs2d.step_reverse(x, p, logdet, cond=False)
            else:
                x, logdet = _step_reverse(x, p, None, logdet, cond=False)
        elif kind == "step_cond":
            if in_s2d:
                x, logdet = fs2d.step_reverse(x, p, logdet, cond=True,
                                              ft_params=ft_cache[i])
            else:
                x, logdet = _step_reverse(x, p, conds[entry["level"]], logdet,
                                          cond=True,
                                          ft_params=ft_cache[i] if ft_cache else None)
        elif kind == "split":
            eps = epses.pop() if epses is not None else None
            if eps is None and key is not None:
                key, sub = jax.random.split(key)
            else:
                sub = None
            if in_s2d:
                x, logdet, _ = fs2d.split2d(x, p, logdet, reverse=True,
                                            eps=eps, eps_std=eps_std, key=sub)
            else:
                x, logdet, _ = flows.split2d(
                    x, p, logdet, ft=None, reverse=True, eps=eps,
                    eps_std=eps_std, key=sub
                )
    return x, logdet
