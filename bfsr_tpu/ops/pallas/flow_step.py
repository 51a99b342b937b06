"""Fused SRFlow FlowStep kernel (the 38 ms flows-stage attack, SURVEY §7.7b).

One ``pallas_call`` per conditional flow step per direction executes the
ENTIRE step — folded actnorm+invconv matmul, feature-conditional affine,
and the fAffine coupling tower (conv3x3 -> actnorm/relu -> conv1x1 ->
actnorm/relu -> conv3x3-zeros -> sigmoid coupling) — over row-tiled VMEM
windows.  The XLA path (reference FlowStep.py:88-129 semantics, our
``flows.cond_affine``) runs each of these as separate HLO ops at 11-12%
MFU: 12/24/96-channel states waste MXU/VPU lanes and every op round-trips
the state through HBM.  Here the state is read once per step, all
intermediates live in VMEM, and the tower convs run as 9-tap matmuls with
the step's conditioning maps (scale_ft / shift_ft / aff1_ft — precomputed
once per image, see ``flows.cond_affine_cache``) streamed in alongside.

Layouts (Mosaic DMA constraint: HBM window slices must be 128-aligned in
the lane dim and 8-aligned in the sublane dim — hit on hardware with the
naive C=48 layout, so everything is 128-lane padded):

* state z: (H+4, Wp+16, Cp) f32, B=1: 2-row / 8-col zero halos (SAME-conv
  zero padding and sublane alignment in one shape), channels padded to a
  multiple of 128 (kept zero),
* per-step conditioning: ONE packed array (H+4, Wp+16, Sp) with lanes
  [scale_ft(C) | shift_ft(C) | aff1_ft(P*hid)] zero-padded to 128 — a
  single window DMA per tile per step instead of three unaligned ones,
* level 1 runs in the standard phase-major s2d domain (C = 4*c) with the
  tower convs s2d-transformed (``s2d_conv.s2d_weight``); levels 2/3 run in
  the original domain (P=1),
* per-step weights are host-prepped once (``prep_step``): actnorm+invconv
  folded (``flows.fold_actnorm_invconv``) and kron-lifted per phase, the
  coupling out-conv's 'cross' interleave de-interleaved into the weight's
  output order ([scales | shifts]), the Conv2dZeros exp(3*logs) gain folded
  in, and every matmul operand pre-split into bf16 hi/lo for the explicit
  3-pass f32-accurate product (== XLA Precision.HIGH; single-pass under
  ``BFSR_PRECISION=default`` serving mode).

SAME-conv semantics at image borders: the tower's hidden state carries
nonzero actnorm biases even where its input is all-zero, so the kernel
masks the affine state and the post-tower hidden map to zero outside the
true image — matching the reference's per-conv zero padding exactly,
including the right-edge columns introduced by the alignment pads.  The
reverse pass adds (1 - mask) to the streamed scale before dividing so the
dead columns never divide by zero.

Eval-only (no log-det: the jitted predictors thread want_logdet=False and
XLA DCE'd the chains anyway — BENCH_NOTES r3) and frozen-params only
(requires the ``anic`` fold from ``cache_flow_inverses``).  Training and
NLL paths keep the jnp flows.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bfsr_tpu.ops.flows import AFFINE_EPS
from bfsr_tpu.ops.pallas.s2d_conv import s2d_weight

# Mosaic's default scoped-vmem limit is 16M, but v5e has 128M VMEM/core:
# the kernel raises its own limit via CompilerParams and budgets well under
# it.  Measured accounting overhead vs the estimator below is ~1.6x
# (double-buffered out blocks + matmul operand copies).
VMEM_BUDGET = 36 * 1024 * 1024
VMEM_LIMIT = 96 * 1024 * 1024


def _rup(x, m):
    return -(-x // m) * m


def _split_hi_lo(w):
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    return wh, wl


def _kron_eye(w, p):
    """Per-phase block-diagonal lift of an (n, n) matrix to (p*n, p*n) in
    phase-major channel order (y[q*n+o] = sum_i w[o,i] x[q*n+i])."""
    if p == 1:
        return w
    n = w.shape[0]
    out = jnp.zeros((p * n, p * n), w.dtype)
    for q in range(p):
        out = out.at[q * n:(q + 1) * n, q * n:(q + 1) * n].set(w)
    return out


def _passes():
    from bfsr_tpu.ops import nn as fnn

    return 1 if fnn.default_precision() == jax.lax.Precision.DEFAULT else 3


def prep_step(p, c, phases=1):
    """Host/trace-time operand bundle for one conditional step.

    p: step params holding 'anic' (from ``cache_flow_inverses``) and
    'affine' (fFeatures/fAffine); c: ORIGINAL per-phase channel count
    (12/24/96).  The fwd matmul is x @ w_fold^T, so the folded matrices are
    transposed here once; their input rows are zero-padded to the 128-lane
    state layout.
    """
    P = phases
    cn = c // 2
    co = c - cn
    hid = p["affine"]["fAffine"]["conv1"]["w"].shape[-1]
    aff = p["affine"]["fAffine"]
    w1 = aff["conv1"]["w"][:, :, :cn, :].astype(jnp.float32)
    w2 = aff["conv2"]["w"][0, 0].astype(jnp.float32)
    gain = jnp.exp(aff["out"]["logs"] * 3.0)
    w3 = (aff["out"]["w"] * gain).astype(jnp.float32)
    b3 = (aff["out"]["b"] * gain).astype(jnp.float32)
    if P == 4:
        w1t = s2d_weight(w1)[0]                      # (9, 4cn, 4*hid)
        w3t = s2d_weight(w3)[0]                      # (9, 4*hid, 8co)
        b3t = jnp.tile(b3, P)                        # phase-major (q*2co+k)
        w2t = _kron_eye(w2, P)
    else:
        w1t = w1.reshape(9, cn, hid)
        w3t = w3.reshape(9, hid, 2 * co)
        b3t = b3
        w2t = w2
    # de-interleave the 'cross' split in the OUT channel order
    # (thops split_feature: shift = h[0::2], scale = h[1::2]):
    # new order = [scales (P*co, phase-major) | shifts (P*co)]
    idx = ([q * 2 * co + 2 * j + 1 for q in range(P) for j in range(co)]
           + [q * 2 * co + 2 * j for q in range(P) for j in range(co)])
    idx = jnp.asarray(idx)
    w3t = w3t[:, :, idx]
    b3t = b3t[idx]

    an1 = aff["conv1"]["actnorm"]
    an2 = aff["conv2"]["actnorm"]
    anic = p["anic"]
    C = P * c
    cp = _rup(C, 128)
    # einsum 'oi' convention (flows.an_invconv_fused): y = x @ w^T;
    # rows padded to the 128-lane state (pad channels contribute zero)
    wf = jnp.pad(_kron_eye(anic["w_fold"].astype(jnp.float32).T, P),
                 ((0, cp - C), (0, 0)))
    wi = jnp.pad(_kron_eye(anic["w_inv_fold"].astype(jnp.float32).T, P),
                 ((0, cp - C), (0, 0)))

    def _tile(v):
        return jnp.tile(v.astype(jnp.float32), P)

    w1h, w1l = _split_hi_lo(w1t)
    w2h, w2l = _split_hi_lo(w2t)
    w3h, w3l = _split_hi_lo(w3t)
    wfh, wfl = _split_hi_lo(wf)
    wih, wil = _split_hi_lo(wi)
    consts = jnp.stack([_tile(anic["b_fold"]), _tile(anic["an_bias"])])
    an_c = jnp.stack([
        _tile(an1["bias"]), jnp.exp(_tile(an1["logs"])),
        _tile(an2["bias"]), jnp.exp(_tile(an2["logs"]))])
    b3c = jnp.pad(b3t[None], ((0, 0), (0, _rup(2 * P * co, 8) - 2 * P * co)))
    return {"w1h": w1h, "w1l": w1l, "w2h": w2h, "w2l": w2l,
            "w3h": w3h, "w3l": w3l, "wfh": wfh, "wfl": wfl,
            "wih": wih, "wil": wil, "consts": consts, "an": an_c, "b3": b3c,
            "c": c, "cn": cn, "co": co, "P": P, "hidden": hid}


def pad_state(z):
    """(1, H, W, C) -> kernel layout (H+4, Wp+16, Cp): zero borders, cols
    to a multiple of 8, channels to a multiple of 128."""
    H, W, C = z.shape[1], z.shape[2], z.shape[3]
    wp = _rup(W, 8)
    return jnp.pad(z[0], ((2, 2), (8, 8 + wp - W), (0, _rup(C, 128) - C)))


def unpad_state(zp, H, W, C):
    """Inverse of :func:`pad_state` (crop, restore the batch axis)."""
    return zp[2:2 + H, 8:8 + W, :C][None]


def pack_cache(cache, H, W):
    """Pack one step's {scale_ft, shift_ft, aff1_ft} (each (1, H, W, *))
    into the kernel's single conditioning array (H+4, Wp+16, Sp) with
    lanes [scale(C) | shift(C) | aff1(P*hid)] zero-padded to 128: one
    aligned window DMA per tile per step."""
    wp = _rup(W, 8)
    packed = jnp.concatenate([cache["scale_ft"][0], cache["shift_ft"][0],
                              cache["aff1_ft"][0]], axis=-1)
    sp = _rup(packed.shape[-1], 128)
    return jnp.pad(packed, ((2, 2), (8, 8 + wp - W),
                            (0, sp - packed.shape[-1])))


def _dot3(v, wh, wl, passes):
    vh = v.astype(jnp.bfloat16)
    acc = jnp.dot(vh, wh, preferred_element_type=jnp.float32)
    if passes == 3:
        vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = acc + jnp.dot(vh, wl, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(vl, wh, preferred_element_type=jnp.float32)
    return acc


def _mask(rows, cols, r0, c0, H, W):
    """(rows, cols, 1) f32 mask: 1 where the virtual pixel (r0+r, c0+c)
    lies inside the true image, 0 outside."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, cols, 1), 0) + r0
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows, cols, 1), 1) + c0
    ok = (ri >= 0) & (ri < H) & (ci >= 0) & (ci < W)
    return ok.astype(jnp.float32)


def _compact(z3, P, c, lo, n):
    """Gather the per-phase channel range [lo, lo+n) of a phase-major
    (rows, cols, P*c [+pad]) block into a compact (rows, cols, P*n)."""
    if P == 1:
        return z3[:, :, lo:lo + n]
    return jnp.concatenate(
        [z3[:, :, q * c + lo:q * c + lo + n] for q in range(P)], axis=-1)


def _tower(z1e, a1, shapes, wrefs, passes, m2):
    """The fAffine coupling tower.

    Geometry note: every reshape merges a (rows, cols, C) block with an
    8-multiple cols extent — odd-width merges force Mosaic into full
    cross-sublane shuffles (compile-time blow-up observed on hardware).
    The hidden map lives on (T+2) rows x (Wp+8) cols covering virtual
    columns [-2, Wp+6); junk columns are masked before the out conv.

    z1e: (T+4, Wp+16, P*cn) phase-compact z1 on the FULL window width
    (zero outside the image); a1: (T+2, Wp+8, P*hid) aff1 slice on the
    hidden extent; m2: (T+2, Wp+8, 1) in-image mask (virtual origin
    (-1, -2)).  Returns (scale, shift) each (T*Wp, P*co)."""
    (T, Wp, P, cn, co, hid) = shapes
    (w1h, w1l, w2h, w2l, w3h, w3l, anr, b3r) = wrefs
    WE = Wp + 8
    R2 = (T + 2) * WE
    h = a1.reshape(R2, P * hid)
    for t in range(9):
        dy, dx = t // 3, t % 3
        # h1 virtual col range [-2, Wp+6); tap input col = virtual+dx-1,
        # window index = virtual col + 8  ->  slice start 5 + dx
        v = z1e[dy:dy + T + 2, 5 + dx:5 + dx + WE, :].reshape(R2, P * cn)
        h = h + _dot3(v, w1h[t], w1l[t], passes)
    h = jnp.maximum((h + anr[0]) * anr[1], 0.0)
    h = _dot3(h, w2h[:, :], w2l[:, :], passes)
    h = jnp.maximum((h + anr[2]) * anr[3], 0.0)
    h3 = h.reshape(T + 2, WE, P * hid) * m2
    o = None
    for t in range(9):
        dy, dx = t // 3, t % 3
        # out virtual cols [0, Wp): tap col = virtual+dx-1, h3 index =
        # virtual col + 2  ->  slice start dx + 1
        v = h3[dy:dy + T, dx + 1:dx + 1 + Wp, :].reshape(T * Wp, P * hid)
        d = _dot3(v, w3h[t], w3l[t], passes)
        o = d if o is None else o + d
    o = o + b3r[0, :2 * P * co]
    scale = jax.nn.sigmoid(o[:, :P * co] + 2.0) + AFFINE_EPS
    shift = o[:, P * co:]
    return scale, shift


def _fwd_kernel(T, Wp, H, W, shapes, passes, z_ref, cond_ref,
                wfh, wfl, w1h, w1l, w2h, w2l, w3h, w3l, consts, anr, b3r,
                out_ref, zwin, cwin, sems):
    (P, c, cn, co, hid) = shapes
    C = P * c
    Cp = _rup(C, 128)
    i = pl.program_id(0)
    cz = pltpu.make_async_copy(z_ref.at[pl.ds(i * T, T + 4)], zwin, sems.at[0])
    cc = pltpu.make_async_copy(cond_ref.at[pl.ds(i * T, T + 4)], cwin,
                               sems.at[1])
    cz.start()
    cc.start()
    W16 = Wp + 16
    R4 = (T + 4) * W16
    m4 = _mask(T + 4, W16, i * T - 2, -8, H, W)
    m2 = _mask(T + 2, Wp + 8, i * T - 1, -2, H, W)
    mi = _mask(T, Wp, i * T, 0, H, W)
    cz.wait()
    zf = _dot3(zwin[:, :, :].reshape(R4, Cp), wfh[:, :], wfl[:, :], passes)
    cc.wait()
    cw = cwin[:, :, :]
    scale = cw[:, :, :C].reshape(R4, C)
    shift = cw[:, :, C:2 * C].reshape(R4, C)
    # za = (z@Wf^T + b_fold + shift_ft) * scale_ft, zeroed off-image
    za = ((zf + consts[0] + shift) * scale).reshape(T + 4, W16, C) * m4
    z1e = _compact(za, P, c, 0, cn)
    a1 = cw[1:T + 3, 6:14 + Wp, 2 * C:2 * C + P * hid]
    scale_a, shift_a = _tower(z1e, a1, (T, Wp, P, cn, co, hid),
                              (w1h, w1l, w2h, w2l, w3h, w3l, anr, b3r),
                              passes, m2)
    z2 = _compact(za[2:T + 2, 8:8 + Wp, :], P, c, cn, co).reshape(
        T * Wp, P * co)
    z2 = (z2 + shift_a) * scale_a
    z23 = z2.reshape(T, Wp, P * co) * mi
    z13 = z1e[2:T + 2, 8:8 + Wp, :]
    for q in range(P):
        out_ref[:, :, q * c:q * c + cn] = z13[:, :, q * cn:(q + 1) * cn]
        out_ref[:, :, q * c + cn:(q + 1) * c] = z23[:, :, q * co:(q + 1) * co]
    if Cp > C:
        out_ref[:, :, C:] = jnp.zeros((T, Wp, Cp - C), jnp.float32)


def _rev_kernel(T, Wp, H, W, shapes, passes, z_ref, cond_ref,
                wih, wil, w1h, w1l, w2h, w2l, w3h, w3l, consts, anr, b3r,
                out_ref, zwin, cwin, sems):
    (P, c, cn, co, hid) = shapes
    C = P * c
    Cp = _rup(C, 128)
    i = pl.program_id(0)
    cz = pltpu.make_async_copy(z_ref.at[pl.ds(i * T, T + 4)], zwin, sems.at[0])
    cc = pltpu.make_async_copy(cond_ref.at[pl.ds(i * T, T + 4)], cwin,
                               sems.at[1])
    cz.start()
    cc.start()
    W16 = Wp + 16
    m4 = _mask(T + 4, W16, i * T - 2, -8, H, W)
    m2 = _mask(T + 2, Wp + 8, i * T - 1, -2, H, W)
    mi = _mask(T, Wp, i * T, 0, H, W)
    cz.wait()
    zw = zwin[:, :, :] * m4
    z1e = _compact(zw, P, c, 0, cn)
    cc.wait()
    cw = cwin[:, :, :]
    a1 = cw[1:T + 3, 6:14 + Wp, 2 * C:2 * C + P * hid]
    scale_a, shift_a = _tower(z1e, a1, (T, Wp, P, cn, co, hid),
                              (w1h, w1l, w2h, w2l, w3h, w3l, anr, b3r),
                              passes, m2)
    x2 = _compact(zw[2:T + 2, 8:8 + Wp, :], P, c, cn, co).reshape(
        T * Wp, P * co)
    x2 = x2 / scale_a - shift_a
    x23 = x2.reshape(T, Wp, P * co)
    z13 = z1e[2:T + 2, 8:8 + Wp, :]
    zfull = jnp.concatenate(
        [jnp.concatenate([z13[:, :, q * cn:(q + 1) * cn],
                          x23[:, :, q * co:(q + 1) * co]], axis=-1)
         for q in range(P)], axis=-1).reshape(T * Wp, C)
    mr = mi.reshape(T * Wp, 1)
    sc = cw[2:T + 2, 8:8 + Wp, :C].reshape(T * Wp, C) + (1.0 - mr)
    sh = cw[2:T + 2, 8:8 + Wp, C:2 * C].reshape(T * Wp, C)
    t = zfull / sc - sh
    t = jnp.pad(t, ((0, 0), (0, Cp - C))) if Cp > C else t
    y = _dot3(t, wih[:, :], wil[:, :], passes) - consts[1]
    out_ref[:, :, :C] = y.reshape(T, Wp, C) * mi
    if Cp > C:
        out_ref[:, :, C:] = jnp.zeros((T, Wp, Cp - C), jnp.float32)


def _pick_tile(H, Wp, C, P, hid, cn, co):
    """Largest row tile T dividing H that keeps windows + temps in VMEM."""
    w16 = Wp + 16
    cp = _rup(C, 128)
    sp = _rup(2 * C + P * hid, 128)

    def need(t):
        win = (t + 4) * w16 * (cp + sp)
        za = (t + 4) * w16 * C + (t + 4) * (Wp + 4) * P * cn
        tower = (t + 2) * (Wp + 2) * P * hid * 3
        out = 2 * t * Wp * cp + 3 * t * Wp * P * co
        return int(1.7 * 4 * (win + za + tower + out))

    t = min(H, 128)
    while t > 1 and (H % t or need(t) > VMEM_BUDGET):
        t -= 1
    return t


def step_apply(zp, cond, prep, H, W, reverse=False, interpret=False):
    """Run one fused conditional step on a kernel-layout state.

    zp: (H+4, Wp+16, Cp) state; cond: :func:`pack_cache` output; prep:
    :func:`prep_step` bundle.  Returns the next state in the same layout
    (borders re-zeroed)."""
    interpret = interpret or jax.default_backend() != "tpu"
    P, c, cn, co, hid = (prep["P"], prep["c"], prep["cn"], prep["co"],
                         prep["hidden"])
    C = P * c
    Cp = _rup(C, 128)
    Wp = zp.shape[1] - 16
    passes = _passes()
    T = _pick_tile(H, Wp, C, P, hid, cn, co)
    grid = (H // T,)
    kern = _rev_kernel if reverse else _fwd_kernel
    wf = (prep["wih"], prep["wil"]) if reverse else (prep["wfh"], prep["wfl"])
    w16 = Wp + 16
    sp = cond.shape[-1]
    out = pl.pallas_call(
        functools.partial(kern, T, Wp, H, W, (P, c, cn, co, hid), passes),
        out_shape=jax.ShapeDtypeStruct((H, Wp, Cp), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=pl.BlockSpec((T, Wp, Cp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((T + 4, w16, Cp), jnp.float32),
            pltpu.VMEM((T + 4, w16, sp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(zp, cond,
      wf[0], wf[1], prep["w1h"], prep["w1l"], prep["w2h"], prep["w2l"],
      prep["w3h"], prep["w3l"], prep["consts"], prep["an"], prep["b3"])
    return jnp.pad(out, ((2, 2), (8, 8), (0, 0)))
