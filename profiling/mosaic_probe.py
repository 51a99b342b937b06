"""Mosaic probes for the fused dense-block kernel design.

Q: on this chip, what does it cost inside a kernel to
  (a) do the dense-s2d 9-tap dots (4x MACs, no shuffles)      [baseline]
  (b) build an exact per-phase im2col via 64-lane concats,
      then 4 narrow-M dots (1x MACs, lots of sub-128 lane ops)
  (c) y-only phase split (2x MACs, only 128-aligned slices)
All compute one 3x3 conv (Cin=64 -> Cout=192 scatter width) on a
(1, 64, 64, 256) s2d input, 1-pass bf16 (precision handled separately).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bfsr_tpu.ops.pallas.s2d_conv import s2d_weight, space_to_depth

C, N = 64, 192
Hs = Ws = 64
T, Wc = 8, 32
REP = 6  # repeat the conv REP times per kernel invocation to amortize DMA

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, 2 * Hs, 2 * Ws, C)).astype(np.float32))
w = jnp.asarray((rng.random((3, 3, C, N)) - 0.5).astype(np.float32) * 0.1)
xs = space_to_depth(x)
xpad = jnp.pad(xs[0], ((1, 1), (8, 8), (0, 0)))  # (Hs+2, Ws+16, 256)

w_s2d = s2d_weight(w)[0].astype(jnp.bfloat16)  # (9, 256, 768)


def kern_a(in_ref, w_ref, out_ref, win, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    cp = pltpu.make_async_copy(
        in_ref.at[pl.ds(i * T, T + 2), pl.ds(j * Wc, Wc + 16), :], win, sem)
    cp.start()
    cp.wait()
    acc = jnp.zeros((T * Wc, 4 * N), jnp.float32)
    for r in range(REP):
        for t in range(9):
            dy, dx = t // 3, t % 3
            v = win[dy:dy + T, 7 + dx:7 + dx + Wc, :].reshape(T * Wc, 4 * C)
            acc += jnp.dot(v.astype(jnp.bfloat16), w_ref[t],
                           preferred_element_type=jnp.float32)
    out_ref[:, :, :] = acc.reshape(T, Wc, 4 * N)


def run_a():
    return pl.pallas_call(
        kern_a,
        out_shape=jax.ShapeDtypeStruct((Hs, Ws, 4 * N), jnp.float32),
        grid=(Hs // T, Ws // Wc),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, Wc, 4 * N), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T + 2, Wc + 16, 4 * C), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(xpad, w_s2d)


# (b) exact per-phase im2col.  chunk (ty, tx) for out phase (a, b):
#     s2d row shift ry, col shift rx, source phase p; 9 chunks of 64 lanes.
def _phase_chunks(a, b):
    out = []
    for dy in (-1, 0, 1):
        ry, py = divmod(a + dy + 2, 2)
        ry -= 1
        for dx in (-1, 0, 1):
            rx, px = divmod(b + dx + 2, 2)
            rx -= 1
            out.append((ry, rx, 2 * py + px))
    return out


# exact im2col weights: tap (dy,dx) -> rows of W
w_im2col = w.reshape(9 * C, N).astype(jnp.bfloat16)  # (dy,dx,c) major


def kern_b(in_ref, w_ref, out_ref, win, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    cp = pltpu.make_async_copy(
        in_ref.at[pl.ds(i * T, T + 2), pl.ds(j * Wc, Wc + 16), :], win, sem)
    cp.start()
    cp.wait()
    for r in range(REP):
        for q, (aa, bb) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            chunks = []
            for (ry, rx, p) in _phase_chunks(aa, bb):
                vv = win[1 + ry:1 + ry + T, 8 + rx:8 + rx + Wc,
                         p * C:(p + 1) * C]
                chunks.append(vv.reshape(T * Wc, C))
            cols = jnp.concatenate(chunks, axis=-1).astype(jnp.bfloat16)
            y = jnp.dot(cols, w_ref[0], preferred_element_type=jnp.float32)
            out_ref[q, :, :, :] = y.reshape(T, Wc, N)


def run_b():
    return pl.pallas_call(
        kern_b,
        out_shape=jax.ShapeDtypeStruct((4, Hs, Ws, N), jnp.float32),
        grid=(Hs // T, Ws // Wc),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((4, T, Wc, N), lambda i, j: (0, i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T + 2, Wc + 16, 4 * C), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(xpad, w_im2col[None])


# (c) y-split: out y-phase a reads ry in {-1,0,1}; ry=0 uses all 4C lanes,
#     ry=+-1 uses the contiguous half [2C:4C] / [0:2C].  x stays dense:
#     3 sublane shifts per y-tap.  weights: (a, ry) blocks.
def _ysplit_weights():
    # dense s2d weight (9, 4C, 4N) tap-major (ry*3+rx); rows phase-major.
    wd = s2d_weight(w)[0]  # f32
    blocks = {}
    for a in (0, 1):
        for ry in (-1, 0, 1):
            cols_sel = np.arange(2 * N) + a * 2 * N  # out y-phase a lanes
            if ry == 0:
                rows_sel = np.arange(4 * C)
            elif ry == -1:
                rows_sel = np.arange(2 * C, 4 * C)
            else:
                rows_sel = np.arange(0, 2 * C)
            taps = []
            for rx in (-1, 0, 1):
                t = (ry + 1) * 3 + (rx + 1)
                taps.append(np.asarray(wd[t])[np.ix_(rows_sel, cols_sel)])
            blocks[(a, ry)] = jnp.asarray(np.stack(taps), jnp.bfloat16)
    return blocks


WB = _ysplit_weights()


def kern_c(in_ref, w00, w0m, w0p, w10, w1m, w1p, out_ref, win, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    cp = pltpu.make_async_copy(
        in_ref.at[pl.ds(i * T, T + 2), pl.ds(j * Wc, Wc + 16), :], win, sem)
    cp.start()
    cp.wait()
    wmap = {(0, 0): w00, (0, -1): w0m, (0, 1): w0p,
            (1, 0): w10, (1, -1): w1m, (1, 1): w1p}
    for r in range(REP):
        for a in (0, 1):
            acc = jnp.zeros((T * Wc, 2 * N), jnp.float32)
            for ry in (-1, 0, 1):
                if (a == 0 and ry == 1) or (a == 1 and ry == -1):
                    continue
                if ry == 0:
                    lanes = (0, 4 * C)
                elif ry == -1:
                    lanes = (2 * C, 4 * C)
                else:
                    lanes = (0, 2 * C)
                wt = wmap[(a, ry)]
                base = win[1 + ry:1 + ry + T, :, lanes[0]:lanes[1]]
                for k, rx in enumerate((-1, 0, 1)):
                    v = base[:, 8 + rx:8 + rx + Wc, :].reshape(
                        T * Wc, lanes[1] - lanes[0])
                    acc += jnp.dot(v.astype(jnp.bfloat16), wt[k],
                                   preferred_element_type=jnp.float32)
            out_ref[a, :, :, :] = acc.reshape(T, Wc, 2 * N)


def run_c():
    return pl.pallas_call(
        kern_c,
        out_shape=jax.ShapeDtypeStruct((2, Hs, Ws, 2 * N), jnp.float32),
        grid=(Hs // T, Ws // Wc),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((2, T, Wc, 2 * N), lambda i, j: (0, i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T + 2, Wc + 16, 4 * C), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(xpad, WB[(0, 0)], WB[(0, -1)], WB[(0, 1)],
      WB[(1, 0)], WB[(1, -1)], WB[(1, 1)])


def sync(r):
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def timeit(jf, NIT=20):
    for _ in range(2):
        sync(jf())
    t0 = time.perf_counter()
    o = None
    for _ in range(NIT):
        o = jf()
    sync(o)
    return (time.perf_counter() - t0) / NIT * 1e3


# reference conv for parity
ref = jax.lax.conv_general_dilated(
    x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    precision=jax.lax.Precision.HIGHEST)
ref_s2d = space_to_depth(ref)

ja, jb, jc = jax.jit(run_a), jax.jit(run_b), jax.jit(run_c)
ra = ja()
da = float(jnp.max(jnp.abs(ra / REP - ref_s2d[0])))
rb = jb()
# out (4, Hs, Ws, N) phase q=2a+b -> s2d lanes
rb_s2d = jnp.concatenate([rb[q] for q in range(4)], axis=-1)
db = float(jnp.max(jnp.abs(rb_s2d - ref_s2d[0])))
rc = jc()
rc_s2d = jnp.concatenate([rc[0], rc[1]], axis=-1)
dc = float(jnp.max(jnp.abs(rc_s2d - ref_s2d[0])))
useful = REP * 2 * (2 * Hs) * (2 * Ws) * 9 * C * N / 1e9
for name, f, d in (("a dense-s2d", ja, da), ("b exact-im2col", jb, db),
                   ("c y-split", jc, dc)):
    t = timeit(f)
    print(f"{name:15s}: {t:7.3f} ms  ({useful/t:6.1f} TF/s useful-bf16)  "
          f"parity(bf16) {d:.2e}", flush=True)
