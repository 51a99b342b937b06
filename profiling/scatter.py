"""Dense-block forms at 128^2: narrow (reference order), s2d Pallas,
scatter (each tensor -> one wide conv to all consumers), scatter im2col."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from bfsr_tpu.ops import nn as fnn
from bfsr_tpu.ops.pallas import s2d_conv as s2d

rng = np.random.default_rng(0)
H = W = 128
nf, gc = 64, 32
NB = 6  # chain 6 dense blocks to amortize dispatch


def make_params(key):
    ks = jax.random.split(key, 5)
    cins = [nf, nf + gc, nf + 2 * gc, nf + 3 * gc, nf + 4 * gc]
    couts = [gc, gc, gc, gc, nf]
    return [fnn.init_conv(ks[i], 3, 3, cins[i], couts[i]) for i in range(5)]


params = [make_params(jax.random.PRNGKey(i)) for i in range(NB)]
x0 = jnp.asarray(rng.random((1, H, W, nf)).astype(np.float32))


def sync(r):
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def timeit(jf, *args, N=10):
    for _ in range(2):
        sync(jf(*args))
    t0 = time.perf_counter()
    o = None
    for _ in range(N):
        o = jf(*args)
    sync(o)
    return (time.perf_counter() - t0) / N * 1e3


def dense_narrow(x, p):
    lrelu = fnn.leaky_relu
    x1 = lrelu(fnn.conv2d(x, p[0]))
    x2 = lrelu(fnn.conv2d(jnp.concatenate([x, x1], -1), p[1]))
    x3 = lrelu(fnn.conv2d(jnp.concatenate([x, x1, x2], -1), p[2]))
    x4 = lrelu(fnn.conv2d(jnp.concatenate([x, x1, x2, x3], -1), p[3]))
    x5 = fnn.conv2d(jnp.concatenate([x, x1, x2, x3, x4], -1), p[4])
    return x5 * 0.2 + x


def scatter_weights(p):
    """Per source tensor j (x, x1..x4): one (3,3,Cj, Nj) weight = concat of
    its slice of conv_{j+1}..conv5, plus per-conv biases."""
    cins = [nf, gc, gc, gc, gc]
    offs = np.cumsum([0] + cins)  # input offset of tensor j in concat
    ws = []
    for j in range(5):
        blocks = [p[k]["w"][:, :, offs[j]:offs[j + 1], :] for k in range(j, 5)]
        ws.append(jnp.concatenate(blocks, axis=-1))
    bs = [p[k].get("b") for k in range(5)]
    return ws, bs


def dense_scatter(x, wb):
    ws, bs = wb
    lrelu = fnn.leaky_relu
    couts = [gc, gc, gc, gc, nf]
    # y[j] = conv(tensor_j, ws[j]); accumulate slices into per-conv sums
    acc = [None] * 5  # pre-activation of conv k
    def add(k, v):
        acc[k] = v if acc[k] is None else acc[k] + v
    y = fnn.conv2d(x, {"w": ws[0]})
    off = 0
    for k in range(5):
        add(k, y[..., off:off + couts[k]])
        off += couts[k]
    outs = [x]
    for j in range(1, 5):
        t = lrelu(acc[j - 1] + (bs[j - 1] if bs[j - 1] is not None else 0.0))
        outs.append(t)
        y = fnn.conv2d(t, {"w": ws[j]})
        off = 0
        for k in range(j, 5):
            add(k, y[..., off:off + couts[k]])
            off += couts[k]
    x5 = acc[4] + (bs[4] if bs[4] is not None else 0.0)
    return x5 * 0.2 + x


def conv_im2col(x, w):
    h, wd = x.shape[1], x.shape[2]
    pads = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [pads[:, dy:dy + h, dx:dx + wd] for dy in range(3) for dx in range(3)], -1)
    return jnp.einsum("bhwk,ko->bhwo", cols,
                      w.reshape(9 * x.shape[-1], w.shape[-1]),
                      preferred_element_type=jnp.float32,
                      precision=fnn.default_precision())


def dense_scatter_mm(x, wb):
    ws, bs = wb
    lrelu = fnn.leaky_relu
    couts = [gc, gc, gc, gc, nf]
    acc = [None] * 5
    def add(k, v):
        acc[k] = v if acc[k] is None else acc[k] + v
    y = conv_im2col(x, ws[0])
    off = 0
    for k in range(5):
        add(k, y[..., off:off + couts[k]])
        off += couts[k]
    for j in range(1, 5):
        t = lrelu(acc[j - 1] + (bs[j - 1] if bs[j - 1] is not None else 0.0))
        y = conv_im2col(t, ws[j])
        off = 0
        for k in range(j, 5):
            add(k, y[..., off:off + couts[k]])
            off += couts[k]
    x5 = acc[4] + (bs[4] if bs[4] is not None else 0.0)
    return x5 * 0.2 + x


def chain(fn, prep):
    pp = [prep(p) for p in params]
    def run(x):
        for w in pp:
            x = fn(x, w)
        return x
    return jax.jit(run)


f_narrow = chain(dense_narrow, lambda p: p)
f_scat = chain(dense_scatter, scatter_weights)
f_scat_mm = chain(dense_scatter_mm, scatter_weights)

def s2d_block(xs, p):
    def conv(inputs, cp, k, act):
        split = [nf] + [gc] * (k - 1)
        w = s2d.s2d_weight(cp["w"], cin_split=split)
        return s2d.conv3x3_s2d(inputs, w, bias=cp.get("b"), act=act)
    xp = s2d.prepad(xs)
    x1 = s2d.prepad(conv([xp], p[0], 1, "lrelu"))
    x2 = s2d.prepad(conv([xp, x1], p[1], 2, "lrelu"))
    x3 = s2d.prepad(conv([xp, x1, x2], p[2], 3, "lrelu"))
    x4 = conv([xp, x1, x2, x3], p[3], 4, "lrelu")
    x5 = conv([xp, x1, x2, x3, s2d.prepad(x4)], p[4], 5, None)
    return x5 * 0.2 + xs

def run_s2d(x):
    xs = s2d.space_to_depth(x)
    for p in params:
        xs = s2d_block(xs, p)
    return s2d.depth_to_space(xs)
f_s2d = jax.jit(run_s2d)

# parity first
r0 = f_narrow(x0)
for name, f in [("scatter", f_scat), ("scatter_mm", f_scat_mm), ("s2d", f_s2d)]:
    d = float(jnp.max(jnp.abs(f(x0) - r0)))
    print(f"parity {name}: max|d| = {d:.2e}")

gflop = 9 * H * W * 26624 * 2 * NB / 1e9
for name, f in [("narrow", f_narrow), ("s2d", f_s2d), ("scatter", f_scat),
                ("scatter_mm", f_scat_mm)]:
    t = timeit(f, x0)
    print(f"{name:12s}: {t:7.2f} ms  ({gflop / t:6.1f} TF/s eff)")


def conv_9dot(x, w):
    h, wd = x.shape[1], x.shape[2]
    cin, cout = x.shape[-1], w.shape[-1]
    pads = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            v = pads[:, dy:dy + h, dx:dx + wd]
            y = jnp.einsum("bhwc,co->bhwo", v, w[dy, dx],
                           preferred_element_type=jnp.float32,
                           precision=fnn.default_precision())
            acc = y if acc is None else acc + y
    return acc


def dense_scatter_9dot(x, wb):
    ws, bs = wb
    lrelu = fnn.leaky_relu
    couts = [gc, gc, gc, gc, nf]
    acc = [None] * 5
    def add(k, v):
        acc[k] = v if acc[k] is None else acc[k] + v
    y = conv_9dot(x, ws[0])
    off = 0
    for k in range(5):
        add(k, y[..., off:off + couts[k]])
        off += couts[k]
    for j in range(1, 5):
        t = lrelu(acc[j - 1] + (bs[j - 1] if bs[j - 1] is not None else 0.0))
        y = conv_9dot(t, ws[j])
        off = 0
        for k in range(j, 5):
            add(k, y[..., off:off + couts[k]])
            off += couts[k]
    x5 = acc[4] + (bs[4] if bs[4] is not None else 0.0)
    return x5 * 0.2 + x


f_scat_9 = chain(dense_scatter_9dot, scatter_weights)
print("parity 9dot:", float(jnp.max(jnp.abs(f_scat_9(x0) - r0))))
t = timeit(f_scat_9, x0)
print(f"scatter_9dot: {t:7.2f} ms  ({gflop / t:6.1f} TF/s eff)")

# also: one wide im2col reused across... each tensor has own; try f32->bf16
# cast of cols before matmul (halves im2col traffic, hi/lo 3-pass keeps acc)
def conv_im2col_b16(x, w):
    h, wd = x.shape[1], x.shape[2]
    pads = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [pads[:, dy:dy + h, dx:dx + wd] for dy in range(3) for dx in range(3)], -1)
    ch = cols.astype(jnp.bfloat16)
    cl = (cols - ch.astype(jnp.float32)).astype(jnp.bfloat16)
    k = w.reshape(9 * x.shape[-1], w.shape[-1])
    kh = k.astype(jnp.bfloat16)
    kl = (k - kh.astype(jnp.float32)).astype(jnp.bfloat16)
    def mm(a, b):
        return jnp.einsum("bhwk,ko->bhwo", a, b,
                          preferred_element_type=jnp.float32)
    return mm(ch, kh) + mm(ch, kl) + mm(cl, kh)


def dense_scatter_b16(x, wb):
    ws, bs = wb
    lrelu = fnn.leaky_relu
    couts = [gc, gc, gc, gc, nf]
    acc = [None] * 5
    def add(k, v):
        acc[k] = v if acc[k] is None else acc[k] + v
    y = conv_im2col_b16(x, ws[0])
    off = 0
    for k in range(5):
        add(k, y[..., off:off + couts[k]])
        off += couts[k]
    for j in range(1, 5):
        t = lrelu(acc[j - 1] + (bs[j - 1] if bs[j - 1] is not None else 0.0))
        y = conv_im2col_b16(t, ws[j])
        off = 0
        for k in range(j, 5):
            add(k, y[..., off:off + couts[k]])
            off += couts[k]
    x5 = acc[4] + (bs[4] if bs[4] is not None else 0.0)
    return x5 * 0.2 + x


f_scat_b16 = chain(dense_scatter_b16, scatter_weights)
print("parity b16-3pass:", float(jnp.max(jnp.abs(f_scat_b16(x0) - r0))))
t = timeit(f_scat_b16, x0)
print(f"scatter_b16 : {t:7.2f} ms  ({gflop / t:6.1f} TF/s eff)")
