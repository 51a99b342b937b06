"""Frozen-encode form race for the LINF latent train step (late r5).

The train-step decomposition (BENCH_NOTES "Round-5 (late)") put
query_log_p at 6.6 TF/s standalone and the fused step at 13.1 TF/s.
The frozen encode runs the GENERAL gather-based `linf_affine_info`
(2-D gathers — the documented far-below-streaming class on this chip),
while eval's regular-grid fast path (`linf_affine_info_grid`: two axis
slice-gathers per map) was never wired into training.  Training batches
from the sr-implicit wrappers without sample_q ARE regular grids, and
both encode targets (lr_up residual + gt_pixel) sit under stop_gradient
AND share the same target-independent affine info.

Forms raced (interleaved in one process, b16 48^2 LR x2 = 2x147k
queries, HIGH):
  gather2   : production — query_log_p twice (info computed twice,
              2-D gathers)
  grid2     : linf_affine_info_grid twice + pwf.forward twice
  grid_shared: info ONCE via the grid form, pwf.forward twice

    python profiling/latent_encode_probe.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bfsr_tpu.models  # noqa: F401
from bfsr_tpu import registry  # noqa: F401
from bfsr_tpu.models.linf import linf_affine_info_grid
from bfsr_tpu.ops import pointwise_flow as pwf

ITERS = 8
ROUNDS = 3


def main():
    from __graft_entry__ import _flagship
    from bfsr_tpu.utils.coords import make_cell, make_coord_np

    rng = np.random.default_rng(0)
    B, h, scale = 16, 48, 2
    Hh = h * scale
    with jax.default_device(jax.devices("cpu")[0]):
        model, _ = _flagship()
    dev = jax.devices()[0]
    lp = jax.device_put(model.params, dev)
    inp = jnp.asarray(rng.random((B, h, h, 3), dtype=np.float32) - 0.5)
    grid = np.asarray(make_coord_np((Hh, Hh), flatten=False))
    coord = jnp.broadcast_to(jnp.asarray(grid)[None], (B, Hh, Hh, 2))
    coord_y = jnp.broadcast_to(jnp.asarray(grid[:, 0, 0])[None], (B, Hh))
    coord_x = jnp.broadcast_to(jnp.asarray(grid[0, :, 1])[None], (B, Hh))
    cell = jnp.broadcast_to(jnp.asarray(make_cell((Hh, Hh)))[None], (B, 2))
    gt_a = jnp.asarray(rng.random((B, Hh, Hh, 3), dtype=np.float32) - 0.5)
    gt_b = jnp.asarray(rng.random((B, Hh, Hh, 3), dtype=np.float32) - 0.5)

    feat = jax.jit(lambda p, x: model.gen_feat(p, x))(lp, inp)

    def gather2(p, f, gta, gtb):
        _, za = model.query_log_p(p, inp, f, coord, cell, gta)
        _, zb = model.query_log_p(p, inp, f, coord, cell, gtb)
        return za, zb

    def _grid_info(p, f):
        return linf_affine_info_grid(p, f, coord_y, coord_x, cell,
                                     model.hidden_dim)

    def grid2(p, f, gta, gtb):
        ia = _grid_info(p, f)
        za, _ = pwf.forward(p["imnet"], gta.reshape(-1, model.dim),
                            ia.reshape(-1, ia.shape[-1]))
        ib = _grid_info(p, f)
        zb, _ = pwf.forward(p["imnet"], gtb.reshape(-1, model.dim),
                            ib.reshape(-1, ib.shape[-1]))
        sh = (B, Hh, Hh, model.dim)
        return za.reshape(sh), zb.reshape(sh)

    def grid_shared(p, f, gta, gtb):
        info = _grid_info(p, f)
        fi = info.reshape(-1, info.shape[-1])
        za, _ = pwf.forward(p["imnet"], gta.reshape(-1, model.dim), fi)
        zb, _ = pwf.forward(p["imnet"], gtb.reshape(-1, model.dim), fi)
        sh = (B, Hh, Hh, model.dim)
        return za.reshape(sh), zb.reshape(sh)

    def grid_pallas(p, f, gta, gtb):
        # info straight to channel-major (64, N) + the eval flow kernel:
        # the frozen encode needs no grads, so the Pallas forward (no
        # custom VJP) is legal here
        from bfsr_tpu.ops.pallas.linf_flow import _to_cm, flow_forward_cm

        info_cm = linf_affine_info_grid(p, f, coord_y, coord_x, cell,
                                        model.hidden_dim,
                                        channel_major_rows=64)
        za_cm = flow_forward_cm(p["imnet"],
                                _to_cm(gta.reshape(-1, model.dim), 8)[0],
                                info_cm)
        zb_cm = flow_forward_cm(p["imnet"],
                                _to_cm(gtb.reshape(-1, model.dim), 8)[0],
                                info_cm)
        sh = (B, Hh, Hh, model.dim)
        return (za_cm[:model.dim].T.reshape(sh),
                zb_cm[:model.dim].T.reshape(sh))

    def grid2_fastsin(p, f, gta, gtb):
        ia = linf_affine_info_grid(p, f, coord_y, coord_x, cell,
                                   model.hidden_dim, fast_sincos=True)
        za, _ = pwf.forward(p["imnet"], gta.reshape(-1, model.dim),
                            ia.reshape(-1, ia.shape[-1]))
        zb, _ = pwf.forward(p["imnet"], gtb.reshape(-1, model.dim),
                            ia.reshape(-1, ia.shape[-1]))
        sh = (B, Hh, Hh, model.dim)
        return za.reshape(sh), zb.reshape(sh)

    forms = {"gather2": jax.jit(gather2), "grid2": jax.jit(grid2),
             "grid_shared": jax.jit(grid_shared),
             "grid2_fastsin": jax.jit(grid2_fastsin)}
    if jax.default_backend() == "tpu":
        forms["grid_pallas"] = jax.jit(grid_pallas)
    outs = {}
    for name, f in forms.items():
        print(f"[compile] {name} ...", flush=True)
        o = f(lp, feat, gt_a, gt_b)
        np.asarray(o[0].ravel()[0])
        outs[name] = tuple(np.asarray(x) for x in o)

    # parity: the fast forms must match the production gathers exactly
    for name in forms:
        if name == "gather2":
            continue
        for a, b in zip(outs["gather2"], outs[name]):
            err = float(np.max(np.abs(a - b)))
            print(f"parity {name}: max|dz| = {err:.2e}")

    times = {n: [] for n in forms}
    for _ in range(ROUNDS):
        for name, f in forms.items():
            t0 = time.perf_counter()
            o = None
            for _ in range(ITERS):
                o = f(lp, feat, gt_a, gt_b)
            np.asarray(o[0].ravel()[0])
            times[name].append((time.perf_counter() - t0) / ITERS * 1e3)
    print(f"\n{'form':<13}{'ms (interleaved)':>18}")
    for name in forms:
        print(f"{name:<13}{min(times[name]):>14.2f} ms")


if __name__ == "__main__":
    main()
