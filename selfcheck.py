#!/usr/bin/env python
"""Fast sanity check (<1 min warm): versions, native lib, tiny end-to-end
predictions for both model families on the current backend.

    python selfcheck.py
"""

import time

import numpy as np


def main():
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    import bfsr_tpu
    import bfsr_tpu.models  # noqa: F401
    from bfsr_tpu import native, registry
    from bfsr_tpu.pipelines.linf_eval import LINFPredictor
    from bfsr_tpu.utils.coords import make_coord_np, make_cell

    print(f"bfsr_tpu {bfsr_tpu.__version__} | jax {jax.__version__} | "
          f"backend {jax.default_backend()} | devices {len(jax.devices())}")
    print(f"native C++ kernels: {'OK' if native.available() else 'unavailable (numpy fallback)'}")

    rng = np.random.default_rng(0)

    # LINF tiny end-to-end
    m = registry.make({"name": "linf", "args": {
        "encoder_spec": {"name": "edsr-baseline",
                         "args": {"n_resblocks": 2, "n_feats": 16,
                                  "no_upsampling": True}},
        "imnet_spec": {"name": "flow", "args": {"name": "flow"}},
        "flow_layers": 3, "num_layer": 2, "hidden_dim": 32}})
    m.params["imnet"]["w"] = m.params["imnet"]["w"] + jnp.eye(3)[None]
    m.freeze()
    prior = registry.make({"name": "unet", "args": {"in_chans": 3, "depth": 2,
                                                    "dim": 16}})
    H = W = 32
    inp = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    coord = jnp.asarray(make_coord_np((H, W), flatten=False)[None])
    cell = jnp.asarray(make_cell((H, W))[None])
    gt_lr_up = jnp.asarray((rng.random((1, H, W, 3)) - 0.5).astype(np.float32))
    pred = LINFPredictor(m, prior).predict(m.params, prior.params, inp, coord,
                                           cell, gt_lr_up)
    assert np.isfinite(np.asarray(pred)).all()
    print(f"LINF-LP learned-prior predict: OK {tuple(pred.shape)}")

    # SRFlow tiny roundtrip
    s = registry.make({"name": "srflow",
                       "args": {"nf": 8, "nb": 2, "gc": 4, "K": 2, "L": 3,
                                "hidden_channels": 8,
                                "stack_blocks": (0, 1)}}).freeze()
    lr = jnp.asarray(rng.random((1, 4, 4, 3)).astype(np.float32))
    gt = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    epses, nll, _ = s.normal_flow(s.params, gt, lr, add_gt_noise=False)
    sr, _ = s.reverse_flow(s.params, lr, epses=epses, add_gt_noise=False)
    err = float(jnp.max(jnp.abs(sr - gt)))
    assert err < 1e-2, err
    print(f"SRFlow encode/decode roundtrip: OK (max err {err:.1e}, "
          f"nll {float(jnp.mean(nll)):.3f})")

    print(f"selfcheck passed in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
