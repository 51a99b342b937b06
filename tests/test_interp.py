"""Parity tests for torch-semantics resampling (torch CPU as oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from bfsr_tpu.ops.interp import (  # noqa: E402
    grid_sample_nearest,
    grid_sample_bilinear,
    resize_bilinear,
    resize_nearest,
)


def _rand_nchw(rng, b, c, h, w):
    return rng.random((b, c, h, w)).astype(np.float32)


def _to_nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _from_torch(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("out_hw", [(17, 23), (64, 64), (7, 5)])
def test_resize_bilinear_matches_torch(rng, out_hw):
    x = _rand_nchw(rng, 2, 3, 16, 12)
    ours = np.asarray(resize_bilinear(_to_nhwc(x), out_hw))
    theirs = _from_torch(F.interpolate(torch.from_numpy(x), out_hw, mode="bilinear", align_corners=False))
    np.testing.assert_allclose(ours, theirs, atol=2e-6)


def test_resize_bilinear_align_corners_matches_torch(rng):
    x = _rand_nchw(rng, 1, 4, 9, 11)
    ours = np.asarray(resize_bilinear(_to_nhwc(x), (18, 22), align_corners=True))
    theirs = _from_torch(F.interpolate(torch.from_numpy(x), (18, 22), mode="bilinear", align_corners=True))
    np.testing.assert_allclose(ours, theirs, atol=2e-6)


def test_resize_nearest_matches_torch(rng):
    x = _rand_nchw(rng, 2, 3, 10, 14)
    ours = np.asarray(resize_nearest(_to_nhwc(x), (25, 7)))
    theirs = _from_torch(F.interpolate(torch.from_numpy(x), (25, 7), mode="nearest"))
    np.testing.assert_allclose(ours, theirs, atol=0)


def _rand_grid(rng, b, hg, wg):
    # (h, w)-ordered coords in [-1, 1], off tie-points like the reference
    g = (rng.random((b, hg, wg, 2)).astype(np.float32) * 2 - 1) * 0.97 + 1e-6
    return g


@pytest.mark.parametrize("pad", ["zeros", "border"])
def test_grid_sample_bilinear_matches_torch(rng, pad):
    x = _rand_nchw(rng, 2, 5, 12, 9)
    g = _rand_grid(rng, 2, 7, 8)
    ours = np.asarray(grid_sample_bilinear(_to_nhwc(x), jnp.asarray(g), padding_mode=pad))
    # torch wants (x, y) order = our (h, w) flipped
    tg = torch.from_numpy(g[..., ::-1].copy())
    theirs = _from_torch(
        F.grid_sample(torch.from_numpy(x), tg, mode="bilinear", padding_mode=pad, align_corners=False)
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-6)


def test_grid_sample_bilinear_border_out_of_range(rng):
    x = _rand_nchw(rng, 1, 2, 6, 6)
    g = _rand_grid(rng, 1, 4, 4) * 1.6  # out of range
    ours = np.asarray(grid_sample_bilinear(_to_nhwc(x), jnp.asarray(g), padding_mode="border"))
    tg = torch.from_numpy(g[..., ::-1].copy())
    theirs = _from_torch(
        F.grid_sample(torch.from_numpy(x), tg, mode="bilinear", padding_mode="border", align_corners=False)
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-6)


def test_grid_sample_nearest_matches_torch(rng):
    x = _rand_nchw(rng, 2, 3, 15, 11)
    g = _rand_grid(rng, 2, 9, 6)
    ours = np.asarray(grid_sample_nearest(_to_nhwc(x), jnp.asarray(g)))
    tg = torch.from_numpy(g[..., ::-1].copy())
    theirs = _from_torch(
        F.grid_sample(torch.from_numpy(x), tg, mode="nearest", padding_mode="zeros", align_corners=False)
    )
    np.testing.assert_allclose(ours, theirs, atol=0)


def test_grid_sample_bilinear_separable_matches_gather(rng):
    """MXU-matmul separable grid sample == gather version on regular grids
    (border and zeros modes, incl. out-of-range coords)."""
    import jax.numpy as jnp

    from bfsr_tpu.ops.interp import (grid_sample_bilinear,
                                     grid_sample_bilinear_separable)

    x = jnp.asarray(rng.random((1, 7, 9, 3)).astype(np.float32))
    cy = jnp.asarray(np.linspace(-1.3, 1.3, 20, dtype=np.float32))[None]
    cx = jnp.asarray(np.linspace(-1.2, 1.1, 17, dtype=np.float32))[None]
    coord = jnp.stack(jnp.meshgrid(cy[0], cx[0], indexing="ij"), -1)[None]
    for mode in ("border", "zeros"):
        ref = grid_sample_bilinear(x, coord, padding_mode=mode)
        out = grid_sample_bilinear_separable(x, cy, cx, padding_mode=mode)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)


def test_resize_bilinear_banded_matches_gather(rng):
    """Large-extent resizes take the banded-block matmul path (dense axis
    matrices are O(in*out) waste at DIV2K sizes); values must match the
    gather form to f32 rounding, both align modes, non-integer ratios."""
    import jax.numpy as jnp
    from bfsr_tpu.ops.interp import resize_bilinear, _resize_axis_apply_banded

    for (H, W, oh, ow, ac) in [(1020, 678, 2040, 1356, True),
                               (170, 113, 2040, 1356, False),
                               (510, 339, 1020, 678, True)]:
        x = jnp.asarray(rng.random((1, H, W, 4)).astype(np.float32))
        ref = resize_bilinear(x, (oh, ow), align_corners=ac, method="gather")
        b = _resize_axis_apply_banded(x, H, oh, ac, 1)
        b = _resize_axis_apply_banded(b, W, ow, ac, 2)
        np.testing.assert_allclose(np.asarray(b), np.asarray(ref), atol=5e-7,
                                   err_msg=f"{H}x{W}->{oh}x{ow} ac={ac}")
        m = resize_bilinear(x, (oh, ow), align_corners=ac, method="matmul")
        np.testing.assert_allclose(np.asarray(m), np.asarray(ref), atol=5e-7)
