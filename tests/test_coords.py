import numpy as np

from bfsr_tpu.utils.coords import make_coord, make_coord_np, make_cell, to_pixel_samples


def test_make_coord_values():
    # grid centers for n=4 in [-1,1]: -0.75, -0.25, 0.25, 0.75
    c = make_coord_np((4,), flatten=True)
    np.testing.assert_allclose(c[:, 0], [-0.75, -0.25, 0.25, 0.75], atol=1e-7)


def test_make_coord_2d_ordering():
    c = make_coord_np((2, 3), flatten=False)
    assert c.shape == (2, 3, 2)
    # axis 0 of the last dim indexes height
    np.testing.assert_allclose(c[0, :, 0], [-0.5, -0.5, -0.5], atol=1e-7)
    np.testing.assert_allclose(c[:, 0, 1], [-2 / 3, -2 / 3], atol=1e-6)


def test_make_coord_jnp_matches_np():
    a = np.asarray(make_coord((5, 7), flatten=True))
    b = make_coord_np((5, 7), flatten=True)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_make_coord_ranges():
    c = make_coord_np((2,), ranges=[(0, 1)])
    np.testing.assert_allclose(c[:, 0], [0.25, 0.75], atol=1e-7)


def test_cell():
    np.testing.assert_allclose(make_cell((10, 20)), [0.2, 0.1], atol=1e-7)


def test_to_pixel_samples():
    img = np.arange(2 * 3 * 4, dtype=np.float32).reshape(3, 2, 4)
    coord, rgb = to_pixel_samples(img)
    assert coord.shape == (8, 2)
    assert rgb.shape == (8, 3)
    np.testing.assert_allclose(rgb[0], img[:, 0, 0])
    np.testing.assert_allclose(rgb[5], img[:, 1, 1])
