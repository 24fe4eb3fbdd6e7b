"""rotate_y vs the scipy.ndimage.affine_transform oracle."""

import numpy as np
import pytest
import scipy.ndimage

from pbr3d.ops.rotate import rotate_y, rotate_y_binary_u8, rotation_matrix_inv


def _scipy_rotate(grid, angle, order=1):
    c = np.array(grid.shape) / 2
    Rinv = rotation_matrix_inv(angle)
    return scipy.ndimage.affine_transform(
        grid, Rinv, offset=c - Rinv @ c, order=order, mode="constant", cval=0
    )


@pytest.mark.parametrize("angle", [0, 5, 17, 45, 60, 90])
def test_rotate_float_matches_scipy(rng, angle):
    g = (rng.random((24, 10, 24)) > 0.6).astype(np.float32)
    ours = np.asarray(rotate_y(g, angle))
    ref = _scipy_rotate(g.astype(np.float64), angle)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


@pytest.mark.parametrize("angle", [5, 45, 60, 90])
def test_rotate_binary_matches_scipy_uint8(rng, angle):
    # The decision-LUT path must be BIT-EXACT against scipy's uint8 rounding
    # (including ties exactly at 0.5, e.g. the cos(60°)≈0.5 weights).
    g = (rng.random((32, 12, 32)) > 0.5).astype(np.uint8)
    ours = np.asarray(rotate_y_binary_u8(g.astype(np.float32), angle))
    ref = _scipy_rotate(g, angle)
    np.testing.assert_array_equal(ours.astype(np.uint8), ref)


def test_rotate_90_exact_permutation(rng):
    # 90° on a square (x,z) footprint is an exact index permutation.
    g = rng.integers(0, 7, (16, 5, 16)).astype(np.float32)
    ours = np.asarray(rotate_y(g, 90))
    ref = _scipy_rotate(g.astype(np.float64), 90)
    # ours is the exact permutation; scipy's float64 result carries ~1e-15
    # round-off from its near-0/1 corner weights.
    np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_rotate_rectangular_xz(rng):
    # Guided carving crops are generally W != D.
    g = (rng.random((11, 7, 19)) > 0.5).astype(np.float32)
    for angle in (5, 45, 90):
        ours = np.asarray(rotate_y(g, angle))
        ref = _scipy_rotate(g.astype(np.float64), angle)
        np.testing.assert_allclose(ours, ref, atol=2e-5)
