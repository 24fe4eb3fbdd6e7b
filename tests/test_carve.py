"""rotate_carve_sweep vs a scipy-based oracle of the reference semantics."""

import numpy as np
import pytest
import scipy.ndimage

from pbr3d.ops.carve import rotate_carve_sweep_jit
from pbr3d.ops.rotate import rotation_matrix_inv


def _oracle_sweep(grid_u8, mask_wh, interval):
    """Reference ``process_voxel_grid`` semantics re-stated with scipy."""
    c = np.array(grid_u8.shape) / 2
    g = grid_u8
    for angle in range(0, 91, interval):
        Rinv = rotation_matrix_inv(angle)
        g = scipy.ndimage.affine_transform(
            g, Rinv, offset=c - Rinv @ c, order=1, mode="constant", cval=0
        )
        g = np.where(mask_wh[:, :, None] != 0, g, 0)
    return g


@pytest.mark.parametrize("interval", [90, 45, 15, 5])
def test_sweep_matches_oracle_exact(rng, interval):
    W = H = 28
    mask = (rng.random((W, H)) > 0.4).astype(np.uint8)
    grid = np.ones((W, H, W), np.uint8)
    ref = _oracle_sweep(grid, mask, interval)
    ours = np.asarray(
        rotate_carve_sweep_jit(grid.astype(np.float32), mask, interval)
    ).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)
