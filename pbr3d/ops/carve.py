"""Silhouette carving primitives.

Reference semantics (utils/voxel_carving_utils.py):

* ``carve_voxel_grid_with_masks`` (reference :76-97): a fronto-parallel (W,H)
  mask is broadcast along depth; voxels outside the mask are zeroed.
* ``process_voxel_grid`` (reference :104-126): for
  ``angle in range(0, 91, angle_interval)`` rotate the *current* grid by that
  step's angle (rotations accumulate: 0, +a, +2a, ...) then mask-carve.  With
  interval 90 this is classic two-view symmetric carving; with interval 5 it
  approximates a surface of revolution (19 carves).

All functions take/return float32 {0,1} occupancy grids of shape (W, H, D)
and are jit-friendly (static angles, static shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pbr3d.ops.rotate import rotate_y_binary_u8


def carve_with_mask(occ: jax.Array, mask_wh: jax.Array) -> jax.Array:
    """Zero voxels whose (x, y) column lies outside the (W, H) mask."""
    return occ * (mask_wh > 0).astype(occ.dtype)[:, :, None]


def sweep_angles(angle_interval: int) -> tuple:
    """The carve sweep schedule: range(0, 91, angle_interval)."""
    return tuple(range(0, 91, int(angle_interval)))


def rotate_carve_sweep(
    occ: jax.Array, mask_wh: jax.Array, angle_interval: int
) -> jax.Array:
    """Cumulative rotate-and-carve sweep (reference ``process_voxel_grid``).

    ``occ``: (W, H, D) float32 {0,1}; ``mask_wh``: (W, H) — any nonzero kept.
    NOTE: the output grid ends up rotated by the *sum* of the step angles
    (e.g. 90° total for interval 90), exactly as in the reference.
    """
    m = (mask_wh > 0).astype(occ.dtype)[:, :, None]
    for angle in sweep_angles(angle_interval):
        occ = rotate_y_binary_u8(occ, angle)
        occ = occ * m
    return occ


@functools.partial(jax.jit, static_argnames=("angle_interval",))
def rotate_carve_sweep_jit(
    occ: jax.Array, mask_wh: jax.Array, angle_interval: int
) -> jax.Array:
    return rotate_carve_sweep(occ, mask_wh, angle_interval)
