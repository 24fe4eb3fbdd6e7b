"""Low-level pinhole-camera math (bottom layer — no pbr3d imports).

See pbr3d.camera.geometry for the user-facing API and the reference-parity
notes (reference: utils/camera_geometry.py:3-27).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def look_at_rotation(eye: jax.Array, target: jax.Array) -> jax.Array:
    """World->camera rotation (rows are camera x/y/z axes in world coords)."""
    up_default = jnp.array([0.0, 1.0, 0.0])
    up_fallback = jnp.array([0.0, 0.0, 1.0])
    z = target - eye
    z = z / jnp.linalg.norm(z)
    degenerate = jnp.isclose(jnp.abs(jnp.dot(z, up_default)), 1.0)
    up = jnp.where(degenerate, up_fallback, up_default)
    x = jnp.cross(up, z)
    x = x / jnp.linalg.norm(x)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=0)


def camera_rays(pts: jax.Array, cam_pos: jax.Array, target: jax.Array) -> jax.Array:
    """(N, 3) world points -> camera-frame coordinates.

    Precision.HIGHEST is load-bearing: TPU matmuls default to bf16 input
    passes, which puts ~1 px of error on u/v and ~4 voxels on camera Z at
    512-scale coordinates (measured device-vs-CPU) — fatal for z-buffer
    visibility tests whose epsilon is 1e-3 (eval_helpers_intra.py:168)."""
    R = look_at_rotation(cam_pos, target)
    return jnp.matmul(pts - cam_pos, R.T, precision=jax.lax.Precision.HIGHEST)


def project_points(
    pts: jax.Array,
    cam_pos: jax.Array,
    target: jax.Array,
    f: jax.Array,
    cx: jax.Array,
    cy: jax.Array,
    z_clamp: float = 1e-8,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Project (N, 3) points; returns (u, v, Z_cam).  Z clamped to z_clamp
    exactly like the reference's vectorized splat path
    (utils/projection_utils.py:9-14)."""
    pc = camera_rays(pts, cam_pos, target)
    X, Y, Z = pc[:, 0], pc[:, 1], pc[:, 2]
    Zc = jnp.where(Z < z_clamp, z_clamp, Z)
    u = (X / Zc) * f + cx
    v = -(Y / Zc) * f + cy
    return u, v, Z
