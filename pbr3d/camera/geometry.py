"""Differentiable pinhole camera (look-at parameterization).

The reference camera model is 9 DoF — cam_pos(3), target(3), f, cx, cy; the
up-vector is fixed (0,1,0) with a (0,0,1) fallback when the view direction is
(anti)parallel to it; projection is ``u = (X/Z)·f + cx``, ``v = -(Y/Z)·f + cy``
with Z clamped to >= 1e-8 (reference: utils/camera_geometry.py:3-27).

Everything here is pure jnp — batched over points, jit/vmap/grad friendly, so
the same functions serve the splat projector, the keypoint least-squares fit,
and the vmapped mask-IoU camera search.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def look_at_rotation(eye: jax.Array, target: jax.Array) -> jax.Array:
    """World->camera rotation (rows are camera x/y/z axes in world coords)."""
    up_default = jnp.array([0.0, 1.0, 0.0])
    up_fallback = jnp.array([0.0, 0.0, 1.0])
    z = target - eye
    z = z / jnp.linalg.norm(z)
    # Degenerate-up fallback, branchless (reference checks allclose(|z·up|, 1)).
    degenerate = jnp.isclose(jnp.abs(jnp.dot(z, up_default)), 1.0)
    up = jnp.where(degenerate, up_fallback, up_default)
    x = jnp.cross(up, z)
    x = x / jnp.linalg.norm(x)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=0)


def camera_rays(pts: jax.Array, cam_pos: jax.Array, target: jax.Array) -> jax.Array:
    """(N, 3) world points -> camera-frame coordinates."""
    R = look_at_rotation(cam_pos, target)
    return (pts - cam_pos) @ R.T


def project_points(
    pts: jax.Array,
    cam_pos: jax.Array,
    target: jax.Array,
    f: jax.Array,
    cx: jax.Array,
    cy: jax.Array,
    z_clamp: float = 1e-8,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Project (N, 3) points; returns (u, v, Z_cam).

    Z is clamped to >= ``z_clamp`` exactly like the reference's vectorized
    splat path (utils/projection_utils.py:9-14).
    """
    pc = camera_rays(pts, cam_pos, target)
    X, Y, Z = pc[:, 0], pc[:, 1], pc[:, 2]
    Zc = jnp.where(Z < z_clamp, z_clamp, Z)
    u = (X / Zc) * f + cx
    v = -(Y / Zc) * f + cy
    return u, v, Z


def project_point(pt: jax.Array, cam: Dict) -> jax.Array:
    """Single-point convenience matching the reference ``project`` signature
    (utils/camera_geometry.py:17-27)."""
    u, v, _ = project_points(
        jnp.asarray(pt)[None], cam["cam_pos"], cam["target"],
        cam["f"], cam["cx"], cam["cy"],
    )
    return jnp.stack([u[0], v[0]])


def params_to_vector(cam: Dict) -> jax.Array:
    return jnp.concatenate(
        [
            jnp.asarray(cam["cam_pos"], jnp.float32).ravel(),
            jnp.asarray(cam["target"], jnp.float32).ravel(),
            jnp.asarray(
                [cam["f"], cam["cx"], cam["cy"]], jnp.float32
            ),
        ]
    )


def vector_to_params(x: jax.Array, H: int | None = None, W: int | None = None) -> Dict:
    out = {
        "cam_pos": x[0:3],
        "target": x[3:6],
        "f": x[6],
        "cx": x[7],
        "cy": x[8],
    }
    if H is not None:
        out["H"] = H
        out["W"] = W
    return out
