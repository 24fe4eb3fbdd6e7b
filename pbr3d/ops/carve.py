"""Silhouette carving primitives.

Reference semantics (utils/voxel_carving_utils.py):

* ``carve_voxel_grid_with_masks`` (reference :76-97): a fronto-parallel (W,H)
  mask is broadcast along depth; voxels outside the mask are zeroed.
* ``process_voxel_grid`` (reference :104-126): for
  ``angle in range(0, 91, angle_interval)`` rotate the *current* grid by that
  step's angle (rotations accumulate: 0, +a, +2a, ...) then mask-carve.  With
  interval 90 this is classic two-view symmetric carving; with interval 5 it
  approximates a surface of revolution (19 carves).

TPU design: the whole sweep is ONE jit-compiled program — a ``lax.scan`` over
the per-angle rotation plans (corner gather indices + the bit-exact binary
decision LUTs of pbr3d.ops.rotate), which are *device arguments*, not baked
constants.  The compiled executable is therefore keyed only by (grid shape,
number of sweep steps): every component crop of the same shape and every
angle schedule of the same length reuse one executable — critical because
this pipeline compiles against a remote-TPU toolchain where each distinct
program is expensive to build.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pbr3d.ops.rotate import lut_plan, lut_plan_embedded


def carve_with_mask(occ: jax.Array, mask_wh: jax.Array) -> jax.Array:
    """Zero voxels whose (x, y) column lies outside the (W, H) mask."""
    return occ * (mask_wh > 0).astype(occ.dtype)[:, :, None]


def sweep_angles(angle_interval: int) -> tuple:
    """The carve sweep schedule: range(0, 91, angle_interval)."""
    return tuple(range(0, 91, int(angle_interval)))


@functools.lru_cache(maxsize=256)
def _stacked_plans(W: int, D: int, angle_interval: int):
    """Stacked (A, 4, N) int32 indices + (A, N) int32 decision LUTs for the
    non-zero sweep angles (the 0° step is a pure mask multiply)."""
    angles = [a for a in sweep_angles(angle_interval) if a % 360 != 0]
    if not angles:
        return (
            np.zeros((0, 4, W * D), np.int32),
            np.zeros((0, W * D), np.int32),
        )
    idxs, decs = zip(*(lut_plan(W, D, float(a)) for a in angles))
    return np.stack(idxs), np.stack(decs)


@functools.lru_cache(maxsize=512)
def _stacked_plans_padded(W: int, D: int, Wp: int, Dp: int, angle_interval: int):
    angles = [a for a in sweep_angles(angle_interval) if a % 360 != 0]
    if not angles:
        return (
            np.zeros((0, 4, Wp * Dp), np.int32),
            np.zeros((0, Wp * Dp), np.int32),
        )
    idxs, decs = zip(*(lut_plan_embedded(W, D, Wp, Dp, float(a)) for a in angles))
    return np.stack(idxs), np.stack(decs)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.partial(jax.jit, donate_argnums=(0,))
def _sweep_scan(g2: jax.Array, m2: jax.Array, idx: jax.Array, dec: jax.Array):
    """g2 (H, N) occupancy {0,1}; m2 (H, N) column mask {0,1};
    idx (A, 4, N) int32; dec (A, N) 16-bit decision LUTs.

    Works in uint8/uint16 internally: the (H, N) buffers at 512 scale are
    ~410 M elements each, and the int32 formulation's ~8 GB working set was
    observed to crash the TPU worker; narrow dtypes keep it under ~3 GB and
    cut HBM traffic on the gathers by 4x.  Bit-exact: occupancy is {0,1},
    codes are 4-bit, LUT entries fit uint16.
    """
    g2 = (g2 * m2).astype(jnp.uint8)  # the 0° identity step
    m8 = m2.astype(jnp.uint8)

    def body(g, plan):
        pidx, pdec = plan
        code = jnp.zeros_like(g)
        for k in range(4):
            code = code | (jnp.take(g, pidx[k], axis=1) << k)
        out = (
            jnp.right_shift(
                pdec.astype(jnp.uint16)[None, :], code.astype(jnp.uint16)
            )
            & 1
        ).astype(jnp.uint8)
        return out * m8, None

    g2, _ = jax.lax.scan(body, g2, (idx, dec))
    return g2


def rotate_carve_sweep(
    occ: jax.Array, mask_wh: jax.Array, angle_interval: int,
    bucket: int | None = None,
) -> jax.Array:
    """Cumulative rotate-and-carve sweep (reference ``process_voxel_grid``),
    bit-exact vs the scipy uint8 path.

    ``occ``: (W, H, D) float/uint8/bool {0,1}; ``mask_wh``: (W, H) — any
    nonzero kept.  NOTE: the output grid ends up rotated by the *sum* of the
    step angles (e.g. 90° total for interval 90), exactly as in the
    reference.

    ``bucket``: pad every dimension up to a multiple of ``bucket`` and run
    the sweep at the padded shape with origin-embedded plans
    (:func:`pbr3d.ops.rotate.lut_plan_embedded`).  The result in the original
    region is BIT-IDENTICAL (decisions are computed in the original frame on
    host), but all crops sharing a bucket share ONE compiled executable —
    essential on this remote-compile backend where each distinct program
    shape costs tens of seconds to build.
    """
    W, H, D = occ.shape
    dtype = occ.dtype

    if bucket:
        Wp, Hp, Dp = (_round_up(x, bucket) for x in (W, H, D))
    else:
        Wp, Hp, Dp = W, H, D

    if (Wp, Hp, Dp) == (W, H, D):
        idx, dec = _stacked_plans(W, D, int(angle_interval))
        g2 = (jnp.transpose(occ, (1, 0, 2)).reshape(H, W * D) > 0).astype(jnp.uint8)
        m_wh = (jnp.asarray(mask_wh) > 0).astype(jnp.uint8)
        m2 = jnp.broadcast_to(m_wh.T[:, :, None], (H, W, D)).reshape(H, W * D)
        out = _sweep_scan(g2, m2, jnp.asarray(idx), jnp.asarray(dec))
        return jnp.transpose(out.reshape(H, W, D), (1, 0, 2)).astype(dtype)

    idx, dec = _stacked_plans_padded(W, D, Wp, Dp, int(angle_interval))
    occ_p = jnp.zeros((Wp, Hp, Dp), jnp.uint8).at[:W, :H, :D].set(
        (occ > 0).astype(jnp.uint8)
    )
    m_wh = jnp.zeros((Wp, Hp), jnp.uint8).at[:W, :H].set(
        (jnp.asarray(mask_wh) > 0).astype(jnp.uint8)
    )
    g2 = jnp.transpose(occ_p, (1, 0, 2)).reshape(Hp, Wp * Dp)
    m2 = jnp.broadcast_to(m_wh.T[:, :, None], (Hp, Wp, Dp)).reshape(Hp, Wp * Dp)
    out = _sweep_scan(g2, m2, jnp.asarray(idx), jnp.asarray(dec))
    out = jnp.transpose(out.reshape(Hp, Wp, Dp), (1, 0, 2))
    return out[:W, :H, :D].astype(dtype)


# Back-compat alias (the sweep is fully jit'd internally).
rotate_carve_sweep_jit = rotate_carve_sweep
