"""IoU-driven search over the 4-DoF part deformation.

Replaces the reference's interactive slider viewer
(``launch_deform_viewer_fixed_camera``, utils/deformation_estimation.py:15-356)
with an automated optimizer over the same objective: per-part color-exact IoU
of the splat projection of the deformed part under the fixed stage-2 camera.

TPU-native shape: a whole *population* of candidate deforms is evaluated in
one vmapped program (warp -> splat -> IoU per candidate), chunked to bound
memory; coarse grid search over the slider ranges, then a local refinement —
the automated analogue of the reference's (commented-out) two-step auto-align
(deformation_estimation.py:148-259), whose ranges we reuse.
Point sets are optionally strided during search exactly like the reference's
``project_fast`` (:34-38), with the final IoU computed on the full set.
"""

from __future__ import annotations

import functools
import itertools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pbr3d import config
from pbr3d.camera.geometry import params_to_vector
from pbr3d.carving.voxel import bucket_size, pad_points, points_by_parts
from pbr3d.deform.warp import deform_coords
from pbr3d.ops.projection import partwise_iou, splat_labels

IDENTITY_DEFORM = np.array([1.0, 0.0, 1.0, 0.0], np.float32)  # sy, dy, sxz, dxz


@functools.partial(jax.jit, static_argnames=("H", "W"))
def _batch_deform_iou(
    deforms: jax.Array,  # (P, 4)
    coords: jax.Array,  # (N, 3) f32
    valid: jax.Array,  # (N,)
    cam_vec: jax.Array,  # (9,)
    gt_labels: jax.Array,  # (H, W) — PADDED plane
    part_id: jax.Array,  # scalar int32 (traced: one compile serves all parts)
    true_hw: jax.Array,  # (2,) int32 — the real image extent inside the plane
    voxel_shape: jax.Array,  # (3,) int32 (D, H, W) — traced: serves all scenes
    H: int,
    W: int,
) -> jax.Array:
    """Only the padded plane allocation (H, W) and the point-bucket size are
    static — one compiled executable serves every part, scene size, and grid
    shape (compiles are very expensive on this backend)."""
    ids = part_id.reshape(1).astype(jnp.int32)

    def one(d):
        c, v = deform_coords(coords, valid, true_hw, voxel_shape, d)
        img = splat_labels(
            c.astype(jnp.float32),
            jnp.full((c.shape[0],), 1, jnp.uint8) * part_id.astype(jnp.uint8),
            v,
            cam_vec[0:3], cam_vec[3:6], cam_vec[6], cam_vec[7], cam_vec[8],
            H, W, true_hw,
        )
        return partwise_iou(img, gt_labels, ids)[0][0]

    return jax.vmap(one)(deforms)


#: Max candidate-points resident per vmapped eval (bounds device memory:
#: each candidate materializes 7x its padded point set plus projections,
#: ~40 B/point -> ~2.7 GB at this budget).  Large batches matter: dispatch
#: round-trips to the TPU dominate the search wall time.
_POINT_BUDGET = 1 << 26


def _auto_chunk(n_points: int, chunk_cap: int) -> int:
    c = max(1, _POINT_BUDGET // max(1, 7 * n_points))
    c = 1 << (c.bit_length() - 1)  # floor pow2 -> few distinct compiled shapes
    return int(min(c, chunk_cap))


def _eval_chunked(deforms: np.ndarray, chunk_cap: int, **kw) -> np.ndarray:
    outs = []
    P = deforms.shape[0]
    chunk = _auto_chunk(kw["coords"].shape[0], min(chunk_cap, P))
    pad = (-P) % chunk
    d = np.concatenate([deforms, np.tile(IDENTITY_DEFORM, (pad, 1))]) if pad else deforms
    for i in range(0, len(d), chunk):
        outs.append(np.asarray(_batch_deform_iou(jnp.asarray(d[i : i + chunk]), **kw)))
    return np.concatenate(outs)[:P]


def optimize_part_deform(
    grid_labels: np.ndarray,
    part: str,
    mask_labels: np.ndarray,
    cam: Dict,
    *,
    search_stride: int = 8,
    scale_range: Tuple[float, float, int] = (0.8, 1.2, 7),
    shift_range: Tuple[float, float, int] = (-60.0, 60.0, 9),
    refine_steps: int = 3,
    chunk: int = 64,
    mode: str = "separable",
    _points=None,
) -> Tuple[np.ndarray, float]:
    """Best (scale_y, shift_y, scale_xz, shift_xz) for one part + its IoU.

    Search uses every ``search_stride``-th point (reference project_fast);
    the returned IoU is re-evaluated on the full point set.

    ``mode="separable"`` (default) searches the (scale_y, shift_y) pair
    first (xz identity), then (scale_xz, shift_xz) given the best y, then a
    joint local refinement — ~20x fewer objective evaluations than the full
    4-D cross product (``mode="full"``), with matching quality on the
    reference scenes because the y and xz DoFs act on near-orthogonal image
    directions.
    """
    pid = config.PART_IDS[part]
    pts = _points if _points is not None else points_by_parts(grid_labels, [part])[0]
    if len(pts) == 0:
        return IDENTITY_DEFORM.copy(), 0.0
    voxel_shape = np.asarray(grid_labels).shape[:3]
    H, W = mask_labels.shape[:2]
    # pad the image plane to a shared bucket so every scene size reuses the
    # same compiled program; the true extent is a traced argument
    Hp, Wp = (-(-x // 128) * 128 for x in (H, W))
    gt_p = np.zeros((Hp, Wp), mask_labels.dtype)
    gt_p[:H, :W] = mask_labels

    def padded(p):
        return pad_points(p, np.full(len(p), pid, np.uint8), bucket_size(len(p)))

    sub = pts[::search_stride]
    p_s, _, v_s = padded(sub)
    p_f, _, v_f = padded(pts)
    gt = jnp.asarray(gt_p)
    cam_vec = jnp.asarray(params_to_vector(cam))
    true_hw = jnp.asarray([H, W], jnp.int32)
    vs = jnp.asarray(voxel_shape, jnp.int32)

    def ev(deforms, pp, vv):
        return _eval_chunked(
            np.asarray(deforms, np.float32), chunk,
            coords=jnp.asarray(pp), valid=jnp.asarray(vv), cam_vec=cam_vec,
            gt_labels=gt, part_id=jnp.int32(pid), true_hw=true_hw,
            voxel_shape=vs, H=Hp, W=Wp,
        )

    s0, s1, ns = scale_range
    d0, d1, nd = shift_range
    scales = np.linspace(s0, s1, ns)
    shifts = np.linspace(d0, d1, nd)

    if mode == "full":
        coarse = np.array(
            [(sy, dy, sxz, dxz) for sy, sxz, dy, dxz in
             itertools.product(scales, scales, shifts, shifts)],
            np.float32,
        )
        # Always include identity so we can never regress below it.
        coarse = np.concatenate([IDENTITY_DEFORM[None], coarse])
        ious = ev(coarse, p_s, v_s)
        best = coarse[int(np.argmax(ious))]
    else:
        # stage A: (scale_y, shift_y) with xz identity
        ca = np.array(
            [(sy, dy, 1.0, 0.0) for sy, dy in itertools.product(scales, shifts)],
            np.float32,
        )
        ca = np.concatenate([IDENTITY_DEFORM[None], ca])
        best = ca[int(np.argmax(ev(ca, p_s, v_s)))]
        # stage B: (scale_xz, shift_xz) given the best y
        cb = np.array(
            [(best[0], best[1], sxz, dxz)
             for sxz, dxz in itertools.product(scales, shifts)],
            np.float32,
        )
        cb = np.concatenate([best[None], cb])
        best = cb[int(np.argmax(ev(cb, p_s, v_s)))]

    # local refinement around the coarse optimum
    rs = np.linspace(-0.05, 0.05, refine_steps)
    rd = np.linspace(-10.0, 10.0, refine_steps)
    fine = np.array(
        [best + np.array([a, b, c, d], np.float32)
         for a, c, b, d in itertools.product(rs, rs, rd, rd)],
        np.float32,
    )
    fine = np.concatenate([best[None], fine])
    ious = ev(fine, p_s, v_s)
    best = fine[int(np.argmax(ious))]

    final_iou = float(ev(best[None], p_f, v_f)[0])
    return np.asarray(best, np.float32), final_iou


def refine_parts(
    grid_labels: np.ndarray,
    mask_labels: np.ndarray,
    cam: Dict,
    part_names: Sequence[str] | None = None,
    **kw,
) -> Dict[str, Dict]:
    """Optimize every (present) part; returns {part: {deform, iou}} like the
    reference's saved_params (deformation_estimation.py:262-286)."""
    from pbr3d.carving.voxel import PointCache

    if part_names is None:
        part_names = [p for p in config.PART_NAMES if p != "background"]
    cache = PointCache(grid_labels)  # one grid scan for all parts
    present = set(np.unique(cache._labels))
    out = {}
    for part in part_names:
        if config.PART_IDS[part] not in present:
            continue
        deform, iou = optimize_part_deform(
            grid_labels, part, mask_labels, cam,
            _points=cache.points_by_parts([part])[0], **kw)
        out[part] = {
            "deform": {
                "scale_y": float(deform[0]),
                "shift_y": float(deform[1]),
                "scale_xz": float(deform[2]),
                "shift_xz": float(deform[3]),
            },
            "iou": iou,
        }
    return out
