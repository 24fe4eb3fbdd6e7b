"""IoU-driven search over the 4-DoF part deformation.

Replaces the reference's interactive slider viewer
(``launch_deform_viewer_fixed_camera``, utils/deformation_estimation.py:15-356)
with an automated optimizer whose objective is the notebook-4 acceptance
metric itself: the *visibility-aware* binary IoU of the deformed part under
the fixed stage-2 camera (utils/eval_helpers_intra.py:168-190,560-748) — a
pixel counts iff the part's nearest point survives the z-test against the
rest of the building.  The reference's live viewer shows exactly this
occlusion to the human; optimizing the unoccluded splat IoU instead can
"improve" a part by hiding it behind the building.

TPU-native shape: a whole *population* of candidate deforms is evaluated in
one vmapped program (warp -> z-buffer -> visible IoU per candidate), chunked
to bound memory; coarse grid search over the slider ranges, then a local
refinement.  Parts are optimized sequentially conditioned on the current
z-buffer of all *other* parts (each part's z-buffer is one segment_min
image, recomputed only when its deform changes).

Point sets are optionally strided during search exactly like the reference's
``project_fast`` (:34-38), with the final IoU computed on the full set.
"""

from __future__ import annotations

import functools
import itertools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pbr3d import config
from pbr3d.camera.geometry import params_to_vector
from pbr3d.carving.voxel import (
    bucket_size,
    points_by_parts,
    surface_points_by_parts,
)
from pbr3d.deform.warp import deform_coords
from pbr3d.ops.projection import partwise_iou, splat_labels, zbuffer

IDENTITY_DEFORM = np.array([1.0, 0.0, 1.0, 0.0], np.float32)  # sy, dy, sxz, dxz

#: Parts pinned to the identity deform by default.  The notebook-4 "minarets"
#: row projects the INIT grid's minaret points into the DEFORMED grid's
#: z-buffer (utils/eval_helpers_intra.py:631-648): any deform that moves the
#: minarets' z-surface makes the init points fail the |z - zbuf| < eps test
#: and the row collapses.  The reference goldens keep minarets at identity
#: (results/3.*: minarets rows 0.846->0.846, 0.837->0.837).
PIN_IDENTITY_PARTS = ("front_minarets", "back_minarets")

#: Visibility epsilon of the intra-method eval (eval_helpers_intra.py:168).
VIS_EPS = 1e-3


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
    """Unoccluded color-exact splat IoU per candidate (the reference viewer's
    on-screen number, camera_estimation.py:770-788).  Kept for diagnostics;
    the search optimizes ``_batch_deform_visible_iou``."""
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


@functools.partial(jax.jit, static_argnames=("H", "W"))
def _batch_deform_visible_iou(
    deforms: jax.Array,  # (P, 4)
    coords: jax.Array,  # (N, 3) f32
    valid: jax.Array,  # (N,)
    cam_vec: jax.Array,  # (9,)
    gt_part: jax.Array,  # (H, W) bool — PADDED plane, mask == part id
    rest_zbuf: jax.Array,  # (H, W) f32 — min-Z of all OTHER parts (inf empty)
    true_hw: jax.Array,  # (2,) int32
    voxel_shape: jax.Array,  # (3,) int32 (D, H, W)
    center: jax.Array,  # (3,) f32 — FULL part centroid (coords may be a shell)
    H: int,
    W: int,
) -> jax.Array:
    """Visibility-aware binary IoU per candidate — the notebook-4 metric.

    The eval marks a pixel visible iff some part point has
    |Z - zbuf| < eps with zbuf = min over the WHOLE grid
    (eval_helpers_intra.py:134-190).  With zbuf = min(rest, part_min) that
    reduces to ``part_min < rest + eps`` (the part's own min-Z point always
    passes against itself), so one segment_min per candidate suffices.
    """

    def one(d):
        c, v = deform_coords(coords, valid, true_hw, voxel_shape, d, center)
        zb = zbuffer(
            c.astype(jnp.float32), v,
            cam_vec[0:3], cam_vec[3:6], cam_vec[6], cam_vec[7], cam_vec[8],
            H, W, true_hw=true_hw,
        )
        visible = zb < rest_zbuf + VIS_EPS
        inter = jnp.sum(visible & gt_part).astype(jnp.float32)
        union = jnp.sum(visible | gt_part).astype(jnp.float32)
        return jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)

    return jax.vmap(one)(deforms)


@functools.partial(jax.jit, static_argnames=("H", "W"))
def deformed_zbuffer(
    deform: jax.Array,  # (4,)
    coords: jax.Array,  # (N, 3) f32
    valid: jax.Array,
    cam_vec: jax.Array,
    true_hw: jax.Array,
    voxel_shape: jax.Array,
    center: jax.Array,  # (3,) f32 — FULL part centroid
    H: int,
    W: int,
) -> jax.Array:
    """(H, W) min-Z buffer of one part at one deform (inf where empty)."""
    c, v = deform_coords(coords, valid, true_hw, voxel_shape, deform, center)
    return zbuffer(
        c.astype(jnp.float32), v,
        cam_vec[0:3], cam_vec[3:6], cam_vec[6], cam_vec[7], cam_vec[8],
        H, W, true_hw=true_hw,
    )


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
    """Evaluate P candidates in fixed-size chunks.  Small batches (P=1..2
    re-checks) are PADDED UP to the same chunk shape the search batches use:
    one executable per point bucket instead of one per batch size (remote
    compiles cost ~a minute each on this backend)."""
    outs = []
    P = deforms.shape[0]
    chunk = _auto_chunk(kw["coords"].shape[0], chunk_cap)
    pad = (-P) % chunk
    d = np.concatenate([deforms, np.tile(IDENTITY_DEFORM, (pad, 1))]) if pad else deforms
    for i in range(0, len(d), chunk):
        outs.append(
            np.asarray(_batch_deform_visible_iou(jnp.asarray(d[i : i + chunk]), **kw))
        )
    return np.concatenate(outs)[:P]


def _pad_plane_hw(H: int, W: int) -> Tuple[int, int]:
    return (-(-H // 128) * 128, -(-W // 128) * 128)


def pad_points_i16(pts: np.ndarray, n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Bucket-pad integer voxel coordinates as int16 (they fit: grids are
    <=512 per axis).  Host->device transfer over the remote tunnel dominates
    stage-3 at full resolution (a 5M-point solid pads to an 8M bucket =
    100 MB as float32); int16 halves it.  ``deform_coords`` casts on device.
    """
    m = pts.shape[0]
    if m > n:
        raise ValueError(f"{m} points exceed pad size {n}")
    out_p = np.zeros((n, 3), np.int16)
    out_v = np.zeros((n,), bool)
    out_p[:m] = pts
    out_v[:m] = True
    return out_p, out_v


def optimize_part_deform(
    grid_labels: np.ndarray,
    part: str,
    mask_labels: np.ndarray,
    cam: Dict,
    *,
    rest_zbuf: Optional[np.ndarray] = None,
    search_stride: int = 8,
    surface_stride: int = 2,
    scale_range: Tuple[float, float, int] = (0.8, 1.2, 7),
    shift_range: Tuple[float, float, int] = (-60.0, 60.0, 9),
    refine_steps: int = 3,
    chunk: int = 64,
    mode: str = "separable",
    _points=None,
    _surface_points=None,
    _device_full=None,
    _zb_identity=None,
) -> Tuple[np.ndarray, float]:
    """Best (scale_y, shift_y, scale_xz, shift_xz) for one part + its IoU.

    The objective is the notebook-4 visibility-aware binary IoU of the part
    (mask == part id vs z-visible deformed points).  ``rest_zbuf`` is the
    (H, W) min-Z buffer of every OTHER part (defaults to no occluders).

    Candidates are evaluated on the part's 6-connected SURFACE shell strided
    by ``surface_stride`` — the z-buffer of a solid is (to pixel-rounding)
    the z-buffer of its shell, and the shell is ~an order of magnitude
    smaller, so whole populations fit one dispatch.  The warp pivots on the
    FULL set's centroid (passed explicitly), so a deform vector means the
    same thing on the shell as on the solid.  Without a shell
    (``_surface_points=None`` and no grid) the solid strided by
    ``search_stride`` is used (reference project_fast).  The returned IoU
    and the accept-vs-identity check always use the full point set.

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
    Hp, Wp = _pad_plane_hw(H, W)
    gt_p = np.zeros((Hp, Wp), bool)
    gt_p[:H, :W] = np.asarray(mask_labels) == pid
    if rest_zbuf is None:
        rest = np.full((Hp, Wp), np.inf, np.float32)
    else:
        rest = np.full((Hp, Wp), np.inf, np.float32)
        rest[: rest_zbuf.shape[0], : rest_zbuf.shape[1]] = rest_zbuf

    shell = _surface_points
    if shell is None:
        shell = surface_points_by_parts(grid_labels, [part])[0]
    if len(shell):
        sub = shell[::surface_stride]
    else:  # degenerate: every voxel interior-labeled (cannot happen for >0 pts)
        sub = pts[::search_stride]
    center = jnp.asarray(pts.mean(axis=0), jnp.float32)  # FULL-set centroid
    p_s, v_s = pad_points_i16(sub, bucket_size(len(sub)))
    if _device_full is not None:
        p_f, v_f = _device_full  # device-resident: skip the big re-upload
    else:
        p_f, v_f = pad_points_i16(pts, bucket_size(len(pts)))
    gt = jnp.asarray(gt_p)
    rest_j = jnp.asarray(rest)
    cam_vec = jnp.asarray(params_to_vector(cam))
    true_hw = jnp.asarray([H, W], jnp.int32)
    vs = jnp.asarray(voxel_shape, jnp.int32)

    def ev(deforms, pp, vv):
        return _eval_chunked(
            np.asarray(deforms, np.float32), chunk,
            coords=jnp.asarray(pp), valid=jnp.asarray(vv), cam_vec=cam_vec,
            gt_part=gt, rest_zbuf=rest_j, true_hw=true_hw,
            voxel_shape=vs, center=center, H=Hp, W=Wp,
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

    # full-set comparison: accept the searched deform only if it beats
    # identity on the full point set too (strided search can overfit).
    # Full-set IoUs come from single-deform z-buffers + image math rather
    # than the 64-wide candidate program (64x less point work).
    zb_best = deformed_zbuffer(
        jnp.asarray(best), jnp.asarray(p_f), jnp.asarray(v_f), cam_vec,
        true_hw, vs, center, Hp, Wp,
    )
    if _zb_identity is not None:
        zb_id = _zb_identity  # already maintained by refine_parts
    else:
        zb_id = np.asarray(deformed_zbuffer(
            jnp.asarray(IDENTITY_DEFORM), jnp.asarray(p_f), jnp.asarray(v_f),
            cam_vec, true_hw, vs, center, Hp, Wp,
        ))
    iou_best = _visible_iou_from_zb(np.asarray(zb_best), rest, gt_p)
    iou_id = _visible_iou_from_zb(np.asarray(zb_id), rest, gt_p)
    if iou_best <= iou_id:
        return IDENTITY_DEFORM.copy(), float(iou_id)
    return np.asarray(best, np.float32), float(iou_best)


def _visible_iou_from_zb(
    zb_part: np.ndarray, rest_zbuf: np.ndarray, gt_part: np.ndarray
) -> float:
    """The notebook-4 visible IoU given the part's min-Z image — identical to
    ``_batch_deform_visible_iou`` but pure (H, W) image math (the z-buffers
    are already maintained per part, so no point re-evaluation is needed)."""
    visible = zb_part < rest_zbuf + VIS_EPS
    union = np.logical_or(visible, gt_part).sum()
    if union == 0:
        return 0.0
    return float(np.logical_and(visible, gt_part).sum() / union)


def _deform_vec(d: Dict) -> np.ndarray:
    return np.array(
        [d["scale_y"], d["shift_y"], d["scale_xz"], d["shift_xz"]], np.float32
    )


def refine_parts(
    grid_labels: np.ndarray,
    mask_labels: np.ndarray,
    cam: Dict,
    part_names: Sequence[str] | None = None,
    *,
    pin_identity: Sequence[str] = PIN_IDENTITY_PARTS,
    overrides: Optional[Dict[str, Dict]] = None,
    verify: bool = True,
    cache=None,
    **kw,
) -> Dict[str, Dict]:
    """Optimize every (present) part; returns {part: {deform, iou}} like the
    reference's saved_params (deformation_estimation.py:262-286).

    Parts are searched sequentially, largest first, each conditioned on the
    z-buffer of all other parts at their current deforms (the notebook-4
    occlusion model).  ``pin_identity`` parts keep the identity deform (see
    PIN_IDENTITY_PARTS).  ``overrides`` forces {part: deform-dict} verbatim —
    the escape hatch replacing the reference's human sliders.  With
    ``verify`` each searched deform is re-checked against identity under the
    FINAL z-buffer and reverted if it regresses, so no init->deformed eval
    cell can fall below identity.
    """
    from pbr3d.carving.voxel import PointCache

    if part_names is None:
        part_names = [p for p in config.PART_NAMES if p != "background"]
    overrides = overrides or {}
    if cache is None:
        cache = PointCache(grid_labels)
    present = set(np.unique(cache._labels))
    parts = [p for p in part_names if config.PART_IDS[p] in present]
    if not parts:
        return {}

    H, W = np.asarray(mask_labels).shape[:2]
    Hp, Wp = _pad_plane_hw(H, W)
    cam_vec = jnp.asarray(params_to_vector(cam))
    true_hw = jnp.asarray([H, W], jnp.int32)
    vs = jnp.asarray(np.asarray(grid_labels).shape[:3], jnp.int32)
    gt_full = np.asarray(mask_labels)

    padded_sets = {}
    centers = {}
    for p in parts:
        pts = cache.points_by_parts([p])[0]
        pp, vv = pad_points_i16(pts, bucket_size(len(pts)))
        padded_sets[p] = (jnp.asarray(pp), jnp.asarray(vv), len(pts))
        centers[p] = jnp.asarray(pts.mean(axis=0), jnp.float32)

    def zb_at(p: str, deform: np.ndarray) -> np.ndarray:
        pp, vv, _ = padded_sets[p]
        return np.asarray(deformed_zbuffer(
            jnp.asarray(deform), pp, vv, cam_vec, true_hw, vs, centers[p],
            Hp, Wp,
        ))

    state: Dict[str, np.ndarray] = {p: IDENTITY_DEFORM.copy() for p in parts}
    zbs: Dict[str, np.ndarray] = {}
    zb_identity: Dict[str, np.ndarray] = {}
    for p in parts:
        zb_identity[p] = zb_at(p, IDENTITY_DEFORM)
        if p in overrides:
            state[p] = _deform_vec(overrides[p])
            zbs[p] = zb_at(p, state[p])
        else:
            zbs[p] = zb_identity[p]

    def rest_zb(p: str) -> np.ndarray:
        others = [zbs[q] for q in parts if q != p]
        if not others:
            return np.full((Hp, Wp), np.inf, np.float32)
        return np.minimum.reduce(others)

    @functools.lru_cache(maxsize=None)
    def _gt_plane(p: str):
        g = np.zeros((Hp, Wp), bool)
        g[:H, :W] = gt_full == config.PART_IDS[p]
        return g

    # largest parts first: their z-surfaces dominate everyone's occlusion
    searched = [
        p for p in sorted(parts, key=lambda q: -padded_sets[q][2])
        if p not in pin_identity and p not in overrides
    ]
    for p in searched:
        deform, _ = optimize_part_deform(
            grid_labels, p, mask_labels, cam,
            rest_zbuf=rest_zb(p),
            _points=cache.points_by_parts([p])[0],
            _surface_points=cache.surface_points_by_parts([p])[0],
            _device_full=padded_sets[p][:2],
            _zb_identity=zb_identity[p],
            **kw,
        )
        if not np.array_equal(deform, state[p]):
            state[p] = deform
            zbs[p] = zb_at(p, deform)

    if verify:
        # pure image math over the maintained per-part z-buffers: revert any
        # deform that regresses vs identity under the FINAL occlusion state
        for _ in range(3):
            regressed = []
            for p in searched:
                if np.array_equal(state[p], IDENTITY_DEFORM):
                    continue
                rest = rest_zb(p)
                gt = _gt_plane(p)
                cur = _visible_iou_from_zb(zbs[p], rest, gt)
                ident = _visible_iou_from_zb(zb_identity[p], rest, gt)
                if cur + 1e-6 < ident:
                    regressed.append(p)
            if not regressed:
                break
            for p in regressed:
                state[p] = IDENTITY_DEFORM.copy()
                zbs[p] = zb_identity[p]

    out = {}
    for p in parts:
        iou = _visible_iou_from_zb(zbs[p], rest_zb(p), _gt_plane(p))
        out[p] = {
            "deform": {
                "scale_y": float(state[p][0]),
                "shift_y": float(state[p][1]),
                "scale_xz": float(state[p][2]),
                "shift_xz": float(state[p][3]),
            },
            "iou": iou,
        }
    return out
