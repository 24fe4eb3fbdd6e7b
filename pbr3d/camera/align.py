"""Mask-IoU camera refinement — the TPU-native replacement for the
reference's interactive "smart aligner" (utils/camera_estimation.py:479-768).

The reference maximizes mean per-part color-exact IoU between the splat
projection and the selected-parts mask with human-triggered Random Search /
Coordinate Descent / Powell, one 86 ms objective evaluation at a time.  Here
the same objective is evaluated for a whole *population* of candidate cameras
in a single vmapped device program, and the search is an automated
evolution-style loop:

  1. random-search generations with the reference's step sizes
     (cam +-[50,50,100], target +-[50,50,100], f +-50, cx/cy +-20),
     shrinking on stagnation;
  2. batched coordinate-descent polish (all +-delta probes of all 9 DoF in
     one batch, delta annealed from the reference's fixed 20);
  3. optional ``lock_xy_equal`` tying cam x/y to target x/y.

Deterministic given the seed.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pbr3d import config
from pbr3d.camera.geometry import params_to_vector, vector_to_params
from pbr3d.carving.voxel import bucket_size, pad_points, points_by_parts
from pbr3d.ops.projection import partwise_iou, splat_labels


@functools.partial(jax.jit, static_argnames=("H", "W"))
def _batch_iou(cam_vecs, pts, labels, valid, gt_labels, part_ids, true_hw,
               H: int, W: int):
    """(H, W) is the padded plane allocation; ``true_hw`` the real extent —
    only bucketed shapes reach the compiler (compiles are expensive here)."""

    def one(x):
        img = splat_labels(
            pts, labels, valid, x[0:3], x[3:6], x[6], x[7], x[8], H, W, true_hw
        )
        return partwise_iou(img, gt_labels, part_ids)[1]

    return jax.vmap(one)(cam_vecs)


def _pad_plane(mask_labels: np.ndarray):
    H, W = mask_labels.shape[:2]
    Hp, Wp = (-(-x // 128) * 128 for x in (H, W))
    out = np.zeros((Hp, Wp), mask_labels.dtype)
    out[:H, :W] = mask_labels
    return out, (Hp, Wp)


def evaluate_camera_iou(
    grid_labels: np.ndarray,
    mask_labels: np.ndarray,
    parts_for_alignment: Sequence[str],
    cam: Dict,
) -> float:
    """Mean per-part IoU of the splat projection under one camera —
    the reference's ``evaluate`` objective (camera_estimation.py:597-603)."""
    H, W = mask_labels.shape[:2]
    pts, labels = points_by_parts(grid_labels, parts_for_alignment)
    p, l, v = pad_points(pts, labels, bucket_size(len(pts)))
    gt_p, (Hp, Wp) = _pad_plane(mask_labels_selected(mask_labels, parts_for_alignment))
    ious = _batch_iou(
        params_to_vector(cam)[None],
        jnp.asarray(p), jnp.asarray(l), jnp.asarray(v),
        jnp.asarray(gt_p),
        jnp.asarray(config.part_ids(parts_for_alignment)),
        jnp.asarray([H, W], jnp.int32),
        Hp, Wp,
    )
    return float(ious[0])


def mask_labels_selected(mask_labels: np.ndarray, parts: Sequence[str]) -> np.ndarray:
    """Zero out non-selected parts (the aligner compares against the
    selected-parts mask, reference: camera_estimation.py:489)."""
    ids = config.part_ids(parts)
    return np.where(np.isin(mask_labels, ids), mask_labels, 0).astype(np.uint8)


def refine_camera_mask_iou(
    grid_labels: np.ndarray,
    mask_labels: np.ndarray,
    parts_for_alignment: Sequence[str],
    init_params: Dict,
    *,
    generations: int = 40,
    population: int = 64,
    cd_rounds: int = 6,
    seed: int = 0,
    lock_xy_equal: bool = False,
) -> Tuple[Dict, float]:
    """Automated mask-IoU camera refinement.  Returns (params, best IoU).

    The returned params include H/W like the reference's saved "final" tag
    (camera_estimation.py:536-541).
    """
    H, W = mask_labels.shape[:2]
    pts, labels = points_by_parts(grid_labels, parts_for_alignment)
    p, l, v = map(jnp.asarray, pad_points(pts, labels, bucket_size(len(pts))))
    gt_p, (Hp, Wp) = _pad_plane(mask_labels_selected(mask_labels, parts_for_alignment))
    gt = jnp.asarray(gt_p)
    ids = jnp.asarray(config.part_ids(parts_for_alignment))
    true_hw = jnp.asarray([H, W], jnp.int32)

    # Bound per-eval device memory: each candidate materializes a handful of
    # N-length projection intermediates (~25 B/point -> ~1.7 GB at this
    # budget).  Big batches matter: tunnel dispatch latency dominates.
    chunk = max(1, min(population, (1 << 26) // max(1, p.shape[0])))
    chunk = 1 << (chunk.bit_length() - 1)  # pow2 -> few compiled shapes

    def batch_eval(vecs: np.ndarray) -> np.ndarray:
        vecs = np.asarray(vecs, np.float32)
        P = len(vecs)
        pad = (-P) % chunk
        if pad:
            vecs = np.concatenate([vecs, np.repeat(vecs[-1:], pad, axis=0)])
        outs = [
            np.asarray(_batch_iou(
                jnp.asarray(vecs[i : i + chunk]), p, l, v, gt, ids, true_hw, Hp, Wp))
            for i in range(0, len(vecs), chunk)
        ]
        return np.concatenate(outs)[:P]

    def apply_lock(vecs: np.ndarray) -> np.ndarray:
        if lock_xy_equal:
            vecs = vecs.copy()
            vecs[:, 0:2] = vecs[:, 3:5]
        return vecs

    rng = np.random.default_rng(seed)
    steps = np.array([50, 50, 100, 50, 50, 100, 50, 20, 20], np.float64)

    best = np.asarray(params_to_vector(init_params), np.float64)
    best_iou = float(batch_eval(best[None])[0])

    # 1. random-search generations (early-stop once the step sizes have
    # collapsed without improvement — device round trips are expensive here)
    stall = 0
    shrinks = 0
    for _ in range(generations):
        cand = best[None] + rng.uniform(-1, 1, (population, 9)) * steps[None]
        cand = apply_lock(cand)
        ious = batch_eval(cand)
        k = int(np.argmax(ious))
        if ious[k] > best_iou:
            best, best_iou = cand[k].copy(), float(ious[k])
            stall = 0
        else:
            stall += 1
            if stall >= 3:
                steps *= 0.7
                stall = 0
                shrinks += 1
                if shrinks >= 4:
                    break

    # 2. batched coordinate descent, annealed from the reference's ±20
    delta = 20.0
    for _ in range(cd_rounds):
        probes = []
        for i in range(9):
            for s in (-delta, delta):
                c = best.copy()
                c[i] += s
                probes.append(c)
        probes = apply_lock(np.stack(probes))
        ious = batch_eval(probes)
        k = int(np.argmax(ious))
        if ious[k] > best_iou:
            best, best_iou = probes[k].copy(), float(ious[k])
        else:
            delta *= 0.5

    params = vector_to_params(jnp.asarray(best), H=H, W=W)
    out = {
        "cam_pos": np.asarray(params["cam_pos"], np.float64),
        "target": np.asarray(params["target"], np.float64),
        "f": float(params["f"]),
        "cx": float(params["cx"]),
        "cy": float(params["cy"]),
        "H": H,
        "W": W,
    }
    return out, best_iou
