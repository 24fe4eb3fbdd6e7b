"""Fine-grained stage-2/3 profile of one @256 pass (round-3 planning).

Runs the same work as bench.py's run_all but with per-phase timers inside
stages 2 and 3 so the batching work targets the real costs.  Run from
/root/repo:  python scripts/profile_r3.py  [monument ...]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

from pbr3d import config
from pbr3d.camera.align import refine_camera_mask_iou
from pbr3d.camera.estimate import (
    auto_compute_initial_params_matching_bbox,
    optimize_camera_with_keypoints,
)
from pbr3d.camera.keypoints import extract_minaret_kps_for_view
from pbr3d.carving.fused import carve_monuments_batched
from pbr3d.deform.search import refine_parts, pad_points_i16
from pbr3d.deform.warp import build_deformed_grid
from pbr3d.carving.voxel import PointCache, bucket_size
from pbr3d.io.masks import load_mask_labels, prepare_masks
from pbr3d.pipeline import ALIGN_PARTS
from pbr3d.utils.profiling import StageTimer

DATA = "/root/reference/data"


def main(monuments):
    T = StageTimer()
    with T.stage("s1:masks"):
        sets = {m: prepare_masks(DATA, m, "front", 256) for m in monuments}
    with T.stage("s1:carve"):
        grids = carve_monuments_batched(sets)

    cams = {}
    for m in monuments:
        grid = grids[m]
        max_dim = int(np.max(grid.shape))
        with T.stage(f"s2:{m}:masks"):
            views = {
                "front": load_mask_labels(DATA, m, "front", max_dim),
                "drone": load_mask_labels(DATA, m, "drone"),
            }
        finals = {}
        for view, mask in views.items():
            try:
                with T.stage(f"s2:{m}:{view}:kps"):
                    vox_kps, img_kps = extract_minaret_kps_for_view(grid, mask)
                    init = auto_compute_initial_params_matching_bbox(
                        grid, mask, list(ALIGN_PARTS)
                    )
            except ValueError as e:
                print(f"skip {m}/{view}: {e}", file=sys.stderr)
                continue
            with T.stage(f"s2:{m}:{view}:lm"):
                kp = optimize_camera_with_keypoints(
                    vox_kps, img_kps, mask.shape[:2], init
                )
            with T.stage(f"s2:{m}:{view}:search"):
                finals[view], iou = refine_camera_mask_iou(
                    grid, mask, list(ALIGN_PARTS), kp,
                    generations=12, population=192, seed=0,
                )
        cams[m] = finals

    for m in monuments:
        grid = grids[m]
        cam = cams[m].get("front") or next(iter(cams[m].values()))
        max_dim = int(np.max(grid.shape))
        pad = config.STAGE3_PAD.get(m, 0)
        g = np.pad(grid, ((0, 0), (0, pad), (0, 0))) if pad else grid
        with T.stage(f"s3:{m}:mask"):
            mask = load_mask_labels(DATA, m, "front", max_dim)
        with T.stage(f"s3:{m}:cache"):
            cache = PointCache(g)
        with T.stage(f"s3:{m}:search"):
            deforms = refine_parts(
                g, mask, cam, None, cache=cache, search_stride=8
            )
        with T.stage(f"s3:{m}:rebuild"):
            part_points = {}
            for part in deforms:
                pts, _ = cache.points_by_parts([part])
                p, v = pad_points_i16(pts, bucket_size(len(pts)))
                part_points[part] = (p, v)
            deform_vecs = {
                p: np.array(
                    [d["deform"]["scale_y"], d["deform"]["shift_y"],
                     d["deform"]["scale_xz"], d["deform"]["shift_xz"]],
                    np.float32)
                for p, d in deforms.items()
            }
            build_deformed_grid(g, part_points, deform_vecs, mask.shape[:2])

    print(T.report())
    s2 = sum(v for k, v in T.times.items() if k.startswith("s2:"))
    s3 = sum(v for k, v in T.times.items() if k.startswith("s3:"))
    s1 = sum(v for k, v in T.times.items() if k.startswith("s1:"))
    print(f"TOTALS s1={s1:.1f} s2={s2:.1f} s3={s3:.1f}")


if __name__ == "__main__":
    ms = sys.argv[1:] or list(config.MONUMENTS)
    t0 = time.perf_counter()
    main(ms)
    print(f"wall={time.perf_counter() - t0:.1f}s")
