"""Akbar/drone basin probe (round-5 verdict #7).

Our weakest stage-2 view: 0.2963 on the reference's aligner objective, with
no usable golden comparator (the golden save scores ~0 at every
resolution).  This probe maps the basin structure: bbox-matched inits are
rebuilt along a grid of viewing directions (azimuth x elevation x
distance), each refined with the production search, to find whether a
better basin exists or 0.30 is the grid/mask ceiling.

Run from /root/repo:  python scripts/probe_akbar_drone.py [quick]
Writes /tmp/akbar_drone_basins.json and prints a ranked table.
"""
import json
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

from pbr3d.camera.align import evaluate_camera_iou, refine_camera_mask_iou
from pbr3d.camera.estimate import auto_compute_initial_params_matching_bbox
from pbr3d.carving.voxel import points_by_parts
from pbr3d.io.artifacts import load_voxel_grid_labels
from pbr3d.io.masks import load_mask_labels
from pbr3d.pipeline import ALIGN_PARTS

OURS = "/root/repo/results_temp_golden"
DATA = "/root/reference/data"


def main():
    quick = "quick" in sys.argv[1:]
    grid = load_voxel_grid_labels(os.path.join(
        OURS, "1.Orthographic_Voxel_Carving", "Akbar_voxel_grid.npz"))
    mask = load_mask_labels(DATA, "Akbar", "drone")
    parts = list(ALIGN_PARTS)
    base = auto_compute_initial_params_matching_bbox(grid, mask, parts)
    pts, _ = points_by_parts(grid, parts)
    center = (pts.min(axis=0) + pts.max(axis=0)) / 2.0
    size = float(np.linalg.norm(pts.max(axis=0) - pts.min(axis=0)))

    azimuths = (0, 90, 180, 270) if quick else (0, 45, 90, 135, 180, 225, 270, 315)
    elevs = (0.3, 0.8) if quick else (0.15, 0.3, 0.6, 1.0)
    dists = (2.0, 4.0) if quick else (1.5, 2.5, 4.0)
    rows = []
    for az in azimuths:
        for el in elevs:
            for ds in dists:
                a = np.deg2rad(az)
                d = np.array([np.cos(a), 0.0, np.sin(a)])
                d = d + np.array([0.0, el, 0.0])
                d /= np.linalg.norm(d)
                cam0 = dict(base)
                cam0["cam_pos"] = (center + ds * size * d).astype(np.float64)
                cam0["target"] = np.asarray(center, np.float64)
                t0 = time.perf_counter()
                p, iou = refine_camera_mask_iou(
                    grid, mask, parts, cam0,
                    generations=8 if quick else 12,
                    population=128 if quick else 192,
                    seed=7, step_scale=2.0,
                )
                rows.append(dict(az=az, elev=el, dist=ds, iou=float(iou),
                                 t=round(time.perf_counter() - t0, 1),
                                 cam=dict(cam_pos=list(map(float, p["cam_pos"])),
                                          target=list(map(float, p["target"])),
                                          f=float(p["f"]), cx=float(p["cx"]),
                                          cy=float(p["cy"]))))
                print(f"az={az:3d} elev={el:.2f} dist={ds:.1f}: "
                      f"{iou:.4f} ({rows[-1]['t']}s)", flush=True)
    rows.sort(key=lambda r: -r["iou"])
    best = rows[0]
    print("\nbest basin:", {k: best[k] for k in ("az", "elev", "dist", "iou")})
    # polish the winner with the production fine-polish schedule
    p, iou = refine_camera_mask_iou(
        grid, mask, parts, best["cam"], generations=12, population=192,
        seed=11, step_scale=0.25,
    )
    print("polished:", float(iou))
    ref = evaluate_camera_iou(grid, mask, parts, p)
    print("aligner objective of polished winner:", float(ref))
    best["polished_iou"] = float(iou)
    json.dump(rows, open("/tmp/akbar_drone_basins.json", "w"), indent=1)
    print("written /tmp/akbar_drone_basins.json")


if __name__ == "__main__":
    main()
