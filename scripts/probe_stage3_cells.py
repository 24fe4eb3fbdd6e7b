"""Headroom probe for the remaining golden-res stage-3 quality cells.

For each (monument, part) with a gap vs the human goldens (TM/BkM chhatris,
IuD windows), re-search JUST that part at golden resolution with the other
parts frozen at their saved deforms, comparing the production separable
schedule against the full 4-D coarse grid (``mode='full'``) — does the
separable search miss a joint (scale_y, scale_xz) optimum?

Usage: python scripts/probe_stage3_cells.py [Taj:chhatris ...]
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

from pbr3d import config
from pbr3d.deform.search import refine_parts
from pbr3d.io.artifacts import load_camera_json, load_voxel_grid_labels
from pbr3d.io.masks import load_mask_labels
from pbr3d.ops.point_table import build_point_table

OUT = "/root/repo/results_temp_golden"
DATA = "/root/reference/data"

CELLS = [c.split(":") for c in (sys.argv[1:] or
         ["Taj:chhatris", "Bibi:chhatris", "Itimad:windows"])]

by_mon = {}
for mon, part in CELLS:
    by_mon.setdefault(mon, []).append(part)

for mon, parts in by_mon.items():
    grid = load_voxel_grid_labels(
        os.path.join(OUT, "1.Orthographic_Voxel_Carving", f"{mon}_voxel_grid.npz"))
    cam = load_camera_json(
        os.path.join(OUT, "2.Perspective_Camera_Estimation",
                     f"{mon}_camera_params_final.json"), "front")
    with open(os.path.join(OUT, "3.Part-wise_3D_Refinement",
                           f"{mon}_deform_params.json")) as fh:
        saved = json.load(fh)
    pad = config.STAGE3_PAD.get(mon, 0)
    # max_dim follows the UNPADDED grid (run_stage3 computes it before
    # padding; the previous max(padded)-pad form was wrong whenever the
    # padded axis is not the max axis, loading the mask at 448 instead of
    # 512 and scoring garbage IoUs)
    max_dim = int(np.max(grid.shape))
    if pad:
        grid = np.pad(grid, ((0, 0), (0, pad), (0, 0)))
    mask = load_mask_labels(DATA, mon, "front", max_dim)
    table = build_point_table(grid)
    for part in parts:
        overrides = {p: d["deform"] for p, d in saved.items() if p != part}
        print(f"== {mon}/{part}: saved iou={saved[part]['iou']:.4f} "
              f"deform={saved[part]['deform']}", flush=True)
        for mode in ("separable", "full"):
            t0 = time.perf_counter()
            out = refine_parts(
                grid, mask, cam, overrides=overrides, table=table,
                mode=mode, search_stride=8,
            )
            d = out[part]
            print(f"   mode={mode:9s} iou={d['iou']:.4f} "
                  f"deform={d['deform']}  ({time.perf_counter()-t0:.1f}s)",
                  flush=True)
