"""Stage-2 objective parity: our automated final cameras vs the human
goldens, scored with the REFERENCE'S OWN aligner objective (mean per-part
color-exact splat IoU of the alignment parts,
utils/camera_estimation.py:597-603,770-788) on the SAME golden-resolution
stage-1 grid.  Writes results_temp_golden/objective_parity.json.

Run from /root/repo: python scripts/objective_parity.py
"""
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

from pbr3d.camera.align import evaluate_camera_iou
from pbr3d.io.artifacts import load_camera_json, load_voxel_grid_labels
from pbr3d.io.masks import load_mask_labels
from pbr3d.pipeline import ALIGN_PARTS

OURS = "/root/repo/results_temp_golden"
GOLD = "/root/reference/results"
DATA = "/root/reference/data"
MON = ["Taj", "Bibi", "Itimad", "Akbar", "Charminar"]

out = {}
for m in MON:
    grid = load_voxel_grid_labels(
        os.path.join(OURS, "1.Orthographic_Voxel_Carving", f"{m}_voxel_grid.npz")
    )
    max_dim = int(np.max(grid.shape))
    for view in ("front", "drone"):
        mask = load_mask_labels(
            DATA, m, view, max_dim if view == "front" else None
        )
        row = {}
        for tag, cam_dir in (("ours", OURS), ("golden", GOLD)):
            try:
                cam = load_camera_json(
                    os.path.join(
                        cam_dir, "2.Perspective_Camera_Estimation",
                        f"{m}_camera_params_final.json",
                    ),
                    view,
                )
            except Exception as e:  # view missing from one side
                print(f"{m}/{view} {tag}: {e}", file=sys.stderr)
                row[tag] = 0.0
                continue
            row[tag] = float(evaluate_camera_iou(grid, mask, list(ALIGN_PARTS), cam))
        out[f"{m}/{view}"] = row
        print(f"{m}/{view}: ours {row['ours']:.4f}  golden {row['golden']:.4f}",
              flush=True)

path = os.path.join(OURS, "objective_parity.json")
json.dump(out, open(path, "w"), indent=1)
print("written", path)
