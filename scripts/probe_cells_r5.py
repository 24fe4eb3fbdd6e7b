"""Golden-res residual-cell experiment (round-5 verdict #6).

The five cells still below the goldens at golden resolution are BkM
plinth/minarets/whole and IuD main_door/whole (<=0.013) plus AT whole
(-0.026, init-material like its minaret row).  The deformable candidates
are BkM plinth and IuD main_door (+ whatever their monuments' other parts
trade).  This probe re-runs those monuments' stage 3 from the committed
golden-res stage-1/2 artifacts with a BIGGER automated budget, and prints
the exact notebook-4 cells next to the committed baseline — keep the
winner, or record the measured ceiling.

Variants:
  base  — production defaults (reproduces the committed artifacts)
  wide  — denser coarse slider grid (16x13 vs 11x9) + 3 sweeps with a
          wider resweep window (the "one targeted resweep pass")

Run from /root/repo:  python scripts/probe_cells_r5.py [Bibi Itimad]
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

from pbr3d.deform.verify import _nb4_state
from pbr3d.eval.intra import _load_mask_labels_for_grid
from pbr3d.io.artifacts import load_camera_json, load_voxel_grid_labels
from pbr3d.pipeline import run_stage3

OURS = "/root/repo/results_temp_golden"
DATA = "/root/reference/data"

VARIANTS = {
    "base": {},
    "wide": dict(
        scale_range=(0.5, 2.0, 16), shift_range=(-100.0, 100.0, 13),
        sweeps=3, resweep_window=(2.5, 7),
    ),
}


def cells_of(grid_init, grid_def, mon, cam):
    mask = _load_mask_labels_for_grid(DATA, mon, "front", grid_init.shape)
    cells, *_ = _nb4_state(grid_init, np.asarray(grid_def), mask, cam)
    return {p: round(float(v), 4) for p, (_, v) in cells.items()}


def main():
    monuments = sys.argv[1:] or ["Bibi", "Itimad"]
    out = {}
    for mon in monuments:
        grid = load_voxel_grid_labels(os.path.join(
            OURS, "1.Orthographic_Voxel_Carving", f"{mon}_voxel_grid.npz"))
        cam = load_camera_json(os.path.join(
            OURS, "2.Perspective_Camera_Estimation",
            f"{mon}_camera_params_final.json"), "front")
        committed = load_voxel_grid_labels(os.path.join(
            OURS, "3.Part-wise_3D_Refinement",
            f"{mon}_deformed_voxel_grid.npz"))
        rows = {"committed": cells_of(grid, committed, mon, cam)}
        for tag, kw in VARIANTS.items():
            t0 = time.perf_counter()
            deforms, grid_def = run_stage3(mon, grid, cam, DATA, None, **kw)
            dt = time.perf_counter() - t0
            rows[tag] = cells_of(grid, grid_def, mon, cam)
            rows[tag]["_wall_s"] = round(dt, 1)
            rows[tag]["_deforms"] = {p: d["deform"] for p, d in deforms.items()}
            print(f"[{mon}] {tag}: {dt:.1f}s", flush=True)
        out[mon] = rows
        parts = [p for p in rows["committed"]]
        print(f"\n=== {mon} ===")
        print(f"{'cell':14s} {'committed':>10s} " + " ".join(
            f"{t:>10s}" for t in VARIANTS))
        for p in parts:
            print(f"{p:14s} {rows['committed'][p]:>10.4f} " + " ".join(
                f"{rows[t].get(p, float('nan')):>10.4f}" for t in VARIANTS))
    json.dump(out, open("/tmp/cells_r5.json", "w"), indent=1, default=str)
    print("written /tmp/cells_r5.json")


if __name__ == "__main__":
    main()
