"""Re-run stage 3 at golden resolution for selected monuments, reusing the
existing golden-res stage-1 grids + final cameras in results_temp_golden/.
Usage: python scripts/rerun_stage3_golden.py [Taj Itimad ...]
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax
if os.environ.get("JAX_PLATFORMS") == "cpu":
    # env var alone does not stick on this box (jax is pre-imported pinned
    # to axon by the sitecustomize hook; CLAUDE.md) — set both.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np
from pbr3d.io.artifacts import load_voxel_grid_labels, load_camera_json
from pbr3d.pipeline import run_stage3

OUT = "/root/repo/results_temp_golden"

for mon in (sys.argv[1:] or ["Taj", "Itimad", "Akbar", "Bibi", "Charminar"]):
    t0 = time.perf_counter()
    grid = load_voxel_grid_labels(
        os.path.join(OUT, "1.Orthographic_Voxel_Carving", f"{mon}_voxel_grid.npz"))
    cam = load_camera_json(
        os.path.join(OUT, "2.Perspective_Camera_Estimation",
                     f"{mon}_camera_params_final.json"), "front")
    deforms, _ = run_stage3(mon, grid, cam, "/root/reference/data", out_dir=OUT)
    print(f"{mon}: {time.perf_counter()-t0:.1f}s "
          f"{ {p: round(d['iou'],3) for p,d in deforms.items()} }", flush=True)
