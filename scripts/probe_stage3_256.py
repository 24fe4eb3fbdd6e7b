"""Replay stage 3 alone from the saved @256 artifacts, profiled.

Isolates the per-part deform search chain for perf/quality work.

Run from /root/repo:  PBR3D_PROFILE=1 python scripts/probe_stage3_256.py [Akbar ...]
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

from pbr3d import config
from pbr3d.io.artifacts import load_camera_json, load_voxel_grid_labels
from pbr3d.pipeline import run_stage3

OUT = "/root/repo/results_temp"
DATA = "/root/reference/data"


def main():
    monuments = sys.argv[1:] or list(config.MONUMENTS)
    for mon in monuments:
        grid = load_voxel_grid_labels(
            os.path.join(OUT, "1.Orthographic_Voxel_Carving",
                         f"{mon}_voxel_grid.npz"))
        cam = load_camera_json(
            os.path.join(OUT, "2.Perspective_Camera_Estimation",
                         f"{mon}_camera_params_final.json"), "front")
        t0 = time.perf_counter()
        deforms, _ = run_stage3(mon, grid, cam, DATA, None)
        dt = time.perf_counter() - t0
        print(f"[probe] {mon} stage3: {dt:.1f}s", file=sys.stderr)
        for p, d in deforms.items():
            print(f"[probe] {mon}/{p}: iou={d['iou']:.4f} deform={d['deform']}")


if __name__ == "__main__":
    main()
