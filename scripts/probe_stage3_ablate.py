"""Ablate the round-3 stage-3 search additions at golden resolution.

Runs run_stage3 (full search + exact nb4 verify) for one monument under
several search configs and prints each config's nb4-exact per-part cells,
to attribute run-to-run quality shifts to a specific mechanism
(joint 4-D pass / exact-eval top-k pruning / conditioning resweeps).

Usage: python scripts/probe_stage3_ablate.py Taj [configA configB ...]
Configs: base (joint=0,topk=0,sweeps=1), joint (sweeps=1), full (defaults).
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

from pbr3d.io.artifacts import load_camera_json, load_voxel_grid_labels
from pbr3d.pipeline import run_stage3

OUT = "/root/repo/results_temp_golden"
DATA = "/root/reference/data"

CONFIGS = {
    "base": dict(joint_steps=0, exact_topk=0, sweeps=1),
    "joint": dict(sweeps=1),
    "full": dict(),
}


def main():
    mon = sys.argv[1]
    names = sys.argv[2:] or list(CONFIGS)
    grid = load_voxel_grid_labels(
        os.path.join(OUT, "1.Orthographic_Voxel_Carving",
                     f"{mon}_voxel_grid.npz"))
    cam = load_camera_json(
        os.path.join(OUT, "2.Perspective_Camera_Estimation",
                     f"{mon}_camera_params_final.json"), "front")
    for name in names:
        t0 = time.perf_counter()
        deforms, _ = run_stage3(mon, grid, cam, DATA, None, **CONFIGS[name])
        dt = time.perf_counter() - t0
        cells = {p: round(d["iou"], 4) for p, d in deforms.items()}
        print(f"[{name}] {mon} {dt:.1f}s {cells}", flush=True)
        if os.environ.get("PBR3D_PROBE_VECS"):
            for p, d in deforms.items():
                print(f"    {p}: {d['deform']}", flush=True)


if __name__ == "__main__":
    main()
