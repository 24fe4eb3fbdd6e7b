"""Replay stage 2 alone from the saved @256 stage-1 artifacts, profiled.

Isolates the stage-2 search chain (main -> fine polish -> retry triage ->
retry polish) for perf work: per-group timings come from the PBR3D_PROFILE
instrumentation in pbr3d.camera.align.refine_cameras_batched.

Run from /root/repo:  PBR3D_PROFILE=1 python scripts/probe_stage2.py
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
from pbr3d.io.artifacts import load_voxel_grid_labels
from pbr3d.pipeline import _stage2_all_batched

DATA = "/root/reference/data"
ART = "/root/repo/results_temp/1.Orthographic_Voxel_Carving"


def main():
    monuments = list(config.MONUMENTS)
    grids = {
        m: load_voxel_grid_labels(os.path.join(ART, f"{m}_voxel_grid.npz"))
        for m in monuments
    }
    t0 = time.perf_counter()
    cams = _stage2_all_batched(
        monuments, grids, DATA, None,
        generations=12, population=192, seed=0,
    )
    print(f"[probe] stage2 total: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    for m in monuments:
        for view, p in cams[m]["final"].items():
            print(f"[probe] {m}/{view}: f={p['f']:.1f}")


if __name__ == "__main__":
    main()
