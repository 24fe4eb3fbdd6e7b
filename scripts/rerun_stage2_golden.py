#!/usr/bin/env python
"""Re-run stage 2 at golden resolution (batched driver, deep-polish profile)
reusing the existing golden-res stage-1 grids in results_temp_golden/.

Usage: python scripts/rerun_stage2_golden.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pbr3d.io.artifacts import load_voxel_grid_labels  # noqa: E402
from pbr3d.pipeline import _stage2_all_batched  # noqa: E402

OUT = "/root/repo/results_temp_golden"
MON = ["Taj", "Bibi", "Itimad", "Akbar", "Charminar"]

grids = {
    m: load_voxel_grid_labels(
        os.path.join(OUT, "1.Orthographic_Voxel_Carving",
                     f"{m}_voxel_grid.npz"))
    for m in MON
}
t0 = time.perf_counter()
_stage2_all_batched(
    MON, grids, "/root/reference/data", OUT,
    generations=12, population=192, seed=0, deep_polish=True,
)
print(f"stage2 golden regen done in {time.perf_counter()-t0:.1f}s", flush=True)
