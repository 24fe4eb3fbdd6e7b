"""Regenerate results_temp (@256 artifacts, reference layout) with the
current pipeline.  Run: python scripts/regen_results_temp.py"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from pbr3d import config
from pbr3d.pipeline import run_all

t0 = time.perf_counter()
run_all(config.MONUMENTS, max_dim=256, out_dir="/root/repo/results_temp",
        stage2_kw=dict(generations=12, population=192, seed=0),
        stage3_kw=dict(search_stride=8))
print(f"done in {time.perf_counter()-t0:.1f}s")
