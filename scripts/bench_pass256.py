"""Two timed @256 run_all passes (bench-shaped) for perf iteration.

Usage: python scripts/bench_pass256.py [n_passes]
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
from pbr3d.pipeline import run_all

import json

s3 = dict(search_stride=8)
s3.update(json.loads(os.environ.get("PBR3D_S3_EXTRA", "{}")))
for i in range(int(sys.argv[1]) if len(sys.argv) > 1 else 2):
    t0 = time.perf_counter()
    run_all(config.MONUMENTS, max_dim=256, out_dir=None,
            stage2_kw=dict(generations=12, population=192, seed=0),
            stage3_kw=s3)
    print(f"PASS{i+1}: {time.perf_counter()-t0:.1f}s", flush=True)
