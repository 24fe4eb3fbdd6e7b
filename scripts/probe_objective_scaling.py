"""Measure the stage-2 objective's device cost vs (N points, plane, batch).

Decides the round-3 batching design: if a 5-view vmapped evaluation costs
~the same as one view's, cross-view batching is utilization-bound and wins
~5x; if it costs 5x, the scatter is throughput-bound and the win must come
from fewer points instead.  Run: python scripts/probe_objective_scaling.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pbr3d.camera.align import _batch_iou

rng = np.random.default_rng(0)


def timeit(fn, *a, n=3):
    out = fn(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def make(N, Hp, Wp, P):
    pts = rng.uniform(0, 200, (N, 3)).astype(np.float32)
    labels = rng.integers(4, 6, N).astype(np.uint8)
    valid = np.ones(N, bool)
    gt = rng.integers(0, 6, (Hp, Wp)).astype(np.uint8)
    cams = np.tile(
        np.array([100, 100, -400, 100, 100, 100, 300, Wp / 2, Hp / 2], np.float32),
        (P, 1),
    ) + rng.normal(0, 5, (P, 9)).astype(np.float32)
    return (
        jnp.asarray(cams), jnp.asarray(pts), jnp.asarray(labels),
        jnp.asarray(valid), jnp.asarray(gt),
        jnp.asarray([4, 5], dtype=jnp.int32),
        jnp.asarray([Hp, Wp], jnp.int32),
    )


CASES = [
    ("N=128k plane=256x256 P=64", 131072, 256, 256, 64),
    ("N=32k  plane=256x256 P=64", 32768, 256, 256, 64),
    ("N=128k plane=768x1280 P=64", 131072, 768, 1280, 64),
    ("N=128k plane=256x256 P=320", 131072, 256, 256, 320),
    ("N=32k  plane=256x256 P=320", 32768, 256, 256, 320),
]

for name, N, Hp, Wp, P in CASES:
    args = make(N, Hp, Wp, P)
    t0 = time.perf_counter()
    t = timeit(lambda *a: _batch_iou(*a, Hp, Wp), *args)
    print(
        f"{name}: {t * 1e3:8.1f} ms  ({P / t:7.0f} cand/s; "
        f"compile+warm {time.perf_counter() - t0 - 3 * t:.1f}s)",
        flush=True,
    )
