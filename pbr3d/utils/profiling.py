"""Tracing & timing helpers (the reference had only tqdm bars and ad-hoc
time.time deltas; SURVEY §5)."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional

import jax


class StageTimer:
    """Accumulates wall times per named stage (device-synchronized)."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"{k:>12}: {v:8.3f} s" for k, v in self.times.items()]
        lines.append(f"{'total':>12}: {total:8.3f} s")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/pbr3d_trace"):
    """jax.profiler trace around a region (inspect with TensorBoard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def enable_persistent_compilation_cache(path: Optional[str] = None) -> str:
    """Point XLA's persistent compilation cache at ``path`` (amortizes the
    remote-TPU compile cost across processes)."""
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
