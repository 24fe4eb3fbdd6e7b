"""Cold-start program inventory (round-5 verdict #4).

Runs ONE full @256 `run_all` pass in THIS process with `jax_log_compiles`
on and a per-compile timing hook, against the cache directory given in
JAX_COMPILATION_CACHE_DIR (point it at an EMPTY dir to simulate a
driver-cold process; at .jax_cache to measure the warm floor).  Writes
`/tmp/compile_inventory.json`: per-executable-family count + total compile
seconds + the pass wall, i.e. the measured decomposition of `cold_s`.

Run from /root/repo:
  JAX_COMPILATION_CACHE_DIR=/tmp/cold_cache python scripts/compile_inventory.py
"""
import collections
import json
import logging
import os
import re
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_log_compiles", True)

stats = collections.defaultdict(lambda: [0, 0.0])
_rx = re.compile(r"Finished XLA compilation of jit\(([^)]*)\) in ([0-9.]+) sec")


class _Capture(logging.Handler):
    def emit(self, record):
        m = _rx.search(record.getMessage())
        if m:
            stats[m.group(1)][0] += 1
            stats[m.group(1)][1] += float(m.group(2))


logging.getLogger("jax._src.dispatch").addHandler(_Capture())

from pbr3d import config
from pbr3d.pipeline import run_all

t0 = time.perf_counter()
results = run_all(
    config.MONUMENTS,
    max_dim=256,
    stage2_kw=dict(generations=12, population=192, seed=0),
    stage3_kw=dict(search_stride=8),
)
wall = time.perf_counter() - t0

rows = sorted(
    ({"name": k, "count": v[0], "compile_s": round(v[1], 2)}
     for k, v in stats.items()),
    key=lambda r: -r["compile_s"],
)
out = {
    "cache_dir": os.environ["JAX_COMPILATION_CACHE_DIR"],
    "pass_wall_s": round(wall, 1),
    "n_executables": sum(r["count"] for r in rows),
    "compile_total_s": round(sum(r["compile_s"] for r in rows), 1),
    "families": rows,
}
json.dump(out, open("/tmp/compile_inventory.json", "w"), indent=1)
print(json.dumps({k: out[k] for k in
                  ("pass_wall_s", "n_executables", "compile_total_s")}))
for r in rows[:20]:
    print(f"{r['name']:45s} x{r['count']:<3d} {r['compile_s']:8.1f}s")
print("written /tmp/compile_inventory.json")
