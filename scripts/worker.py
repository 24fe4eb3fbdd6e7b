"""Long-lived TPU experiment worker.

The axon backend recompiles every program once per PROCESS (its persistent
cache does not transfer across processes, CLAUDE.md), so iterating via fresh
`python` invocations pays a 300-900 s compile wave each time.  This worker
stays resident: it watches /tmp/pbr3d_jobs/*.py and execs each job once
in-process, so all jobs share one warm executable cache.  Edited pbr3d
modules can be importlib.reload-ed inside a job; unchanged programs re-trace
but hit the in-process compilation cache.

Usage:  tmux new-session -d -s worker \
            'cd /root/repo && python scripts/worker.py > /tmp/worker.log 2>&1'
Submit: write /tmp/pbr3d_jobs/NN_name.py; result markers are NN_name.py.done
        (first line: ok|err + wall seconds); job output goes to the worker log.
"""
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

JOBS = "/tmp/pbr3d_jobs"
os.makedirs(JOBS, exist_ok=True)
print(f"[worker] ready pid={os.getpid()} devices={jax.devices()}", flush=True)

while True:
    for f in sorted(os.listdir(JOBS)):
        if not f.endswith(".py"):
            continue
        done = os.path.join(JOBS, f + ".done")
        if os.path.exists(done):
            continue
        path = os.path.join(JOBS, f)
        print(f"[worker] ===== running {f} =====", flush=True)
        t0 = time.time()
        try:
            src = open(path).read()
            exec(compile(src, path, "exec"), {"__name__": "__job__"})
            status = "ok"
        except Exception:
            traceback.print_exc()
            status = "err"
        sys.stdout.flush()
        sys.stderr.flush()
        with open(done, "w") as fh:
            fh.write(f"{status} {time.time() - t0:.1f}s\n")
        print(f"[worker] ===== {f}: {status} {time.time() - t0:.1f}s =====",
              flush=True)
    time.sleep(2)
