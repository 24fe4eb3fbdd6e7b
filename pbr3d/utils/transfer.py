"""Device->host transfer helpers for the axon remote-TPU backend.

The tunneled backend downloads rank>=2 arrays pathologically slowly —
measured on identical 16.7 MB payloads: rank-3 uint8 copies at ~0.2-0.8 MB/s
(21-80 s!) while the SAME bytes reshaped to rank 1 on device move at
~22 MB/s (0.8 s).  Uploads are unaffected (~50 MB/s at any rank).  Every
bulk download therefore goes through a flat staging reshape on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _flat(x):
    return x.reshape(-1)


def fast_get(x) -> np.ndarray:
    """Download a device array via a flat 1D staging buffer.

    No-op passthrough for host arrays; identical semantics to
    ``np.asarray(x)`` otherwise (row-major flatten + host reshape).
    The staging reshape compiles one tiny executable per (shape, dtype) —
    grid shapes are bounded per monument/resolution, so the set is small
    and persistently cached.
    """
    if isinstance(x, np.ndarray):
        return x
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if x.ndim <= 1:
        return np.asarray(x)
    return np.asarray(_flat(x)).reshape(x.shape)


def fast_get_async(x):
    """Start the staged download of ``x`` without blocking; returns a
    zero-arg resolver producing the host ndarray.

    All pending transfers pipeline behind each other on the tunnel, so a
    caller that prefetches scenes 1..N and then resolves them in order
    overlaps each scene's host-side work with the NEXT scenes' downloads
    (the host work here — scipy labeling, recolor CC — is seconds per
    scene on this 1-core box, comparable to the transfer cost)."""
    if isinstance(x, np.ndarray) or not isinstance(x, jax.Array):
        return lambda: fast_get(x)
    flat = _flat(x) if x.ndim > 1 else x
    try:
        flat.copy_to_host_async()
    except Exception:
        pass  # backend without async copies: resolver just blocks
    shape = x.shape
    return lambda: np.asarray(flat).reshape(shape)
