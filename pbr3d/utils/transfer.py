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
