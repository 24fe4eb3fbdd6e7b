"""Tiled nearest-neighbor / pairwise-distance kernels.

The reference's point-cloud metrics sit on ``scipy.spatial.cKDTree`` and
``sklearn.NearestNeighbors`` (reference: utils/eval_helpers.py:36-67,114-126,
248-266).  KD-trees are pointer-chasing machines — the TPU-native formulation
is a *tiled brute-force* distance matrix that rides the MXU:

    d²(a, b) = |a|² + |b|² − 2·a·bᵀ

computed chunk-by-chunk over A with a ``lax.map``; each chunk is one
(T, M) matmul + row reduction, so HBM never holds the full N×M matrix.
For the eval workloads here (N, M <= 50k, 3-D points) this is far faster on
TPU than host KD-trees, exact, and fully differentiable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_TILE = 2048


def _pad_rows(x: jnp.ndarray, mult: int, fill: float) -> jnp.ndarray:
    n = x.shape[0]
    pad = (-n) % mult
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])


@functools.partial(jax.jit, static_argnames=("tile",))
def _min_dist2_padded(A: jnp.ndarray, B: jnp.ndarray, b_valid: jnp.ndarray, tile: int):
    """Min squared distance from each row of A to valid rows of B."""
    bb = jnp.sum(B * B, axis=1)
    big = jnp.float32(jnp.inf)
    bb_masked = jnp.where(b_valid, bb, 0.0)
    penalty = jnp.where(b_valid, 0.0, big)

    def chunk_min(a_chunk):
        aa = jnp.sum(a_chunk * a_chunk, axis=1, keepdims=True)
        # HIGHEST: TPU matmuls default to bf16 passes, which collapses small
        # distances (measured on-device: 98% of NN distances off by ~0.25)
        ab = jnp.matmul(a_chunk, B.T, precision=jax.lax.Precision.HIGHEST)
        d2 = aa + bb_masked[None, :] - 2.0 * ab + penalty[None, :]
        return jnp.min(d2, axis=1)

    A_t = A.reshape(-1, tile, A.shape[1])
    return jax.lax.map(chunk_min, A_t).reshape(-1)


#: "auto" uses the fused Pallas kernel on TPU (distance matrix never leaves
#: VMEM) and the XLA map elsewhere; "xla"/"pallas" force a path.
_PALLAS_MODE = None  # resolved lazily from PBR3D_PALLAS
_PALLAS_BROKEN = False  # set on first failure so auto mode fails over once


def _xla_min_dist2(A: np.ndarray, B: np.ndarray, tile: int) -> np.ndarray:
    n = len(A)
    Ap = _pad_rows(jnp.asarray(np.asarray(A, np.float32)), tile, 0.0)
    Bp = _pad_rows(jnp.asarray(np.asarray(B, np.float32)), 8, 0.0)
    bv = jnp.arange(Bp.shape[0]) < len(B)
    return np.asarray(_min_dist2_padded(Ap, Bp, bv, tile))[:n]


_SPOT_CHECK_ROWS = 256


def _pallas_result_ok(d2_p: np.ndarray, A: np.ndarray, B: np.ndarray) -> bool:
    """Sampled verification of a Pallas result against the XLA formulation.

    Cheap insurance on an experimental backend: auto-mode results are
    spot-checked on ``_SPOT_CHECK_ROWS`` random rows (~1/64 of the full XLA
    cost) and discarded on mismatch.  Note its limit: it compares against
    the XLA formulation on the SAME device, so it catches kernel/backend
    faults but not errors common to both paths — the bf16-default-matmul
    bug (distances off by ~0.25 before ``Precision.HIGHEST`` was forced)
    hit both paths identically and was only caught by a host cKDTree
    comparison; tests/test_eval.py pins that against scipy."""
    rng = np.random.RandomState(len(A) ^ len(B))
    idx = rng.choice(len(A), size=min(_SPOT_CHECK_ROWS, len(A)), replace=False)
    d2_x = _xla_min_dist2(np.asarray(A)[idx], B, tile=min(_TILE, _SPOT_CHECK_ROWS))
    return bool(np.abs(np.asarray(d2_p)[idx] - d2_x).max() < 1e-3)


def _pallas_mode() -> str:
    global _PALLAS_MODE
    if _PALLAS_MODE is None:
        import os

        _PALLAS_MODE = os.environ.get("PBR3D_PALLAS", "auto")
    return _PALLAS_MODE


def min_dist(A: np.ndarray, B: np.ndarray, tile: int = _TILE) -> np.ndarray:
    """Exact nearest-neighbor distance from each point of A to B (float32)."""
    A = np.asarray(A, np.float32)
    B = np.asarray(B, np.float32)
    mode = _pallas_mode()
    global _PALLAS_BROKEN
    if mode == "pallas" or (
        mode == "auto" and not _PALLAS_BROKEN
        and jax.devices()[0].platform == "tpu"
    ):
        try:
            from pbr3d.ops.pallas_kernels import min_dist2_pallas

            d2 = np.asarray(min_dist2_pallas(A, B))
            if mode == "auto" and not _pallas_result_ok(d2, A, B):
                raise RuntimeError("pallas result fails sampled XLA check")
            return np.sqrt(np.maximum(d2, 0.0))
        except Exception:
            if mode == "pallas":
                raise
            _PALLAS_BROKEN = True  # auto: fall back to XLA for the process
    return np.sqrt(np.maximum(_xla_min_dist2(A, B, tile), 0.0))


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def _knn_padded(A, B, b_valid, k: int, tile: int):
    bb = jnp.sum(B * B, axis=1)
    bb_masked = jnp.where(b_valid, bb, 0.0)
    penalty = jnp.where(b_valid, 0.0, jnp.float32(jnp.inf))

    def chunk(a_chunk):
        aa = jnp.sum(a_chunk * a_chunk, axis=1, keepdims=True)
        ab = jnp.matmul(a_chunk, B.T, precision=jax.lax.Precision.HIGHEST)
        d2 = aa + bb_masked[None, :] - 2.0 * ab + penalty[None, :]
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    A_t = A.reshape(-1, tile, A.shape[1])
    d2s, idxs = jax.lax.map(chunk, A_t)
    return d2s.reshape(-1, k), idxs.reshape(-1, k)


def knn(A: np.ndarray, B: np.ndarray, k: int, tile: int = _TILE):
    """k nearest neighbors in B for each point of A.

    Returns (distances (N, k) float32 ascending, indices (N, k) int32).
    """
    A = np.asarray(A, np.float32)
    B = np.asarray(B, np.float32)
    n = len(A)
    Ap = _pad_rows(jnp.asarray(A), tile, 0.0)
    Bp = _pad_rows(jnp.asarray(B), 8, 0.0)
    bv = jnp.arange(Bp.shape[0]) < len(B)
    d2, idx = _knn_padded(Ap, Bp, bv, k, tile)
    d2 = np.asarray(d2)[:n]
    idx = np.asarray(idx)[:n]
    # When k exceeds the valid point count the trailing columns are
    # inf-distance ties pointing at padding rows; redirect their indices to
    # the nearest valid neighbor (distance stays inf so callers can detect).
    invalid = ~np.isfinite(d2)
    if invalid.any():
        idx = np.where(invalid, idx[:, :1], idx)
    return np.sqrt(np.maximum(d2, 0.0)), idx


def self_nn_dist(P: np.ndarray, tile: int = _TILE) -> np.ndarray:
    """Distance of each point to its nearest OTHER point (k=2 self-query)."""
    d, _ = knn(P, P, k=2, tile=tile)
    return d[:, 1]
