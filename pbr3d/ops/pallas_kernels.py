"""Pallas TPU kernels for the hot eval ops.

``min_dist2_pallas`` — the chamfer/F-score engine: for each tile of query
points A it streams tiles of reference points B through VMEM, forms the
squared-distance block ``|a|² + |b|² − 2·a·bᵀ`` on the MXU, and folds the
row-min into the output *inside the kernel* — the (N, M) distance matrix
never exists in HBM (the pure-XLA fallback in pbr3d.ops.neighbors
materializes one (tile, M) strip per step).

Grid layout: (A tiles, B tiles) with B innermost; the output block for an A
tile is revisited across the B sweep and accumulates the running minimum
(standard Pallas revisiting-accumulator pattern).  Padded B rows carry an
+inf penalty so they never win the min.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_A = 512
TILE_B = 1024


def _min_dist2_kernel(a_ref, b_ref, pen_ref, o_ref):
    # o_ref holds the FULL (num_A_tiles, TILE_A) output in VMEM (it is tiny —
    # 4 bytes per query point); program (i, j) folds B-tile j into row i.
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[pl.ds(i, 1), :] = jnp.full((1, TILE_A), jnp.inf, jnp.float32)

    a = a_ref[:]  # (TILE_A, 4)
    b = b_ref[:]  # (TILE_B, 4)
    aa = jnp.sum(a * a, axis=1, keepdims=True)  # (TILE_A, 1)
    bb = jnp.sum(b * b, axis=1) + pen_ref[0, :]  # (TILE_B,)
    # HIGHEST: MXU matmuls default to bf16 passes; small distances collapse
    d2 = aa + bb[None, :] - 2.0 * jnp.dot(
        a, b.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    row_min = jnp.min(d2, axis=1)[None, :]  # (1, TILE_A)
    o_ref[pl.ds(i, 1), :] = jnp.minimum(o_ref[pl.ds(i, 1), :], row_min)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _min_dist2_call(A4, B4, pen, interpret=False):
    nA = A4.shape[0]
    nB = B4.shape[0]
    grid = (nA // TILE_A, nB // TILE_B)
    out = pl.pallas_call(
        _min_dist2_kernel,
        out_shape=jax.ShapeDtypeStruct((nA // TILE_A, TILE_A), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_A, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 4), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_B), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nA // TILE_A, TILE_A), lambda i, j: (0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(A4, B4, pen)
    return out.reshape(-1)


def min_dist2_pallas(A: np.ndarray, B: np.ndarray, interpret: bool | None = None) -> np.ndarray:
    """Min squared distance from each point of A (N,3) to B (M,3), float32.

    ``interpret`` defaults to True off-TPU (tests) and False on TPU.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    A = np.asarray(A, np.float32)
    B = np.asarray(B, np.float32)
    n, m = len(A), len(B)
    padA = (-n) % TILE_A
    padB = (-m) % TILE_B
    A4 = np.zeros((n + padA, 4), np.float32)
    A4[:n, :3] = A
    B4 = np.zeros((m + padB, 4), np.float32)
    B4[:m, :3] = B
    pen = np.zeros((1, m + padB), np.float32)
    pen[0, m:] = np.inf
    d2 = np.asarray(_min_dist2_call(jnp.asarray(A4), jnp.asarray(B4), jnp.asarray(pen),
                                    interpret=bool(interpret)))
    return d2[:n]
