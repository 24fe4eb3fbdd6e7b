"""Iso-surface extraction: vectorized marching tetrahedra.

Replaces ``skimage.measure.marching_cubes`` (used by the reference at
utils/voxel_utils.py:69-72 and utils/eval_helpers.py:191-195; skimage is not
available in this environment).  Marching *tetrahedra* is chosen over classic
marching cubes because its 16-case table is derivable from first principles
(no 256/4096-entry lookup tables to transcribe), it is watertight and
ambiguity-free, and it vectorizes cleanly: every cube splits into 6
tetrahedra around the main diagonal, each tet contributes 0-2 triangles whose
vertices are linear interpolations along tet edges at the iso level.

Winding is made globally consistent by orienting every triangle against the
field gradient (exact per tet, since the field is linear inside a tet):
normals point toward decreasing field values, i.e. outward for
occupancy/density grids.

Output matches the marching-cubes contract: vertices in (d0, d1, d2) grid
index space, faces as (M, 3) int32.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# Cube corner offsets (d0, d1, d2).
_CORNERS = np.array(
    [
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ],
    np.int64,
)

# Six tetrahedra sharing the main diagonal corner0-corner6.
_TETS = np.array(
    [
        [0, 1, 2, 6], [0, 2, 3, 6], [0, 3, 7, 6],
        [0, 7, 4, 6], [0, 4, 5, 6], [0, 5, 1, 6],
    ],
    np.int64,
)

# Tet edges as (corner a, corner b) local indices.
_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int64)

# For each of the 16 inside-bit cases: up to 2 triangles as edge-index
# triples (-1 padded).  Derived: one-vertex cases cut the 3 edges incident to
# that vertex; two-vertex cases cut the 4 edges crossing the in/out partition
# (a quad, split into 2 triangles).  Winding is fixed afterwards via the
# field gradient, so only the edge *sets* matter here.
_CASES = -np.ones((16, 2, 3), np.int64)
_INCIDENT = {0: [0, 1, 2], 1: [0, 3, 4], 2: [1, 3, 5], 3: [2, 4, 5]}
for v in range(4):
    tri = _INCIDENT[v]
    _CASES[1 << v, 0] = tri
    _CASES[15 ^ (1 << v), 0] = tri
_QUADS = {
    0b0011: [1, 2, 3, 4],  # v0,v1 in: edges 02,03,12,13
    0b0101: [0, 2, 3, 5],  # v0,v2 in: edges 01,03,12,23
    0b1001: [0, 1, 4, 5],  # v0,v3 in: edges 01,02,13,23
}
for code, (a, b, c, d) in _QUADS.items():
    # quad a-b-d-c (a,b share one endpoint side): split (a,b,c) + (b,d,c)
    _CASES[code, 0] = [a, b, c]
    _CASES[code, 1] = [b, d, c]
    _CASES[15 ^ code, 0] = [a, b, c]
    _CASES[15 ^ code, 1] = [b, d, c]


def marching_tetrahedra(
    grid: np.ndarray, level: float = 0.5, slab: int = 64
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface of a 3D scalar grid at ``level``.

    Returns (vertices (N, 3) float32 in index space, faces (M, 3) int32).
    Processes the grid in slabs along dim 0 to bound memory.
    """
    grid = np.asarray(grid, np.float32)
    X, Y, Z = grid.shape
    all_tris = []

    for x0 in range(0, X - 1, slab):
        x1 = min(x0 + slab + 1, X)
        sub = grid[x0:x1]
        nx, ny, nz = sub.shape[0] - 1, Y - 1, Z - 1
        if nx <= 0:
            continue
        # cell origins (C, 3)
        cx, cy, cz = np.meshgrid(
            np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
        )
        origins = np.stack([cx, cy, cz], -1).reshape(-1, 3)
        # corner values (C, 8)
        vals = np.stack(
            [sub[o[0] + cx, o[1] + cy, o[2] + cz].ravel() for o in _CORNERS], -1
        )
        # quick reject: cells fully inside/outside
        inside8 = vals > level
        active = ~(inside8.all(1) | (~inside8).all(1))
        if not active.any():
            continue
        origins = origins[active]
        vals = vals[active]

        for tet in _TETS:
            tv = vals[:, tet]  # (C, 4)
            code = (
                (tv[:, 0] > level).astype(np.int64)
                | ((tv[:, 1] > level).astype(np.int64) << 1)
                | ((tv[:, 2] > level).astype(np.int64) << 2)
                | ((tv[:, 3] > level).astype(np.int64) << 3)
            )
            act = (code != 0) & (code != 15)
            if not act.any():
                continue
            o = origins[act]
            v = tv[act]
            c = code[act]
            corner_pos = (_CORNERS[tet][None] + o[:, None, :]).astype(np.float32)

            # all 6 edge intersection points (T, 6, 3)
            a, b = _EDGES[:, 0], _EDGES[:, 1]
            va, vb = v[:, a], v[:, b]
            denom = vb - va
            t = np.where(np.abs(denom) > 1e-12, (level - va) / np.where(denom == 0, 1, denom), 0.5)
            t = np.clip(t, 0.0, 1.0)
            pts = corner_pos[:, a] + t[..., None] * (corner_pos[:, b] - corner_pos[:, a])

            # constant gradient of the linear field inside each tet
            rel = (_CORNERS[tet[1:]] - _CORNERS[tet[0]]).astype(np.float64)
            Minv = np.linalg.inv(rel)  # (3, 3): rows -> edge deltas
            dv = (v[:, 1:] - v[:, 0:1]).astype(np.float64)  # (T, 3)
            g = dv @ Minv.T  # (T, 3)

            tris_e = _CASES[c]  # (T, 2, 3)
            for k in range(2):
                te = tris_e[:, k]  # (T, 3)
                have = te[:, 0] >= 0
                if not have.any():
                    continue
                p = pts[have][np.arange(have.sum())[:, None], te[have]]  # (M, 3, 3)
                n = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
                flip = np.einsum("md,md->m", n, g[have]) > 0
                p[flip] = p[flip][:, ::-1]
                p = p.copy()
                p[:, :, 0] += x0
                all_tris.append(p.reshape(-1, 3))

    if not all_tris:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    flat = np.concatenate(all_tris).astype(np.float32)
    # weld duplicate vertices
    quant = np.round(flat.astype(np.float64) * 1e5).astype(np.int64)
    uniq, inv = np.unique(quant, axis=0, return_inverse=True)
    verts = uniq.astype(np.float64) / 1e5
    faces = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces
    good = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return verts.astype(np.float32), faces[good]
