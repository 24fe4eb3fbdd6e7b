"""Iso-surface extraction: classic marching cubes + marching tetrahedra.

Replaces ``skimage.measure.marching_cubes`` (used by the reference at
utils/voxel_utils.py:69-72 and utils/eval_helpers.py:191-195; skimage is not
available in this environment).  ``marching_cubes`` below is the production
extractor (cube-edge vertex topology matching skimage's, so surface
statistics are computed over comparable tessellations); its 256-case table
is GENERATED at import time from first principles rather than transcribed.
``marching_tetrahedra`` is kept as a second, independently-derived extractor
(finer tessellation; used to cross-validate the cube table in tests): every
cube splits into 6 tetrahedra around the main diagonal, each tet contributes
0-2 triangles whose vertices are linear interpolations along tet edges.

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

            # all 6 edge intersection points (T, 6, 3).  Orient each edge
            # canonically (lexicographic corner position) so cells sharing a
            # cube edge compute the cut with identical float rounding and the
            # weld below always fuses it (see _MC_EDGES note).
            ga, gb = tet[_EDGES[:, 0]], tet[_EDGES[:, 1]]
            swap = np.array(
                [tuple(_CORNERS[x]) > tuple(_CORNERS[y]) for x, y in zip(ga, gb)]
            )
            a = np.where(swap, _EDGES[:, 1], _EDGES[:, 0])
            b = np.where(swap, _EDGES[:, 0], _EDGES[:, 1])
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


# ---------------------------------------------------------------------------
# Classic marching cubes (Lorensen-style cell topology)
# ---------------------------------------------------------------------------
#
# The reference extracts surfaces with ``skimage.measure.marching_cubes``
# (utils/voxel_utils.py:69-72, utils/eval_helpers.py:191-195): vertices on
# CUBE edges only.  Marching tetrahedra above also cuts cube/face diagonals,
# which systematically shifts surface statistics (normal spread, roughness,
# curvature) used by the notebook-5 metrics.  This implementation restores
# cube-edge-only topology.
#
# Instead of transcribing the classic 256x16 triangle table, the table is
# GENERATED at import time by first principles: for each of the 256 corner
# sign patterns, walk the iso-contour loops over the 6 cube faces.  On a face
# the contour connects its cut edges; the ambiguous 4-cut face is resolved
# with the asymptotic decider (bilinear face-center test, ties = outside),
# which depends only on the shared face's corners — adjacent cells therefore
# agree edge-for-edge and the global mesh is watertight by construction.

# Cube corners in (d0, d1, d2) offsets, classic MC numbering.
_MC_CORNERS = np.array(
    [
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ],
    np.int64,
)

# The 12 cube edges as corner pairs, classic MC numbering.  Each pair is
# CANONICALLY ORIENTED low-corner -> high-corner (lexicographic grid
# position): the interpolation t = (level-va)/(vb-va) then evaluates with
# bit-identical float rounding in BOTH cells sharing the edge, so welding
# always fuses the shared cut vertex (the reversed-direction computation can
# differ by ~1e-4 in float32 and used to leave pinhole boundary edges).
_MC_EDGES = np.array(
    [
        [0, 1], [1, 2], [3, 2], [0, 3],
        [4, 5], [5, 6], [7, 6], [4, 7],
        [0, 4], [1, 5], [2, 6], [3, 7],
    ],
    np.int64,
)

# The 6 faces as corner quads in cyclic order.
_MC_FACES = np.array(
    [
        [0, 1, 2, 3], [4, 5, 6, 7],
        [0, 1, 5, 4], [2, 3, 7, 6],
        [1, 2, 6, 5], [3, 0, 4, 7],
    ],
    np.int64,
)

_EDGE_OF_PAIR = {}
for _ei, (_a, _b) in enumerate(_MC_EDGES):
    _EDGE_OF_PAIR[(int(_a), int(_b))] = _ei
    _EDGE_OF_PAIR[(int(_b), int(_a))] = _ei


def _face_pairings(face, inside):
    """Pair the cut edges of one face along the iso-contour.

    Returns a list of (edge_i, edge_j) connections.  The 2-cut face has one
    connection; the ambiguous 4-cut face (diagonal corners inside) is split
    with the asymptotic decider: face-center value = mean of the 4 corners;
    for binary fields at level .5 the tie is resolved as OUTSIDE, i.e. the
    inside corners stay SEPARATED.  Each cut edge then connects to the cut
    edge sharing its INSIDE corner.
    """
    quad = [int(c) for c in face]
    cut = []
    for k in range(4):
        a, b = quad[k], quad[(k + 1) % 4]
        if inside[a] != inside[b]:
            cut.append((k, _EDGE_OF_PAIR[(a, b)]))
    if not cut:
        return []
    if len(cut) == 2:
        return [(cut[0][1], cut[1][1])]
    # 4 cuts: every corner alternates in/out around the quad.  Separated
    # inside corners => each cut edge pairs with the other cut edge incident
    # to the same inside corner.
    out = []
    for k in range(4):
        if inside[quad[k]]:
            e_prev = _EDGE_OF_PAIR[(quad[(k - 1) % 4], quad[k])]
            e_next = _EDGE_OF_PAIR[(quad[k], quad[(k + 1) % 4])]
            out.append((e_prev, e_next))
    return out


def _build_mc_table():
    """(256, _MC_MAXT, 3) int64 edge-index triangles (-1 padded)."""
    table = []
    maxt = 0
    for code in range(256):
        inside = [(code >> v) & 1 == 1 for v in range(8)]
        # adjacency over cut edges: each cut edge lies on exactly 2 faces
        adj = {}
        for face in _MC_FACES:
            for ei, ej in _face_pairings(face, inside):
                adj.setdefault(ei, []).append(ej)
                adj.setdefault(ej, []).append(ei)
        tris = []
        seen = set()
        for start in sorted(adj):
            if start in seen:
                continue
            # walk the closed loop
            loop = [start]
            seen.add(start)
            prev, cur = None, start
            while True:
                nxts = [e for e in adj[cur] if e != prev]
                # a vertex has exactly two neighbors; avoid immediate backtrack
                nxt = nxts[0] if nxts else adj[cur][0]
                if nxt == start:
                    break
                loop.append(nxt)
                seen.add(nxt)
                prev, cur = cur, nxt
            # fan-triangulate the loop (loops are planar-ish and convex
            # enough in a unit cell; winding fixed numerically afterwards)
            for k in range(1, len(loop) - 1):
                tris.append((loop[0], loop[k], loop[k + 1]))
        maxt = max(maxt, len(tris))
        table.append(tris)
    out = -np.ones((256, maxt, 3), np.int64)
    for code, tris in enumerate(table):
        for k, t in enumerate(tris):
            out[code, k] = t
    return out


_MC_TABLE = _build_mc_table()
_MC_MAXT = _MC_TABLE.shape[1]


def marching_cubes(
    grid: np.ndarray, level: float = 0.5, slab: int = 64
) -> Tuple[np.ndarray, np.ndarray]:
    """Classic marching cubes (cube-edge vertices only, watertight).

    Same contract as :func:`marching_tetrahedra` and
    ``skimage.measure.marching_cubes``: vertices (N, 3) float32 in (d0, d1,
    d2) index space, faces (M, 3) int32.  Triangle winding is oriented
    against the cell-mean field gradient (outward for occupancy grids).
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
        cx, cy, cz = np.meshgrid(
            np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
        )
        origins = np.stack([cx, cy, cz], -1).reshape(-1, 3)
        vals = np.stack(
            [sub[o[0] + cx, o[1] + cy, o[2] + cz].ravel() for o in _MC_CORNERS], -1
        )
        inside8 = vals > level
        code = np.zeros(len(vals), np.int64)
        for v in range(8):
            code |= inside8[:, v].astype(np.int64) << v
        active = (code != 0) & (code != 255)
        if not active.any():
            continue
        origins, vals, code = origins[active], vals[active], code[active]

        corner_pos = (_MC_CORNERS[None] + origins[:, None, :]).astype(np.float32)
        a, b = _MC_EDGES[:, 0], _MC_EDGES[:, 1]
        va, vb = vals[:, a], vals[:, b]
        denom = vb - va
        t = np.where(
            np.abs(denom) > 1e-12,
            (level - va) / np.where(denom == 0, 1, denom),
            0.5,
        )
        t = np.clip(t, 0.0, 1.0)
        pts = corner_pos[:, a] + t[..., None] * (corner_pos[:, b] - corner_pos[:, a])

        # cell-mean gradient for winding (central differences of corners)
        g = np.stack(
            [
                (vals[:, [1, 2, 5, 6]].sum(1) - vals[:, [0, 3, 4, 7]].sum(1)),
                (vals[:, [2, 3, 6, 7]].sum(1) - vals[:, [0, 1, 4, 5]].sum(1)),
                (vals[:, [4, 5, 6, 7]].sum(1) - vals[:, [0, 1, 2, 3]].sum(1)),
            ],
            -1,
        ).astype(np.float64)

        tris_e = _MC_TABLE[code]  # (C, MAXT, 3)
        for k in range(_MC_MAXT):
            te = tris_e[:, k]
            have = te[:, 0] >= 0
            if not have.any():
                continue
            p = pts[have][np.arange(have.sum())[:, None], te[have]]
            n = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
            flip = np.einsum("md,md->m", n, g[have]) > 0
            p[flip] = p[flip][:, ::-1]
            p = p.copy()
            p[:, :, 0] += x0
            all_tris.append(p.reshape(-1, 3))

    if not all_tris:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    flat = np.concatenate(all_tris).astype(np.float32)
    quant = np.round(flat.astype(np.float64) * 1e5).astype(np.int64)
    uniq, inv = np.unique(quant, axis=0, return_inverse=True)
    verts = uniq.astype(np.float64) / 1e5
    faces = inv.reshape(-1, 3).astype(np.int32)
    good = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return verts.astype(np.float32), faces[good]
