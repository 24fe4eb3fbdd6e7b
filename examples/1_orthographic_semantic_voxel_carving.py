#!/usr/bin/env python
"""Stage 1 — orthographic semantic voxel carving.

Script equivalent of the reference's notebook
``1.Orthographic_semantic_voxel_carving.ipynb``: load + prepare the front
mask, globally carve, part-wise refine, save the npz artifact, and render a
mesh preview.
"""

import argparse
from pathlib import Path

import numpy as np

from pbr3d import config
from pbr3d.carving.stage1 import carve_monument
from pbr3d.carving.voxel import meshify_colored_voxel_grid
from pbr3d.io.artifacts import save_voxel_grid
from pbr3d.io.masks import prepare_masks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--monument", default="Taj", choices=config.MONUMENTS)
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--max-dim", type=int, default=256,
                    help="mask resize cap (goldens used 512; 128 for Akbar)")
    ap.add_argument("--out", default="results_temp")
    ap.add_argument("--mesh-preview", action="store_true")
    args = ap.parse_args()

    masks = prepare_masks(args.data_root, args.monument, "front", args.max_dim)
    print(f"masks: semantic {masks.semantic.shape}, binary {masks.binary.shape}")

    grid = np.asarray(carve_monument(masks))
    print(f"carved grid: {grid.shape}, occupied voxels: {(grid > 0).sum():,}")

    out = Path(args.out) / "1.Orthographic_Voxel_Carving" / f"{args.monument}_voxel_grid.npz"
    save_voxel_grid(out, grid)
    print(f"saved {out}")

    if args.mesh_preview:
        verts, faces, colors, _ = meshify_colored_voxel_grid(grid, stride=4)
        from pbr3d.utils.viz import visualize_mesh_matplotlib

        fig = visualize_mesh_matplotlib(verts, faces, colors, args.monument)
        fig.savefig(out.with_suffix(".preview.png"), dpi=120)
        print(f"mesh preview: {out.with_suffix('.preview.png')}")


if __name__ == "__main__":
    main()
