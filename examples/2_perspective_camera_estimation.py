#!/usr/bin/env python
"""Stage 2 — perspective camera estimation.

Script equivalent of ``2.Perspective_camera_estimation.ipynb``: for each view
(front, drone) extract minaret anchors, initialize the camera from bounding
boxes, fit by keypoint reprojection, then refine by mask IoU (automated
population search replacing the interactive aligner).  Saves the
{init,kp,final} camera JSONs.
"""

import argparse
from pathlib import Path

from pbr3d import config
from pbr3d.io.artifacts import load_voxel_grid_labels
from pbr3d.pipeline import run_stage2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--monument", default="Bibi", choices=config.MONUMENTS)
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--grids", default="results_temp",
                    help="root holding 1.Orthographic_Voxel_Carving/")
    ap.add_argument("--out", default="results_temp")
    ap.add_argument("--generations", type=int, default=40)
    ap.add_argument("--population", type=int, default=64)
    args = ap.parse_args()

    grid = load_voxel_grid_labels(
        Path(args.grids) / "1.Orthographic_Voxel_Carving" / f"{args.monument}_voxel_grid.npz"
    )
    cameras = run_stage2(
        args.monument, grid, args.data_root, args.out,
        generations=args.generations, population=args.population,
    )
    for tag, views in cameras.items():
        for view, cam in views.items():
            print(f"{tag:>6}/{view}: f={cam['f']:.1f} cam_pos={cam['cam_pos']}")


if __name__ == "__main__":
    main()
