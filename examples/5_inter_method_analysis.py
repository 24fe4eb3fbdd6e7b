#!/usr/bin/env python
"""Notebook 5 — inter-method comparison vs SfM/MVS and CAD references.

Builds the comparison clouds (symmetric completion + ICP; inputs missing
from the snapshot are skipped) and prints the pairwise metric table:
chamfer, F-score@τ, voxel IoU, NN regularity, PCA similarity.
"""

import argparse
import itertools

import numpy as np
import pandas as pd
from tabulate import tabulate

from pbr3d.eval.inter import (
    chamfer_distance,
    compute_nn_stats,
    fscore_with_threshold,
    normalize_preserve_aspect,
    pca_shape_similarity,
    voxel_iou,
)
from pbr3d.eval.preprocess import build_taj_clouds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="results/4.Inter-method_3D")
    ap.add_argument("--tau", type=float, default=0.03)
    args = ap.parse_args()

    clouds = {k: normalize_preserve_aspect(v)
              for k, v in build_taj_clouds(args.root).items()}
    print("clouds:", {k: len(v) for k, v in clouds.items()})

    rows = []
    for a, b in itertools.combinations(clouds, 2):
        f1, prec, rec = fscore_with_threshold(clouds[a], clouds[b], tau=args.tau)
        rows.append({
            "pair": f"{a} vs {b}",
            "chamfer²": chamfer_distance(clouds[a], clouds[b]),
            f"F1@{args.tau}": f1,
            "voxel IoU@96": voxel_iou(clouds[a], clouds[b]),
            "PCA sim": pca_shape_similarity(clouds[a], clouds[b]),
        })
    print(tabulate(pd.DataFrame(rows), headers="keys", tablefmt="grid", showindex=False))

    reg = {k: compute_nn_stats(v) for k, v in clouds.items()}
    print(tabulate(pd.DataFrame(reg).T, headers="keys", tablefmt="grid", showindex=True))


if __name__ == "__main__":
    main()
