#!/usr/bin/env python
"""A/B: fresh run_stage3 vs the committed stage-3 artifacts, exact nb4 totals.

For each monument, loads the committed stage-1 grid + final front camera from
a results tree, runs the CURRENT stage-3 search, and compares the exact
notebook-4 table total (deform/verify.nb4_exact_cells) of the fresh deformed
grid against the committed deformed artifact's — the regression check for
any stage-3 search change.  Device-agnostic (quality, not perf).

Usage: python scripts/ab_stage3.py [results_tree] [monument ...]
       (default tree results_temp, all 5 monuments)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from pbr3d.deform.verify import nb4_exact_cells  # noqa: E402
from pbr3d.eval.intra import _load_mask_labels_for_grid  # noqa: E402
from pbr3d.io.artifacts import load_camera_json, load_voxel_grid_labels  # noqa: E402
from pbr3d.pipeline import run_stage3  # noqa: E402

DATA = "/root/reference/data"


def cells_total(cells):
    return sum(v for _, v in cells.values())


def main():
    tree = sys.argv[1] if len(sys.argv) > 1 else "results_temp"
    mons = sys.argv[2:] or ["Taj", "Bibi", "Itimad", "Akbar", "Charminar"]
    for m in mons:
        init = load_voxel_grid_labels(
            f"{tree}/1.Orthographic_Voxel_Carving/{m}_voxel_grid.npz")
        cam = load_camera_json(
            f"{tree}/2.Perspective_Camera_Estimation/"
            f"{m}_camera_params_final.json", "front")
        old = load_voxel_grid_labels(
            f"{tree}/3.Part-wise_3D_Refinement/{m}_deformed_voxel_grid.npz")
        mask = _load_mask_labels_for_grid(DATA, m, "front", init.shape)
        t0 = time.time()
        _, new = run_stage3(m, init, cam)
        wall = time.time() - t0

        def padded(g):
            pad = g.shape[1] - init.shape[1]
            return (np.pad(init, ((0, 0), (0, pad), (0, 0)))
                    if pad > 0 else init)

        c_old = nb4_exact_cells(padded(old), old, mask, cam)
        c_new = nb4_exact_cells(padded(new), new, mask, cam)
        t_old, t_new = cells_total(c_old), cells_total(c_new)
        tag = "BETTER" if t_new > t_old + 1e-4 else (
            "equal" if abs(t_new - t_old) <= 1e-4 else "WORSE")
        print(f"[ab] {m}: committed={t_old:.4f} fresh={t_new:.4f} {tag} "
              f"({wall:.0f}s)", flush=True)
        for p in sorted(set(c_old) | set(c_new)):
            o = c_old.get(p, (0, 0))[1]
            n = c_new.get(p, (0, 0))[1]
            if abs(n - o) > 0.005:
                print(f"[ab]   {m}.{p}: {o:.3f} -> {n:.3f}", flush=True)


if __name__ == "__main__":
    main()
