#!/usr/bin/env python
"""Deeper stage-2 parity probes for the last sub-golden views (VERDICT r4 #3).

Two questions per view:
1. Chained polish: keep improving OUR best camera (seeded random search +
   multi-magnitude CD, several seeds/step scales, each trial starting from the
   running best).  How far does our basin go?
2. Golden-basin shape: polish the GOLDEN camera the same way.  If it
   improves beyond its saved value, the human under-polished and the basin
   ceiling is higher than the golden number; if it cannot be improved, the
   golden is a local max whose value bounds what basin-jumping must reach.

Usage: python scripts/probe_stage2_deep.py [out_json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from pbr3d.camera.align import evaluate_camera_iou, refine_camera_mask_iou  # noqa: E402
from pbr3d.io.artifacts import load_camera_json, load_voxel_grid_labels  # noqa: E402
from pbr3d.io.masks import load_mask_labels  # noqa: E402
from pbr3d.pipeline import ALIGN_PARTS  # noqa: E402

OURS = "/root/repo/results_temp_golden"
GOLD = "/root/reference/results"
DATA = "/root/reference/data"
VIEWS = [("Bibi", "front"), ("Charminar", "drone")]

TRIALS = [
    ("rs24_s05", dict(generations=24, population=256, cd_rounds=12,
                      step_scale=0.5, cd_mags=(1.0, 0.25, 4.0))),
    ("rs24_s0125", dict(generations=24, population=256, cd_rounds=12,
                        step_scale=0.125, cd_mags=(1.0, 0.25, 4.0))),
    ("cd48_fine", dict(generations=0, cd_rounds=48, step_scale=0.0625,
                       cd_mags=(1.0, 0.25, 0.0625, 16.0))),
    ("rs24_seed9", dict(generations=24, population=256, cd_rounds=12,
                        seed=9, step_scale=0.25, cd_mags=(1.0, 0.25, 4.0))),
    ("rs24_seed17", dict(generations=24, population=256, cd_rounds=12,
                         seed=17, step_scale=0.0625,
                         cd_mags=(1.0, 0.25, 4.0))),
]


def chain(grid, mask, cam0, label, out):
    best_cam, best_s = cam0, evaluate_camera_iou(
        grid, mask, list(ALIGN_PARTS), cam0)
    out[label] = {"start": round(float(best_s), 4), "trials": {}}
    for tag, kw in TRIALS:
        t0 = time.time()
        cam2, _ = refine_camera_mask_iou(
            grid, mask, list(ALIGN_PARTS), best_cam, **kw)
        s2 = evaluate_camera_iou(grid, mask, list(ALIGN_PARTS), cam2)
        out[label]["trials"][tag] = round(float(s2), 4)
        print(f"[deep] {label} {tag}: {s2:.4f} ({time.time()-t0:.0f}s)",
              flush=True)
        if s2 > best_s:
            best_cam, best_s = cam2, s2
    out[label]["best"] = round(float(best_s), 4)
    out[label]["best_cam"] = {
        k: (np.asarray(v).tolist() if isinstance(v, np.ndarray) else v)
        for k, v in best_cam.items()}
    return best_cam, best_s


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stage2_deep.json"
    # seed "ours" with the first probe's best cameras when available
    prior = {}
    try:
        prior = json.load(open("/tmp/stage2_polish_probe.json"))
    except Exception:
        pass
    report = {}
    for m, view in VIEWS:
        grid = load_voxel_grid_labels(
            f"{OURS}/1.Orthographic_Voxel_Carving/{m}_voxel_grid.npz")
        max_dim = int(np.max(grid.shape))
        mask = load_mask_labels(
            DATA, m, view, max_dim if view == "front" else None)
        ours = load_camera_json(
            f"{OURS}/2.Perspective_Camera_Estimation/"
            f"{m}_camera_params_final.json", view)
        pk = prior.get(f"{m}/{view}", {}).get("best_cam")
        if pk:
            ours = {k: (np.asarray(v) if isinstance(v, list) else v)
                    for k, v in pk.items()}
        gold = load_camera_json(
            f"{GOLD}/2.Perspective_Camera_Estimation/"
            f"{m}_camera_params_final.json", view)
        chain(grid, mask, ours, f"{m}/{view}/ours", report)
        chain(grid, mask, gold, f"{m}/{view}/golden", report)
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
    print(f"[deep] wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
