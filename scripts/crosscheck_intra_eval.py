#!/usr/bin/env python
"""Cross-check: run the REFERENCE's notebook-4 eval drivers
(utils/eval_helpers_intra.py, live code from /root/reference) over a results
tree, so pbr3d's reimplementation (pbr3d/eval/intra.py) can be diffed against
the reference's own numbers on the SAME artifacts — killing the
self-grading-loop risk (VERDICT round 1, Missing #5 / Weak #8).

skimage is absent from this environment; ``skimage.measure.label`` /
``regionprops`` are shimmed with exact-semantics equivalents (scipy full-
connectivity labeling — skimage's 2-D default is connectivity=2 — and a
regionprops reduced to the three attributes the reference reads: label,
area, centroid).  Everything else runs the reference's own numpy/cv2 code,
including its per-point Python z-buffer loops.

Usage: python scripts/crosscheck_intra_eval.py <results_root> [monuments...]
e.g.   python scripts/crosscheck_intra_eval.py /root/repo/results_temp
"""

import sys
import types

import numpy as np


def _stub(name, attrs=()):
    mod = types.ModuleType(name)
    for a in attrs:
        setattr(mod, a, lambda *args, **kw: None)
    sys.modules.setdefault(name, mod)
    return mod


def install_skimage_shim():
    import scipy.ndimage

    class _Region:
        def __init__(self, lbl, area, centroid):
            self.label = lbl
            self.area = area
            self.centroid = centroid

    def label(mask, connectivity=None, **kw):
        # skimage 2-D default connectivity=2 == full 3x3 structure
        structure = np.ones((3,) * np.ndim(mask))
        lab, _ = scipy.ndimage.label(np.asarray(mask), structure=structure)
        return lab

    def regionprops(lab):
        lab = np.asarray(lab)
        out = []
        for i in range(1, int(lab.max()) + 1):
            ys, xs = np.nonzero(lab == i)
            if len(ys) == 0:
                continue
            out.append(_Region(i, len(ys), (float(ys.mean()), float(xs.mean()))))
        return out

    sk = _stub("skimage")
    skm = types.ModuleType("skimage.measure")
    skm.label = label
    skm.regionprops = regionprops
    skm.marching_cubes = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("marching_cubes not used on the intra-eval path")
    )
    sys.modules["skimage.measure"] = skm
    sk.measure = skm


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/results_temp"
    monuments = sys.argv[2:] or ["Taj", "Bibi", "Itimad", "Akbar", "Charminar"]

    install_skimage_shim()
    _stub("plotly")
    _stub("plotly.graph_objects", ["Figure", "Scatter3d", "Mesh3d"])
    _stub("trimesh", ["Trimesh"])
    _stub("ipywidgets", ["Output", "interact", "FloatSlider", "IntSlider",
                         "Dropdown", "Button", "VBox", "HBox"])
    _stub("utils.preprocess_helpers", ["normalize_preserve_aspect"])
    import matplotlib

    matplotlib.use("Agg")  # the drivers plt.show() even with visualize=False

    sys.path.insert(0, "/root/reference")

    # NumPy 2.0 removed ndarray.ptp; the reference was written against 1.x
    # (camera_estimation.py:189).  Re-exec the module with the one mechanical
    # rewrite — no behavioral change.
    import utils.camera_estimation as _ce

    src = open(_ce.__file__).read().replace(
        "coords[:, 1].ptp()", "np.ptp(coords[:, 1])"
    )
    exec(compile(src, _ce.__file__, "exec"), _ce.__dict__)

    from utils.config import PART_COLORS_NP
    from utils.eval_helpers_intra import (
        run_minaret_kp_evaluation,
        run_minaret_iou_evaluation,
        run_part_minaret_binary_iou,
    )

    kw = dict(
        monuments=monuments,
        view="front",
        root_voxels=f"{root}/1.Orthographic_Voxel_Carving",
        root_masks="/root/reference/data",
        cam_dir=f"{root}/2.Perspective_Camera_Estimation",
        part_colors=PART_COLORS_NP,
        visualize=False,
    )
    run_minaret_kp_evaluation(**kw)
    run_minaret_iou_evaluation(**kw)
    run_part_minaret_binary_iou(
        deformed_voxels=f"{root}/3.Part-wise_3D_Refinement", **kw
    )


if __name__ == "__main__":
    main()
