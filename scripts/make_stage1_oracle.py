#!/usr/bin/env python
"""Generate a stage-1 bit-exactness oracle by running the LIVE reference
implementation (/root/reference, CPU) with its unavailable imports stubbed.

This is the recipe behind tests/fixtures/oracle_<M>_<maxdim>.npz (consumed by
tests/test_stage1.py): notebook-1 cells 3/5/7 parameters
(1.Orthographic_semantic_voxel_carving.ipynb) driven through
utils/mask_utils.load_and_prepare_masks + voxel_carving_utils.global_carve /
partwise_carve.

Usage: python scripts/make_stage1_oracle.py <Monument> <max_dim>
Writes tests/fixtures/oracle_<Monument>_<max_dim>.npz with:
  colored — the global_carve output (RGB voxel grid)
  final   — the full stage-1 output after partwise_carve (RGB voxel grid)

The reference imports plotly/skimage/trimesh/matplotlib-widgets at module
scope; only numpy/scipy/cv2/sklearn code runs on the stage-1 path, so the
missing modules are stubbed with empty shims (mirrors how the notebooks would
run with viz disabled).
"""

import sys
import types
from pathlib import Path

import numpy as np


def _stub(name, attrs=()):
    mod = types.ModuleType(name)
    for a in attrs:
        setattr(mod, a, lambda *args, **kw: None)
    sys.modules.setdefault(name, mod)
    return mod


def main():
    monument = sys.argv[1] if len(sys.argv) > 1 else "Akbar"
    max_dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    # ---- stub the viz/mesh/widget deps absent from this environment ----
    # (utils/__init__.py star-imports every submodule, so the whole package's
    # module-scope imports must resolve even though stage 1 never calls them)
    _stub("plotly")
    _stub("plotly.graph_objects", ["Figure", "Scatter3d", "Mesh3d"])
    _stub("trimesh", ["Trimesh"])
    _stub("ipywidgets", ["Output", "interact", "FloatSlider", "IntSlider",
                         "Dropdown", "Button", "VBox", "HBox"])
    _stub("utils.preprocess_helpers", ["normalize_preserve_aspect"])
    sk = _stub("skimage")
    skm = _stub("skimage.measure", ["marching_cubes", "regionprops", "label"])
    sk.measure = skm

    sys.path.insert(0, "/root/reference")
    from utils.config import INTERIOR_PARTS, PART_COLORS_NP
    from utils.mask_utils import load_and_prepare_masks
    from utils.voxel_carving_utils import global_carve, partwise_carve

    # notebook-1 cell 3
    semantic_mask, semantic_mask_exterior, binary_mask = load_and_prepare_masks(
        root_path=Path("/root/reference/data"),
        monument_name=monument,
        view_name="front",
        max_dim=max_dim,
        part_colors_np=PART_COLORS_NP,
        interior_parts=INTERIOR_PARTS,
        visualize=False,
    )
    # notebook-1 cell 5
    colored = global_carve(
        binary_mask=binary_mask,
        semantic_mask_exterior=semantic_mask_exterior,
        angle_interval=90,
        visualize=False,
    )
    # notebook-1 cell 7 hyperparameters
    group_jobs = [
        (["full_building"], 90),
        (["chhatris"], 90),
        (["plinth"], 90),
        (["front_minarets"], 90),
        (["small_minarets"], 90),
        (["dome"], 90),
    ]
    part_symmetry = {
        "dome": 5, "chhatris": 45, "front_minarets": 5, "small_minarets": 5,
    }
    extrusion_depths = {"main_door": 20, "windows": 10}
    final = partwise_carve(
        colored_voxel_grid=colored,
        semantic_mask_exterior=semantic_mask_exterior,
        semantic_mask_full=semantic_mask,
        part_colors_np=PART_COLORS_NP,
        group_jobs=group_jobs,
        part_symmetry=part_symmetry,
        extrusion_depths=extrusion_depths,
        visualize=False,
    )

    out = Path(__file__).resolve().parent.parent / "tests" / "fixtures"
    out.mkdir(parents=True, exist_ok=True)
    path = out / f"oracle_{monument}_{max_dim}.npz"
    np.savez_compressed(path, colored=colored, final=final)
    print(f"wrote {path}: colored={colored.shape} final={final.shape}")


if __name__ == "__main__":
    main()
