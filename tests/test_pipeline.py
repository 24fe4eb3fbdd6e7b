"""End-to-end pipeline smoke test (Akbar @128: the full 3 stages)."""

import numpy as np
import pytest

from pbr3d import config
from pbr3d.io.artifacts import load_voxel_grid_labels, voxel_grid_iou
from pbr3d.pipeline import run_pipeline


@pytest.mark.slow
def test_full_pipeline_akbar(data_root, golden_root, tmp_path):
    res = run_pipeline(
        "Akbar",
        data_root,
        max_dim=128,
        out_dir=tmp_path,
        stage2_kw=dict(generations=3, population=16, seed=0),
        stage3_kw=dict(search_stride=8, chunk=32,
                       part_names=["front_minarets", "main_door"],
                       scale_range=(0.9, 1.1, 3), shift_range=(-20, 20, 3),
                       refine_steps=3),
    )
    # artifacts in reference layout
    assert (tmp_path / "1.Orthographic_Voxel_Carving" / "Akbar_voxel_grid.npz").exists()
    assert (
        tmp_path / "2.Perspective_Camera_Estimation" / "Akbar_camera_params_final.json"
    ).exists()
    assert (
        tmp_path / "3.Part-wise_3D_Refinement" / "Akbar_deformed_voxel_grid.npz"
    ).exists()

    # stage-1 matches golden loosely (golden drift documented in test_stage1)
    gold1 = load_voxel_grid_labels(
        f"{golden_root}/1.Orthographic_Voxel_Carving/Akbar_voxel_grid.npz"
    )
    assert voxel_grid_iou(res.grid_stage1, gold1) >= 0.96

    # cameras exist for the front view at minimum
    assert "front" in res.cameras["final"]

    # stage 3 produced a non-empty deformed grid containing exactly the
    # optimized parts (unsaved parts are omitted, reference
    # deformation_estimation.py:288-313 semantics)
    assert res.grid_stage3.shape == res.grid_stage1.shape  # Akbar pad = 0
    parts3 = set(np.unique(res.grid_stage3)) - {0}
    assert parts3 == {
        config.PART_IDS["front_minarets"], config.PART_IDS["main_door"]
    }


@pytest.mark.slow
def test_run_all_batched_two_monuments(data_root, tmp_path):
    """run_all's phase-major path: batched stage 1 with per-scene prep
    callbacks, batched stage 2 (grouped device searches + retry family),
    overlapped stage 3 — the production orchestration bench.py times."""
    from pbr3d.pipeline import run_all

    res = run_all(
        ("Akbar", "Taj"), strict=True, max_dim=96, out_dir=tmp_path,
        stage2_kw=dict(generations=2, population=8, seed=0),
        stage3_kw=dict(search_stride=8, chunk=32,
                       part_names=["front_minarets"],
                       scale_range=(0.9, 1.1, 3), shift_range=(-20, 20, 3),
                       refine_steps=3),
    )
    assert set(res) == {"Akbar", "Taj"}
    for m, r in res.items():
        assert "front" in r.cameras["final"], m
        assert r.grid_stage3.shape[0] > 0
        assert (
            tmp_path / "2.Perspective_Camera_Estimation"
            / f"{m}_camera_params_final.json"
        ).exists()
