"""Notebook-4 evaluation drivers against the committed goldens.

This mirrors the reference's own regression harness: run the intra-method
tables over ``results/`` artifacts (here for one monument to keep CI fast).
"""

import numpy as np
import pytest

from pbr3d.eval.intra import (
    run_minaret_kp_evaluation,
    run_minaret_iou_evaluation,
    run_part_minaret_binary_iou,
)


@pytest.fixture(scope="module")
def roots(golden_root, data_root):
    return dict(
        root_voxels=f"{golden_root}/1.Orthographic_Voxel_Carving",
        deformed_voxels=f"{golden_root}/3.Part-wise_3D_Refinement",
        cam_dir=f"{golden_root}/2.Perspective_Camera_Estimation",
        root_masks=data_root,
    )


def _parse_chain(cell):
    return [float(x) for x in cell.split("→")]


def test_kp_eval_akbar(roots):
    df = run_minaret_kp_evaluation(
        ["Akbar"], "front",
        roots["root_voxels"], roots["root_masks"], roots["cam_dir"],
    )
    assert set(df.index) == {"LM1", "RM1", "LM2", "RM2", "Average"}
    init, rep = _parse_chain(df.loc["Average", "AT"])
    # the kp fit must reduce the average reprojection error vs init
    assert rep < init
    assert rep < 50  # px, sane magnitude at 128 grid


def test_minaret_iou_eval_akbar(roots):
    df = run_minaret_iou_evaluation(
        ["Akbar"], "front",
        roots["root_voxels"], roots["root_masks"], roots["cam_dir"],
    )
    chain = _parse_chain(df.loc["Average", "AT"])
    assert len(chain) == 3
    assert all(0.0 <= v <= 1.0 for v in chain)
    # the human-curated final camera should beat the bbox init
    assert chain[2] > chain[0]


def test_part_binary_iou_akbar(roots):
    df = run_part_minaret_binary_iou(
        ["Akbar"], "front",
        roots["root_voxels"], roots["deformed_voxels"],
        roots["root_masks"], roots["cam_dir"],
    )
    assert "whole" in df.index and "minarets" in df.index
    whole = _parse_chain(df.loc["whole", "AT"])
    assert all(0.0 < v <= 1.0 for v in whole)
    # Akbar has no plinth in its mask -> "--" cell
    assert df.loc["plinth", "AT"] == "--"
