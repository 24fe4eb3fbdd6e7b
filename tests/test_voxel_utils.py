"""Voxel/point/mesh utilities + viz smoke tests."""

import numpy as np
import pytest

from pbr3d import config
from pbr3d.carving.voxel import (
    all_points,
    extract_top_k_components,
    grid_to_points,
    meshify_colored_voxel_grid,
    points_by_parts,
)


@pytest.fixture()
def toy_grid():
    g = np.zeros((24, 24, 24), np.uint8)
    g[2:6, 2:20, 2:6] = config.PART_IDS["front_minarets"]    # tall
    g[18:22, 2:14, 18:22] = config.PART_IDS["front_minarets"]  # medium
    g[2:4, 2:6, 18:20] = config.PART_IDS["front_minarets"]  # short
    g[8:16, 2:10, 8:16] = config.PART_IDS["dome"]
    return g


def test_points_by_parts_convention(toy_grid):
    pts, labels = points_by_parts(toy_grid, ["dome"])
    # convention: (x, y, z) = (d2, d1, d0)
    d0, d1, d2 = np.where(toy_grid == config.PART_IDS["dome"])
    np.testing.assert_array_equal(pts, np.stack([d2, d1, d0], 1).astype(np.float32))
    assert (labels == config.PART_IDS["dome"]).all()


def test_all_points(toy_grid):
    pts, labels = all_points(toy_grid)
    assert len(pts) == (toy_grid > 0).sum()


def test_grid_to_points_stride(toy_grid):
    pts, labels, hwd = grid_to_points(toy_grid, stride=2)
    assert hwd == (24, 24, 24)
    assert (pts % 2 == 0).all()
    # every returned point is occupied in the original grid
    xi = pts.astype(int)
    vals = toy_grid[xi[:, 2], xi[:, 1], xi[:, 0]]
    assert (vals == labels).all()


def test_extract_top_k_components(toy_grid):
    out = extract_top_k_components(toy_grid, "front_minarets", k=2)
    # the short block must be removed, tall + medium kept, dome untouched
    assert out[2, 3, 18] == 0
    assert out[3, 10, 3] == config.PART_IDS["front_minarets"]
    assert out[19, 5, 19] == config.PART_IDS["front_minarets"]
    assert (out == config.PART_IDS["dome"]).sum() == (toy_grid == config.PART_IDS["dome"]).sum()


def test_meshify(toy_grid):
    verts, faces, colors, normals = meshify_colored_voxel_grid(toy_grid, stride=1)
    assert len(verts) > 0 and len(faces) > 0
    assert colors.shape == (len(verts), 3)
    assert colors.max() <= 1.0
    assert np.isfinite(verts).all()
    # mirror fix: z in [D - max_d0, D - min_d0] range-ish
    assert verts[:, 2].max() <= toy_grid.shape[2] + 1


def test_viz_smoke(toy_grid):
    from pbr3d.utils.viz import (
        plot_voxel_grid,
        visualize_side_by_side,
        visualize_voxel_projection_iou,
    )

    fig = plot_voxel_grid(toy_grid, stride=2, title="toy")
    assert fig is not None

    cam = {
        "cam_pos": np.array([12.0, 12.0, -70.0]),
        "target": np.array([12.0, 12.0, 12.0]),
        "f": 60.0, "cx": 12.0, "cy": 12.0,
    }
    mask = np.full((24, 24), config.BACKGROUND_ID, np.uint8)
    mask[8:16, 8:16] = config.PART_IDS["dome"]
    figs = visualize_voxel_projection_iou(toy_grid, ["dome"], mask, cam, "part_on_whole")
    assert len(figs) == 1
    figs = visualize_voxel_projection_iou(toy_grid, ["dome"], mask, cam, "whole_on_whole")
    assert len(figs) == 1

    gt = mask == config.PART_IDS["dome"]
    fig = visualize_side_by_side(gt, gt, ~gt, "t", 1.0, 0.0)
    assert fig is not None


def test_minaret_viz_smoke(golden_root, data_root):
    from pbr3d.io.artifacts import load_camera_json, load_voxel_grid_labels
    from pbr3d.camera.keypoints import (
        extract_minaret_voxels_by_label, extract_minaret_masks_by_label,
        extract_top_bottom_voxel_points, extract_top_bottom_image_points,
    )
    from pbr3d.eval.intra import _load_mask_labels_for_grid
    from pbr3d.utils.viz import visualize_minaret_kp, visualize_minarets_all_cams

    grid = load_voxel_grid_labels(
        f"{golden_root}/1.Orthographic_Voxel_Carving/Akbar_voxel_grid.npz")
    mask = _load_mask_labels_for_grid(data_root, "Akbar", "front", grid.shape)
    cam = load_camera_json(
        f"{golden_root}/2.Perspective_Camera_Estimation/Akbar_camera_params_init.json",
        "front")
    vox = extract_minaret_voxels_by_label(grid)
    msk = extract_minaret_masks_by_label(mask)
    vkp = extract_top_bottom_voxel_points(vox)
    ikp = extract_top_bottom_image_points(msk)
    fig = visualize_minaret_kp("Akbar", "init", cam, mask, vkp, ikp,
                               back_top_only=True)
    assert fig is not None
    fig, ious = visualize_minarets_all_cams(grid, mask, {"init": cam})
    assert "init" in ious


def test_pointcache_surface_matches_standalone():
    """PointCache's per-part shell must equal surface_points_by_parts of the
    part's own solid — including where two parts touch (the shared face is on
    BOTH parts' shells)."""
    from pbr3d.carving.voxel import PointCache, surface_points_by_parts

    rng = np.random.default_rng(7)
    g = np.zeros((20, 18, 16), np.uint8)
    g[2:10, 3:12, 4:12] = 3
    g[10:16, 3:12, 4:12] = 5  # touches part 3 on the d0=10 face
    g[rng.random(g.shape) < 0.05] = 7  # scattered salt
    cache = PointCache(g)
    for part_id, name in ((3, "plinth"), (5, "dome"), (7, "chhatris")):
        from pbr3d import config

        name = [n for n, i in config.PART_IDS.items() if i == part_id][0]
        want_p, want_l = surface_points_by_parts(g, [name])
        got_p, got_l = cache.surface_points_by_parts([name])
        np.testing.assert_array_equal(got_p, want_p)
        np.testing.assert_array_equal(got_l, want_l)
