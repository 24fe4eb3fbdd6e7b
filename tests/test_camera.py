"""Stage-2 camera estimation vs oracles (scipy optimizer, numpy restatements)."""

import os

import numpy as np
import pytest
import scipy.ndimage
import scipy.optimize

from pbr3d import config
from pbr3d.camera.estimate import (
    auto_compute_initial_params_matching_bbox,
    optimize_camera_with_keypoints,
    default_bounds,
)
from pbr3d.camera.keypoints import (
    extract_minaret_kps_for_view,
    extract_minaret_voxels_by_label,
)
from pbr3d.camera.align import evaluate_camera_iou, refine_camera_mask_iou
from pbr3d.config import rgb_to_labels
from pbr3d.io.masks import load_mask_labels

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "oracle_Akbar_128.npz")


@pytest.fixture(scope="module")
def akbar_grid():
    return rgb_to_labels(np.load(FIXTURE)["final"])


@pytest.fixture(scope="module")
def akbar_front_mask(data_root):
    return load_mask_labels(data_root, "Akbar", "front", 128)


def test_minaret_voxels_match_scipy_oracle(akbar_grid):
    """Restate the reference's extraction with scipy.ndimage directly."""
    ours = extract_minaret_voxels_by_label(akbar_grid)

    comps = []
    for part in ("front_minarets", "back_minarets"):
        mask = akbar_grid == config.PART_IDS[part]
        lab, n = scipy.ndimage.label(mask)
        for cid in range(1, n + 1):
            coords = np.argwhere(lab == cid)
            comps.append((coords.mean(0), np.ptp(coords[:, 1]), coords))
    assert len(comps) >= 4
    top4 = sorted(comps, key=lambda c: -c[1])[:4]
    cents = np.stack([c[0] for c in top4])
    order = np.argsort(cents[:, 0])
    left = sorted(order[:2], key=lambda i: cents[i, 2])
    right = sorted(order[2:], key=lambda i: cents[i, 2])
    expect = {
        "LM1": top4[left[0]][2], "LM2": top4[left[1]][2],
        "RM1": top4[right[0]][2], "RM2": top4[right[1]][2],
    }
    for k in expect:
        np.testing.assert_array_equal(np.sort(ours[k], 0), np.sort(expect[k], 0))


def test_kps_and_bbox_init(akbar_grid, akbar_front_mask):
    vox_kps, img_kps = extract_minaret_kps_for_view(akbar_grid, akbar_front_mask)
    assert set(k.split("_")[0] for k in vox_kps) <= {"LM1", "LM2", "RM1", "RM2"}
    # M2 anchors: top only
    assert not any(("2" in k.split("_")[0]) and k.endswith("bottom") for k in vox_kps)

    init = auto_compute_initial_params_matching_bbox(
        akbar_grid, akbar_front_mask, ["front_minarets", "back_minarets"]
    )
    H, W = akbar_front_mask.shape
    assert init["cx"] == W / 2 and init["cy"] == H / 2
    assert init["cam_pos"][2] < init["target"][2]  # camera on -Z side


def test_keypoint_fit_beats_scipy_lbfgsb(akbar_grid, akbar_front_mask):
    vox_kps, img_kps = extract_minaret_kps_for_view(akbar_grid, akbar_front_mask)
    init = auto_compute_initial_params_matching_bbox(
        akbar_grid, akbar_front_mask, ["front_minarets", "back_minarets"]
    )
    H, W = akbar_front_mask.shape
    ours = optimize_camera_with_keypoints(vox_kps, img_kps, (H, W), init)

    # The reference's optimizer restated: scipy L-BFGS-B on the same objective.
    keys = list(img_kps.keys())
    vox = np.stack([vox_kps[k] for k in keys]).astype(np.float64)
    img = np.stack([img_kps[k] for k in keys]).astype(np.float64)

    def np_loss(x):
        eye, tgt = x[0:3], x[3:6]
        z = tgt - eye
        z = z / np.linalg.norm(z)
        up = np.array([0, 1, 0.0])
        if np.allclose(abs(z @ up), 1):
            up = np.array([0, 0, 1.0])
        xx = np.cross(up, z); xx /= np.linalg.norm(xx)
        yy = np.cross(z, xx)
        R = np.stack([xx, yy, z])
        pc = (vox - eye) @ R.T
        Z = np.maximum(pc[:, 2], 1e-8)
        u = pc[:, 0] / Z * x[6] + x[7]
        v = -pc[:, 1] / Z * x[6] + x[8]
        return np.sum((np.stack([u, v], 1) - img) ** 2)

    lo, hi = default_bounds(H, W)
    x0 = np.concatenate([init["cam_pos"], init["target"],
                         [init["f"], init["cx"], init["cy"]]])
    res = scipy.optimize.minimize(
        np_loss, x0, bounds=list(zip(lo, hi)), method="L-BFGS-B"
    )
    assert ours["loss"] <= res.fun * 1.05 + 1e-3, (ours["loss"], res.fun)


def test_mask_iou_refinement_improves(akbar_grid, akbar_front_mask):
    parts = ["front_minarets", "back_minarets"]
    init = auto_compute_initial_params_matching_bbox(akbar_grid, akbar_front_mask, parts)
    iou0 = evaluate_camera_iou(akbar_grid, akbar_front_mask, parts, init)
    final, iou1 = refine_camera_mask_iou(
        akbar_grid, akbar_front_mask, parts, init,
        generations=5, population=16, cd_rounds=2, seed=0,
    )
    assert iou1 >= iou0
    assert final["H"] == akbar_front_mask.shape[0]


def test_surface_shell_silhouette_equals_solid():
    """The 6-connected shell must splat to the same silhouette as the full
    solid (rays enter a solid through its surface)."""
    import jax.numpy as jnp
    from pbr3d.carving.voxel import (
        bucket_size, pad_points, points_by_parts, surface_points_by_parts,
    )
    from pbr3d.ops.projection import splat_labels

    grid = np.zeros((40, 40, 40), np.uint8)
    pid = config.PART_IDS["front_minarets"]
    grid[8:30, 5:35, 8:14] = pid
    grid[20:26, 10:28, 22:30] = pid
    full, lf = points_by_parts(grid, ["front_minarets"])
    shell, ls = surface_points_by_parts(grid, ["front_minarets"])
    assert len(shell) < len(full)
    cam = dict(cam_pos=np.array([20.0, 20.0, -90.0]),
               target=np.array([20.0, 20.0, 20.0]), f=120.0, cx=20.0, cy=20.0)
    H = W = 40

    def silhouette(pts, labels):
        p, l, v = pad_points(pts, labels, bucket_size(len(pts)))
        img = splat_labels(
            jnp.asarray(p), jnp.asarray(l), jnp.asarray(v),
            cam["cam_pos"], cam["target"], cam["f"], cam["cx"], cam["cy"], H, W,
        )
        return np.asarray(img) > 0

    np.testing.assert_array_equal(silhouette(full, lf), silhouette(shell, ls))


def test_refine_coarse_to_native_for_large_planes():
    """Planes over 512^2 px route through the half-resolution search; the
    returned params must be in NATIVE pixel units (H/W of the input mask)
    and at least match the init on the native objective."""
    import jax.numpy as jnp
    from pbr3d.camera.align import (
        _COARSE_PLANE_PIXELS, evaluate_camera_iou, refine_camera_mask_iou,
    )

    size = 40
    grid = np.zeros((size, size, size), np.uint8)
    pid = config.PART_IDS["front_minarets"]
    grid[8:32, 6:34, 6:14] = pid
    H, W = 560, 560
    assert H * W > _COARSE_PLANE_PIXELS
    mask = np.zeros((H, W), np.uint8)
    mask[140:420, 160:400] = pid
    init = dict(
        cam_pos=np.array([20.0, 20.0, -120.0]),
        target=np.array([20.0, 20.0, 20.0]),
        f=600.0, cx=280.0, cy=280.0,
    )
    out, iou = refine_camera_mask_iou(
        grid, mask, ["front_minarets"], init,
        generations=2, population=16, cd_rounds=2, seed=0,
    )
    assert out["H"] == H and out["W"] == W
    assert np.isfinite(iou) and 0.0 <= iou <= 1.0
    # the native CD stage starts from the upscaled coarse optimum and only
    # accepts improvements, so the reported IoU is the native-plane value
    # of the returned params
    assert iou >= 0.0


def test_refine_cameras_batched_matches_serial_quality():
    """The batched multi-view search must reach at least the serial path's
    objective on a synthetic scene (same seed, same generations)."""
    import numpy as np
    from pbr3d import config
    from pbr3d.camera.align import (
        evaluate_camera_iou, refine_camera_mask_iou, refine_cameras_batched,
    )

    size = 48
    grid = np.zeros((size, size, size), np.uint8)
    fid = config.PART_IDS["front_minarets"]
    bid = config.PART_IDS["back_minarets"]
    grid[8:14, 8:40, 6:12] = fid
    grid[8:14, 8:40, 36:42] = fid
    grid[34:40, 8:36, 6:12] = bid
    grid[34:40, 8:36, 36:42] = bid
    mask = np.zeros((size, size), np.uint8)
    mask[6:40, 4:12] = fid
    mask[6:40, 36:44] = fid
    mask[8:36, 14:20] = bid
    mask[8:36, 28:34] = bid
    c = size / 2.0
    init = {
        "cam_pos": np.array([c, c, -3.0 * size]),
        "target": np.array([c, c, c]),
        "f": 2.0 * size, "cx": c, "cy": c,
    }
    parts = ["front_minarets", "back_minarets"]

    serial, iou_serial = refine_camera_mask_iou(
        grid, mask, parts, init, generations=6, population=16, seed=0,
    )
    batched = refine_cameras_batched(
        {("syn", "front"): dict(
            grid_labels=grid, mask_labels=mask, parts=parts, init_params=init
        )},
        generations=6, population=16, seed=0,
    )
    params, iou_batched = batched[("syn", "front")]
    # both must improve on the init, and the batched path must not be
    # meaningfully worse than serial (trajectories differ: strided coarse
    # phase + native polish)
    iou_init = evaluate_camera_iou(grid, mask, parts, init)
    assert iou_batched > iou_init
    assert iou_batched >= iou_serial - 0.05
    for k in ("H", "W", "f", "cx", "cy"):
        assert k in params


def test_reparam_principal_point_preserves_projection():
    """Moving the principal point with the compensating retarget must keep
    projections fixed to first order (small moves ~exact; full-image moves
    bounded by the second-order perspective term)."""
    import numpy as np
    import jax.numpy as jnp
    from pbr3d.camera.geometry import reparam_principal_point
    from pbr3d.ops.cameramath import project_points

    cam = {"cam_pos": np.array([300.0, 200.0, -900.0]),
           "target": np.array([128.0, 100.0, 128.0]),
           "f": 800.0, "cx": 161.0, "cy": 208.0}
    pts = np.random.default_rng(0).uniform(0, 256, (500, 3)).astype(np.float32)
    u0, v0, _ = project_points(
        jnp.asarray(pts), cam["cam_pos"], cam["target"],
        cam["f"], cam["cx"], cam["cy"])

    # small move: sub-pixel preservation
    small = reparam_principal_point(cam, cam["cx"] - 5.0, cam["cy"] + 5.0)
    u1, v1, _ = project_points(
        jnp.asarray(pts), small["cam_pos"], small["target"],
        small["f"], small["cx"], small["cy"])
    assert float(jnp.abs(u1 - u0).mean()) < 0.5
    assert float(jnp.abs(v1 - v0).mean()) < 0.5

    # full move to cx=cy=0: bounded second-order residual, params moved
    big = reparam_principal_point(cam, 0.0, 0.0)
    assert big["cx"] == 0.0 and big["cy"] == 0.0
    assert np.linalg.norm(np.asarray(big["target"]) - cam["target"]) > 50
    u2, v2, _ = project_points(
        jnp.asarray(pts), big["cam_pos"], big["target"],
        big["f"], big["cx"], big["cy"])
    assert float(jnp.abs(u2 - u0).mean()) < 15.0
    assert float(jnp.abs(v2 - v0).mean()) < 15.0


def test_yaw_and_dolly_helpers():
    import numpy as np
    from pbr3d.camera.geometry import dolly_zoom, yaw_camera_about_center

    cam = {"cam_pos": np.array([10.0, 20.0, -100.0]),
           "target": np.array([32.0, 16.0, 32.0]),
           "f": 200.0, "cx": 32.0, "cy": 32.0}
    # dolly: distance scales by s, f scales by s, direction preserved
    d = dolly_zoom(cam, 2.0)
    v0 = cam["cam_pos"] - cam["target"]
    v1 = d["cam_pos"] - d["target"]
    assert np.allclose(v1, 2.0 * v0)
    assert d["f"] == 400.0
    # yaw 360 = identity; yaw 90 preserves height and center distance
    y360 = yaw_camera_about_center(cam, (64, 64, 64), 360.0)
    assert np.allclose(y360["cam_pos"], cam["cam_pos"])
    y90 = yaw_camera_about_center(cam, (64, 64, 64), 90.0)
    c = np.array([32.0, 32.0, 32.0])
    assert np.isclose(
        np.linalg.norm(y90["cam_pos"] - c), np.linalg.norm(cam["cam_pos"] - c))
    assert np.isclose(y90["cam_pos"][1], cam["cam_pos"][1])


def test_cd_mags_default_identical_and_multiscale_no_worse(
    akbar_grid, akbar_front_mask
):
    """cd_mags=(1.0,) must reproduce the classic CD schedule bit-exactly,
    and a multi-scale probe batch (quarter steps + a 4x Powell-style
    extension) must never end below it on the search's own objective."""
    parts = ["front_minarets", "back_minarets"]
    init = auto_compute_initial_params_matching_bbox(
        akbar_grid, akbar_front_mask, parts
    )
    base, iou_base = refine_camera_mask_iou(
        akbar_grid, akbar_front_mask, parts, init,
        generations=4, population=16, cd_rounds=4, seed=0,
    )
    same, iou_same = refine_camera_mask_iou(
        akbar_grid, akbar_front_mask, parts, init,
        generations=4, population=16, cd_rounds=4, seed=0, cd_mags=(1.0,),
    )
    assert iou_same == iou_base
    for k in ("cam_pos", "target", "f", "cx", "cy"):
        assert np.array_equal(np.asarray(same[k]), np.asarray(base[k])), k
    multi, iou_multi = refine_camera_mask_iou(
        akbar_grid, akbar_front_mask, parts, init,
        generations=4, population=16, cd_rounds=4, seed=0,
        cd_mags=(1.0, 0.25, 4.0),
    )
    # same generations prefix; the widened CD accepts only on improvement,
    # so the internal objective can only match or beat the classic one
    assert iou_multi >= iou_base - 1e-6


def test_retry_starts_include_elevated_reinit(akbar_grid, akbar_front_mask):
    """Drone retry families must include the elevated bbox re-init: camera
    ABOVE the bbox center (positive elevation regardless of the kp
    camera's sign), looking at the center, principal point centered — the
    start that escapes the below-horizon false basin (Charminar drone
    plateaus at 0.53 there; the golden's above-horizon basin polishes to
    0.65)."""
    from pbr3d.pipeline import _retry_starts

    kp = {
        "cam_pos": np.array([-80.0, -120.0, 90.0]),
        "target": np.array([60.0, 60.0, 60.0]),
        "f": 300.0, "cx": 64.0, "cy": 64.0,
    }
    starts = _retry_starts(
        kp, akbar_grid.shape, "drone",
        mask_hw=akbar_front_mask.shape[:2],
        grid_labels=akbar_grid, mask_labels=akbar_front_mask,
    )
    tags = [t for t, _, _ in starts]
    assert "elev+" in tags, tags
    elev = [p for t, p, _ in starts if t == "elev+"][0]
    assert elev["cam_pos"][1] > elev["target"][1]  # above the center
    # kp camera was below (-120 < target y): elevation got flipped up
    assert elev["cam_pos"][1] > 0
    # front views keep the lean principal-point family (no bbox re-init)
    fronts = _retry_starts(
        kp, akbar_grid.shape, "front",
        mask_hw=akbar_front_mask.shape[:2],
        grid_labels=akbar_grid, mask_labels=akbar_front_mask,
    )
    assert "elev+" not in [t for t, _, _ in fronts]


def test_refine_cameras_batched_accepts_cd_mags(akbar_grid, akbar_front_mask):
    """The batched driver threads cd_mags into its per-view CD polish; the
    widened probe batch accepts only on improvement, so the result can only
    match or beat the classic schedule on the internal objective."""
    from pbr3d.camera.align import refine_cameras_batched

    parts = ["front_minarets", "back_minarets"]
    init = auto_compute_initial_params_matching_bbox(
        akbar_grid, akbar_front_mask, parts
    )
    job = dict(grid_labels=akbar_grid, mask_labels=akbar_front_mask,
               parts=parts, init_params=init)
    base = refine_cameras_batched(
        {"a": job}, generations=4, population=16, cd_rounds=4, seed=0)
    multi = refine_cameras_batched(
        {"a": job}, generations=4, population=16, cd_rounds=4, seed=0,
        cd_mags=(1.0, 0.25, 4.0))
    assert multi["a"][1] >= base["a"][1] - 1e-6
