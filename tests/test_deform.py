"""Stage-3 warp vs a literal numpy restatement of the reference deform."""

import numpy as np
import pytest
import jax.numpy as jnp

from pbr3d.deform.warp import deform_coords, build_deformed_grid
from pbr3d.deform.search import optimize_part_deform
from pbr3d import config


def _np_deform(coords, image_shape, voxel_shape, deform):
    """Reference semantics: per-jittered-copy centering + unique."""
    def one_pass(c):
        center = c.mean(axis=0, keepdims=True)
        c = c - center
        H_img, W_img = image_shape
        D, H, W = voxel_shape
        c2 = c.copy()
        c2[:, 0] = c[:, 0] * deform["scale_xz"] + deform["shift_xz"] * (W / W_img) * np.sign(c[:, 0])
        c2[:, 1] = c[:, 1] * deform["scale_y"] - deform["shift_y"] * (H / H_img)
        c2[:, 2] = c[:, 2] * deform["scale_xz"] + deform["shift_xz"] * (D / W_img) * np.sign(c[:, 2])
        return np.round(c2 + center).astype(int)

    offsets = np.array(
        [[0, 0, 0], [0.25, 0, 0], [-0.25, 0, 0], [0, 0.25, 0],
         [0, -0.25, 0], [0, 0, 0.25], [0, 0, -0.25]]
    )
    allc = [one_pass(coords + off) for off in offsets]
    return np.unique(np.vstack(allc), axis=0)


@pytest.mark.parametrize(
    "deform",
    [
        {"scale_y": 1.0, "shift_y": 0.0, "scale_xz": 1.0, "shift_xz": 0.0},
        {"scale_y": 1.17, "shift_y": -23.0, "scale_xz": 0.88, "shift_xz": 11.0},
    ],
)
def test_deform_coords_set_equal(rng, deform):
    coords = rng.uniform(2, 28, (300, 3)).astype(np.float32)
    voxel_shape = (32, 32, 32)
    image_hw = (40, 40)

    ref = _np_deform(coords.astype(np.float64), image_hw, voxel_shape, deform)
    # in-bounds filter as the reference applies downstream
    ok = (
        (ref[:, 0] >= 0) & (ref[:, 0] < voxel_shape[2])
        & (ref[:, 1] >= 0) & (ref[:, 1] < voxel_shape[1])
        & (ref[:, 2] >= 0) & (ref[:, 2] < voxel_shape[0])
    )
    ref_set = set(map(tuple, ref[ok]))

    d = jnp.asarray(
        [deform["scale_y"], deform["shift_y"], deform["scale_xz"], deform["shift_xz"]],
        jnp.float32,
    )
    out, valid = deform_coords(
        jnp.asarray(coords), jnp.ones(len(coords), bool), image_hw, voxel_shape, d
    )
    ours_set = set(map(tuple, np.asarray(out)[np.asarray(valid)]))
    # float32 vs float64 rounding can flip a handful of exact .5 boundaries
    sym_diff = len(ref_set ^ ours_set)
    assert sym_diff <= max(2, len(ref_set) // 200), (sym_diff, len(ref_set))


def test_build_deformed_grid_identity(rng):
    grid = np.zeros((16, 16, 16), np.uint8)
    pid = config.PART_IDS["dome"]
    grid[4:8, 5:9, 6:10] = pid
    d0, d1, d2 = np.where(grid > 0)
    pts = np.stack([d2, d1, d0], 1).astype(np.float32)
    part_points = {"dome": (pts, np.ones(len(pts), bool))}
    deforms = {"dome": np.array([1, 0, 1, 0], np.float32)}
    out = build_deformed_grid(grid, part_points, deforms, (16, 16))
    # identity deform must reproduce the part (up to jitter-rounding growth)
    assert set(map(tuple, np.argwhere(out == pid))) >= set(map(tuple, np.argwhere(grid == pid)))


def test_optimize_part_deform_recovers_shift():
    # Build a grid whose dome projects offset from the GT mask; the search
    # should find a deform that improves IoU over identity.
    grid = np.zeros((48, 48, 48), np.uint8)
    pid = config.PART_IDS["dome"]
    grid[20:28, 8:20, 20:28] = pid
    H = W = 48
    mask = np.zeros((H, W), np.uint8)
    mask[18:34, 18:34] = pid  # taller GT than the part projects
    cam = {
        "cam_pos": np.array([24.0, 24.0, -120.0]),
        "target": np.array([24.0, 24.0, 24.0]),
        "f": 100.0, "cx": 24.0, "cy": 24.0,
    }
    best, iou = optimize_part_deform(
        grid, "dome", mask, cam, search_stride=1, chunk=32,
        scale_range=(0.8, 1.2, 3), shift_range=(-20, 20, 5), refine_steps=3,
    )
    from pbr3d.deform.search import _batch_deform_iou, IDENTITY_DEFORM
    import jax.numpy as jnp
    from pbr3d.camera.geometry import params_to_vector
    from pbr3d.carving.voxel import points_by_parts, pad_points, bucket_size
    pts, _ = points_by_parts(grid, ["dome"])
    p, _, v = pad_points(pts, np.zeros(len(pts), np.uint8), bucket_size(len(pts)))
    Hp = Wp = 128  # the search pads planes to 128-multiples
    gt_p = np.zeros((Hp, Wp), mask.dtype)
    gt_p[:H, :W] = mask
    iou_id = float(_batch_deform_iou(
        jnp.asarray(IDENTITY_DEFORM)[None], jnp.asarray(p), jnp.asarray(v),
        params_to_vector(cam), jnp.asarray(gt_p), jnp.int32(pid),
        jnp.asarray([H, W], jnp.int32), jnp.asarray([48, 48, 48], jnp.int32),
        Hp, Wp,
    )[0])
    assert iou >= iou_id


def _simple_cam(size):
    c = size / 2.0
    return {
        "cam_pos": np.array([c, c, -2.5 * size]),
        "target": np.array([c, c, c]),
        "f": 2.0 * size, "cx": c, "cy": c,
    }


def test_visible_objective_respects_occlusion():
    """A fully occluded part must score ~0 visible IoU even where its
    unoccluded splat would overlap the GT perfectly (the notebook-4
    z-test, eval_helpers_intra.py:168-190)."""
    from pbr3d.carving.voxel import bucket_size, pad_points
    from pbr3d.camera.geometry import params_to_vector
    from pbr3d.deform.search import _batch_deform_visible_iou, IDENTITY_DEFORM

    size = 32
    grid = np.zeros((size, size, size), np.uint8)
    pid = config.PART_IDS["dome"]
    grid[16:20, 10:20, 10:20] = pid  # the part, at depth z=16..19
    d0, d1, d2 = np.where(grid == pid)
    pts = np.stack([d2, d1, d0], 1).astype(np.float32)
    p, _, v = pad_points(pts, np.zeros(len(pts), np.uint8), bucket_size(len(pts)))
    cam = _simple_cam(size)
    H = W = size
    Hp = Wp = 128
    gt = np.zeros((Hp, Wp), bool)
    gt[12:20, 12:20] = True

    kw = dict(
        coords=jnp.asarray(p), valid=jnp.asarray(v),
        cam_vec=params_to_vector(cam), gt_part=jnp.asarray(gt),
        true_hw=jnp.asarray([H, W], np.int32),
        voxel_shape=jnp.asarray([size, size, size], np.int32),
        center=jnp.asarray(pts.mean(axis=0), jnp.float32),
        H=Hp, W=Wp,
    )
    no_occ = np.full((Hp, Wp), np.inf, np.float32)
    iou_free = float(_batch_deform_visible_iou(
        jnp.asarray(IDENTITY_DEFORM)[None], rest_zbuf=jnp.asarray(no_occ), **kw)[0])
    assert iou_free > 0.3

    # an occluder covering the whole image closer than any part point
    occ = np.full((Hp, Wp), 1.0, np.float32)
    iou_occ = float(_batch_deform_visible_iou(
        jnp.asarray(IDENTITY_DEFORM)[None], rest_zbuf=jnp.asarray(occ), **kw)[0])
    assert iou_occ == 0.0


def test_refine_parts_pins_minarets_and_applies_overrides():
    from pbr3d.deform.search import refine_parts, IDENTITY_DEFORM

    size = 48
    grid = np.zeros((size, size, size), np.uint8)
    mid = config.PART_IDS["front_minarets"]
    did = config.PART_IDS["dome"]
    grid[20:28, 8:40, 4:10] = mid
    grid[20:28, 8:20, 20:28] = did
    mask = np.zeros((size, size), np.uint8)
    mask[6:40, 2:12] = mid
    mask[16:34, 18:34] = did
    cam = _simple_cam(size)

    forced = {"scale_y": 1.05, "shift_y": 2.0, "scale_xz": 0.95, "shift_xz": -1.0}
    out = refine_parts(
        grid, mask, cam,
        part_names=["front_minarets", "dome"],
        overrides={"dome": forced},
        search_stride=1, chunk=16,
        scale_range=(0.9, 1.1, 3), shift_range=(-10, 10, 3), refine_steps=3,
    )
    # minarets pinned to identity (notebook-4 minarets row uses INIT points)
    assert np.allclose(
        [out["front_minarets"]["deform"][k]
         for k in ("scale_y", "shift_y", "scale_xz", "shift_xz")],
        IDENTITY_DEFORM,
    )
    # overrides taken verbatim, no search
    for k, val in forced.items():
        assert out["dome"]["deform"][k] == pytest.approx(val)
    assert 0.0 <= out["dome"]["iou"] <= 1.0


def test_deform_coords_approx_matches_exact_zbuffer():
    """The approx (float, no-jitter) warp must track the exact warp's
    geometry: warped float coords round to a subset of the exact output."""
    rng = np.random.default_rng(1)
    coords = rng.uniform(2, 28, (200, 3)).astype(np.float32)
    d = jnp.asarray([1.2, -5.0, 0.9, 3.0], jnp.float32)
    exact, v_e = deform_coords(
        jnp.asarray(coords), jnp.ones(200, bool), (40, 40), (32, 32, 32), d
    )
    approx, v_a = deform_coords(
        jnp.asarray(coords), jnp.ones(200, bool), (40, 40), (32, 32, 32), d,
        approx=True,
    )
    assert approx.shape == (200, 3) and approx.dtype == jnp.float32
    exact_set = set(map(tuple, np.asarray(exact)[np.asarray(v_e)]))
    rounded = np.round(np.asarray(approx)[np.asarray(v_a)]).astype(int)
    assert set(map(tuple, rounded)) <= exact_set


def test_penalized_objective_guards_neighbors():
    """The ensemble objective must charge a candidate for occluding a
    neighbor: both the neighbor's lost visible-IoU (gain term) and the
    below-floor hinge, relative to a state where the neighbor stays fully
    visible under the SAME bundle."""
    from pbr3d.camera.geometry import params_to_vector
    from pbr3d.carving.voxel import bucket_size, pad_points
    from pbr3d.deform.search import (
        IDENTITY_DEFORM, NEIGHBOR_PENALTY, _batch_deform_visible_iou_penalized,
    )

    size = 32
    pid = config.PART_IDS["dome"]
    grid = np.zeros((size, size, size), np.uint8)
    grid[16:20, 10:20, 10:20] = pid
    d0, d1, d2 = np.where(grid == pid)
    pts = np.stack([d2, d1, d0], 1).astype(np.float32)
    p, _, v = pad_points(pts, np.zeros(len(pts), np.uint8), bucket_size(len(pts)))
    cam = _simple_cam(size)
    H = W = size
    Hp = Wp = 128
    gt = np.zeros((Hp, Wp), bool)
    gt[12:20, 12:20] = True

    # one neighbor whose z-buffer sits just BEHIND the part and whose floor
    # is 1.0: any deform keeping the part in front of it drops it to 0
    Q = 8
    h2, w2 = Hp // 2, Wp // 2
    nb_zb = np.full((Q, h2, w2), np.inf, np.float32)
    nb_base = np.zeros((Q, h2, w2), bool)
    nb_gt = np.zeros((Q, h2, w2), bool)
    nb_floor = np.zeros((Q,), np.float32)
    nb_valid = np.zeros((Q,), bool)
    nb_zb[0] = 1e9  # far behind: always blocked by the part
    nb_base[0, :16, :16] = True
    nb_gt[0, :16, :16] = True
    nb_floor[0] = 1.0
    nb_valid[0] = True

    kw = dict(
        coords=jnp.asarray(p), valid=jnp.asarray(v),
        cam_vec=params_to_vector(cam), gt_part=jnp.asarray(gt),
        rest_zbuf=jnp.asarray(np.full((Hp, Wp), np.inf, np.float32)),
        true_hw=jnp.asarray([H, W], np.int32),
        voxel_shape=jnp.asarray([size, size, size], np.int32),
        center=jnp.asarray(pts.mean(axis=0), jnp.float32),
        nb_zb=jnp.asarray(nb_zb), nb_base=jnp.asarray(nb_base),
        nb_gt=jnp.asarray(nb_gt), nb_floor=jnp.asarray(nb_floor),
        nb_valid=jnp.asarray(nb_valid), H=Hp, W=Wp,
    )

    def comb(out, w=1.0):
        # the device returns (own, gain, drop) components per candidate
        o = np.asarray(out[0], np.float64)
        return float(o[0] + w * o[1] - NEIGHBOR_PENALTY * o[2])

    scored = comb(_batch_deform_visible_iou_penalized(
        jnp.asarray(IDENTITY_DEFORM)[None], **kw))
    # with no valid neighbors the neighbor terms vanish -> own IoU only
    kw2 = dict(kw, nb_valid=jnp.asarray(np.zeros((Q,), bool)))
    plain = comb(_batch_deform_visible_iou_penalized(
        jnp.asarray(IDENTITY_DEFORM)[None], **kw2))
    assert plain > 0.3
    # same bundle, but the neighbor sits IN FRONT of the part everywhere:
    # never occluded -> full gain (iou_q = 1), no hinge
    kw3 = dict(kw, nb_zb=jnp.asarray(np.where(np.isfinite(nb_zb), -1e9,
                                              np.inf).astype(np.float32)))
    free = comb(_batch_deform_visible_iou_penalized(
        jnp.asarray(IDENTITY_DEFORM)[None], **kw3))
    assert free == pytest.approx(plain + 1.0, abs=1e-5)
    # the part blocks a strip of the neighbor's GT: the candidate is charged
    # the neighbor's IoU drop AND 3x the below-floor hinge on top
    assert scored < free - 0.05
    drop = 1.0 - (scored - plain)  # gain - 3*hinge, hinge = drop here
    assert drop > 0  # some occlusion actually happened in this geometry


def test_enforce_no_regression_reverts_offender():
    """A forced bad deform on one part that collapses a neighbor's nb4 cell
    must be reverted by the exact verify loop."""
    from pbr3d.deform.search import IDENTITY_DEFORM
    from pbr3d.deform.verify import enforce_no_regression, nb4_exact_cells
    from pbr3d.deform.warp import build_deformed_grid

    size = 48
    grid = np.zeros((size, size, size), np.uint8)
    did = config.PART_IDS["dome"]
    wid = config.PART_IDS["windows"]
    # windows strip in FRONT (small z), dome behind it; the dome is deep
    # enough that a large xz scale pushes its near face in front of the
    # windows strip
    grid[4:8, 10:30, 10:30] = wid
    grid[9:31, 10:30, 10:30] = did
    mask = np.zeros((size, size), np.uint8)
    mask[10:30, 10:30] = wid  # GT: windows own the square
    cam = _simple_cam(size)

    def pts_of(part):
        d0, d1, d2 = np.where(grid == config.PART_IDS[part])
        return np.stack([d2, d1, d0], 1).astype(np.float32)

    part_points = {
        p: (pts_of(p), np.ones(len(pts_of(p)), bool)) for p in ("dome", "windows")
    }

    def build_fn(vecs):
        return build_deformed_grid(grid, part_points, vecs, (size, size))

    # force the dome forward/up so it occludes the windows (z shift is not a
    # DoF, so scale it hugely: its shell reaches in front of the windows)
    deforms = {
        "dome": {"deform": {"scale_y": 1.0, "shift_y": 0.0,
                            "scale_xz": 3.0, "shift_xz": 0.0}, "iou": 0.9},
        "windows": {"deform": {"scale_y": 1.0, "shift_y": 0.0,
                               "scale_xz": 1.0, "shift_xz": 0.0}, "iou": 0.9},
    }
    before = nb4_exact_cells(grid, build_fn({
        "dome": np.array([1, 0, 3.0, 0], np.float32),
        "windows": IDENTITY_DEFORM,
    }), mask, cam)
    assert before["windows"][1] + 1e-6 < before["windows"][0]  # setup sanity

    out, grid_def = enforce_no_regression(grid, deforms, mask, cam, build_fn)
    assert out["dome"]["deform"]["scale_xz"] == 1.0  # offender reverted
    after = nb4_exact_cells(grid, grid_def, mask, cam)
    assert after["windows"][1] + 1e-6 >= after["windows"][0]


def test_point_set_identity_zbuffers_match_dense_grid():
    """The search's identity z-buffers (point-set segment reduction) must
    equal the verify's dense-grid reduction bit-for-bit — the zb_i-reuse
    path in enforce_no_regression depends on this equivalence."""
    from pbr3d.camera.geometry import params_to_vector
    from pbr3d.carving.voxel import bucket_size
    from pbr3d.deform.search import all_part_zbuffers
    from pbr3d.deform.verify import _part_zbufs_grid

    rng = np.random.default_rng(3)
    size = 40
    grid = np.zeros((size, size, size), np.uint8)
    did, wid = config.PART_IDS["dome"], config.PART_IDS["windows"]
    grid[rng.random((size,) * 3) < 0.05] = did
    grid[rng.random((size,) * 3) < 0.03] = wid
    cam = _simple_cam(size)
    H = W = size
    from pbr3d.deform.search import _pad_plane_hw

    Hp, Wp = _pad_plane_hw(H, W)
    parts = ["dome", "windows"]

    d0, d1, d2 = np.where(grid > 0)
    pts = np.stack([d2, d1, d0], 1).astype(np.int16)
    labs = grid[d0, d1, d2]
    n = bucket_size(len(pts))
    pa = np.zeros((n, 3), np.int16)
    la = np.zeros((n,), np.uint8)
    va = np.zeros((n,), bool)
    pa[: len(pts)] = pts
    la[: len(pts)] = labs
    va[: len(pts)] = True
    zb_pts = all_part_zbuffers(
        pa, la, va, params_to_vector(cam), parts,
        np.asarray([H, W], np.int32), Hp, Wp,
    )
    zb_dense = _part_zbufs_grid(grid, cam, H, W, parts)
    for p in parts:
        np.testing.assert_array_equal(zb_pts[p], zb_dense[p])


def test_build_deformed_grid_fused_matches_sequential():
    """The one-dispatch rebuild must reproduce the sequential per-part
    scatter exactly, including cross-part collision priority (later parts
    in the order win)."""
    from pbr3d.deform.warp import build_deformed_grid, build_deformed_grid_fused

    rng = np.random.default_rng(3)
    size = 32
    grid = np.zeros((size, size, size), np.uint8)
    did = config.PART_IDS["dome"]
    wid = config.PART_IDS["windows"]
    grid[8:16, 8:20, 8:20] = did
    grid[14:22, 10:18, 10:18] = wid  # overlaps the dome band after deforms

    def pts_of(pid):
        d0, d1, d2 = np.where(grid == pid)
        return np.stack([d2, d1, d0], 1).astype(np.float32)

    part_points = {
        "dome": (pts_of(did), np.ones(len(pts_of(did)), bool)),
        "windows": (pts_of(wid), np.ones(len(pts_of(wid)), bool)),
    }
    deforms = {
        "dome": np.array([1.15, -3.0, 1.1, 2.0], np.float32),
        "windows": np.array([0.9, 4.0, 1.05, -1.0], np.float32),
    }
    centers = {p: part_points[p][0].mean(axis=0) for p in part_points}

    seq = build_deformed_grid(grid, part_points, deforms, (size, size))
    fused = np.asarray(build_deformed_grid_fused(
        part_points, deforms, centers, (size, size), grid.shape,
        ["dome", "windows"],
    ))
    np.testing.assert_array_equal(seq, fused)


def test_refine_parts_table_matches_cache_path():
    """The device point-table path must reproduce the host PointCache path:
    same searched deforms, same reported IoUs."""
    from pbr3d.deform.search import refine_parts
    from pbr3d.ops.point_table import build_point_table

    size = 48
    grid = np.zeros((size, size, size), np.uint8)
    mid = config.PART_IDS["front_minarets"]
    did = config.PART_IDS["dome"]
    wid = config.PART_IDS["windows"]
    grid[20:28, 8:40, 4:10] = mid
    grid[20:28, 8:20, 20:28] = did
    grid[10:16, 22:30, 12:18] = wid
    mask = np.zeros((size, size), np.uint8)
    mask[6:40, 2:12] = mid
    mask[16:34, 18:34] = did
    mask[20:32, 10:20] = wid
    cam = _simple_cam(size)

    kw = dict(
        part_names=["front_minarets", "dome", "windows"],
        search_stride=1, chunk=16,
        scale_range=(0.9, 1.1, 3), shift_range=(-10, 10, 3), refine_steps=3,
    )
    out_cache = refine_parts(grid, mask, cam, **kw)
    table = build_point_table(grid)
    out_table = refine_parts(grid, mask, cam, table=table, **kw)
    assert set(out_cache) == set(out_table)
    for p in out_cache:
        for k in ("scale_y", "shift_y", "scale_xz", "shift_xz"):
            assert out_table[p]["deform"][k] == pytest.approx(
                out_cache[p]["deform"][k], abs=1e-5), (p, k)
        assert out_table[p]["iou"] == pytest.approx(
            out_cache[p]["iou"], abs=1e-5), p


def test_resweep_never_lowers_ensemble_total():
    """The conditioning resweeps accept a move only if the joint (ensemble)
    score improves, so re-searching under the final z-buffers must not
    lose table total vs stopping after the first pass (the coordinate-
    ascent property of the round-3 ensemble objective).  Tolerance covers
    the half-res neighbor terms in the accept model."""
    from pbr3d.deform.search import refine_parts

    size = 48
    grid = np.zeros((size, size, size), np.uint8)
    did = config.PART_IDS["dome"]
    wid = config.PART_IDS["windows"]
    mdid = config.PART_IDS["main_door"]
    # three interacting parts at staggered depths; every GT square is
    # offset/larger than its part's footprint so every part wants to move
    grid[10:16, 20:32, 12:24] = wid
    grid[18:30, 8:24, 14:30] = did
    grid[18:26, 24:38, 18:28] = mdid
    mask = np.zeros((size, size), np.uint8)
    mask[6:26, 12:28] = did
    mask[26:36, 14:26] = wid
    mask[28:40, 26:38] = mdid
    cam = _simple_cam(size)

    kw = dict(
        part_names=["dome", "windows", "main_door"],
        search_stride=1, chunk=16,
        scale_range=(0.8, 1.2, 3), shift_range=(-10, 10, 3), refine_steps=3,
    )
    out1 = refine_parts(grid, mask, cam, sweeps=1, **kw)
    out2 = refine_parts(grid, mask, cam, sweeps=2, **kw)
    total1 = sum(d["iou"] for d in out1.values())
    total2 = sum(d["iou"] for d in out2.values())
    assert total2 >= total1 - 0.02, (total1, total2, out1, out2)


def test_dual_dedup_equivalence():
    """The portfolio-dedup soundness claim: when the dual-scored greedy
    pass 0 reports diverged=False, the ensemble-start chain
    (first_gain_w=1) must produce IDENTICAL deforms; when it reports
    diverged=True, the two chains are allowed to differ.  Checked on two
    scenes: a benign one and the staggered-occlusion scene."""
    from pbr3d.deform.search import refine_parts

    def build_scene(staggered):
        size = 48
        grid = np.zeros((size, size, size), np.uint8)
        did = config.PART_IDS["dome"]
        wid = config.PART_IDS["windows"]
        grid[10:16, 20:32, 12:24] = wid
        grid[18:30, 8:24, 14:30] = did
        mask = np.zeros((size, size), np.uint8)
        if staggered:  # GT offset from footprints: parts compete
            mask[6:26, 12:28] = did
            mask[26:36, 14:26] = wid
        else:  # GT on the identity footprints: no one needs to move
            mask[8:24, 14:30] = did
            mask[20:32, 12:24] = wid
        return grid, mask

    kw = dict(
        part_names=["dome", "windows"],
        search_stride=1, chunk=16,
        scale_range=(0.8, 1.2, 3), shift_range=(-10, 10, 3), refine_steps=3,
    )
    cam = _simple_cam(48)
    for staggered in (False, True):
        grid, mask = build_scene(staggered)
        flags = {}
        out_g = refine_parts(grid, mask, cam, first_gain_w=0.0,
                             dual_gain_w=1.0,
                             pass0_done=lambda d: flags.update(d=d), **kw)
        assert "d" in flags
        if not flags["d"]:
            out_e = refine_parts(grid, mask, cam, first_gain_w=1.0, **kw)
            assert out_g == out_e, (staggered, out_g, out_e)


def test_resweep_window_mode_runs_and_holds_floors():
    """resweep_window=(span, n) replaces the resweeps' global coarse sweep
    with local offset grids around each incumbent; the output must still be
    a valid no-regression state (every searched part at or above its
    all-identity floor — the refine_parts verify invariant)."""
    from pbr3d.deform.search import refine_parts

    size = 48
    grid = np.zeros((size, size, size), np.uint8)
    did = config.PART_IDS["dome"]
    wid = config.PART_IDS["windows"]
    grid[10:16, 20:32, 12:24] = wid
    grid[18:30, 8:24, 14:30] = did
    mask = np.zeros((size, size), np.uint8)
    mask[6:26, 12:28] = did
    mask[26:36, 14:26] = wid
    cam = _simple_cam(48)
    kw = dict(
        part_names=["dome", "windows"],
        search_stride=1, chunk=16,
        scale_range=(0.8, 1.2, 3), shift_range=(-10, 10, 3), refine_steps=3,
    )
    out_full = refine_parts(grid, mask, cam, **kw)
    out_win = refine_parts(grid, mask, cam, resweep_window=(1.5, 5), **kw)
    assert set(out_win) == set(out_full)
    # both states hold the verify invariant; the windowed resweep must not
    # collapse the table vs the full resweep on this small scene
    tot_full = sum(d["iou"] for d in out_full.values())
    tot_win = sum(d["iou"] for d in out_win.values())
    assert tot_win >= tot_full - 0.05, (tot_full, tot_win)


def test_pass0_prefix_reuse_identical():
    """Chain-B prefix adoption soundness: when the dual-scored greedy pass 0
    diverges at part k, an ensemble chain run with the snapshot prefix
    (skipping the re-search of parts 0..k-1) must produce EXACTLY the state
    of an ensemble chain run from scratch — the dual scoring proved every
    decision before k agreed under both gain weights."""
    from pbr3d.deform.search import refine_parts

    size = 48
    grid = np.zeros((size, size, size), np.uint8)
    did = config.PART_IDS["dome"]
    wid = config.PART_IDS["windows"]
    pid = config.PART_IDS["plinth"]
    # three stacked parts with GT offset from the footprints so the greedy
    # and ensemble objectives disagree somewhere past the first part
    grid[6:12, 34:44, 16:28] = pid
    grid[10:16, 20:32, 12:24] = wid
    grid[18:30, 8:24, 14:30] = did
    mask = np.zeros((size, size), np.uint8)
    mask[4:24, 12:28] = did
    mask[24:34, 14:26] = wid
    mask[36:46, 14:30] = pid
    cam = _simple_cam(size)
    kw = dict(
        part_names=["dome", "windows", "plinth"],
        search_stride=1, chunk=16,
        scale_range=(0.8, 1.2, 3), shift_range=(-10, 10, 3), refine_steps=3,
    )
    flags, snap = {}, {}
    refine_parts(grid, mask, cam, first_gain_w=0.0, dual_gain_w=1.0,
                 pass0_done=lambda d: flags.update(d=d),
                 pass0_snapshot_out=snap, **kw)
    assert "d" in flags
    out_full = refine_parts(grid, mask, cam, first_gain_w=1.0, **kw)
    if flags["d"] and snap.get("idx"):
        out_pre = refine_parts(grid, mask, cam, first_gain_w=1.0,
                               pass0_prefix=snap, **kw)
        assert out_pre == out_full, (snap["idx"], out_pre, out_full)
    else:
        # scene did not produce a mid-chain divergence: the prefix path is
        # then never taken in production either; record why for debugging
        assert flags["d"] is not None


def test_rigid_consistency_seed_matches_warp_algebra():
    """The follow-the-leader seed must move part p's centroid EXACTLY as
    part q's warp would move that same point (the derivation in
    rigid_consistency_seed's docstring), for any pivot offset and params."""
    from pbr3d.deform.search import rigid_consistency_seed

    rng = np.random.default_rng(7)
    H_img, W_img = 97, 83
    voxel_shape = (64, 80, 64)  # (D, H, W)
    py = voxel_shape[1] / H_img

    def warp_y(y, pivot_y, sy, dy):
        return (y - pivot_y) * sy + pivot_y - dy * py

    for _ in range(20):
        cq = rng.uniform(5, 60, 3).astype(np.float32)
        cp = rng.uniform(5, 60, 3).astype(np.float32)
        dq = np.array([rng.uniform(0.5, 2.0), rng.uniform(-40, 40),
                       rng.uniform(0.5, 2.0), rng.uniform(-20, 20)],
                      np.float32)
        seed = rigid_consistency_seed(dq, cp, cq, py)
        # q's warp applied to p's centroid y == p's own warp (pivot cp) at
        # its centroid under the seed params
        y_by_q = warp_y(cp[1], cq[1], dq[0], dq[1])
        y_by_seed = warp_y(cp[1], cp[1], seed[0], seed[1])
        np.testing.assert_allclose(y_by_seed, y_by_q, rtol=0, atol=1e-3)
        # scales and xz shift copy
        assert seed[0] == dq[0] and seed[2] == dq[2] and seed[3] == dq[3]

    # the measured Taj-at-golden-res case from the fitted golden deforms:
    # full_building (1.13, -3, 1.12, 0), chhatris centroid ~86 voxels above
    # the building centroid (y-up), py≈0.66 -> the seed's shift_y lands in
    # the human's chhatris basin (golden fit: -17.1)
    seed = rigid_consistency_seed(
        np.array([1.13, -3.0, 1.12, 0.0], np.float32),
        np.array([256.0, 240.0, 256.0], np.float32),
        np.array([256.0, 168.0, 256.0], np.float32),
        338 / 512,
    )
    assert -25.0 < seed[1] < -12.0, seed


def test_batched_refine_matches_serial():
    """Two concurrent refine_parts chains sharing a DeformEvalBatcher must
    produce BIT-IDENTICAL deforms/IoUs to the serial unbatched path: the
    scene-stacked grouped program is a `jax.vmap` over per-slot computations
    that reproduce the single-monument programs op-for-op
    (pbr3d/deform/batched.py), so batch composition cannot change results."""
    from concurrent.futures import ThreadPoolExecutor

    from pbr3d.deform.batched import DeformEvalBatcher
    from pbr3d.deform.search import refine_parts
    from pbr3d.ops.point_table import build_point_table

    size = 48
    mid = config.PART_IDS["front_minarets"]
    did = config.PART_IDS["dome"]
    wid = config.PART_IDS["windows"]

    grids, masks = [], []
    g = np.zeros((size, size, size), np.uint8)
    g[20:28, 8:40, 4:10] = mid
    g[20:28, 8:20, 20:28] = did
    g[10:16, 22:30, 12:18] = wid
    m = np.zeros((size, size), np.uint8)
    m[6:40, 2:12] = mid
    m[16:34, 18:34] = did
    m[20:32, 10:20] = wid
    grids.append(g); masks.append(m)
    g2 = np.zeros((size, size, size), np.uint8)
    g2[18:30, 10:38, 6:12] = mid
    g2[16:30, 10:22, 18:30] = did
    g2[8:18, 20:32, 10:16] = wid
    m2 = np.zeros((size, size), np.uint8)
    m2[8:38, 4:14] = mid
    m2[14:36, 16:36] = did
    m2[18:34, 8:18] = wid
    grids.append(g2); masks.append(m2)

    cam = _simple_cam(size)
    kw = dict(
        part_names=["front_minarets", "dome", "windows"],
        search_stride=1, chunk=16,
        scale_range=(0.9, 1.1, 3), shift_range=(-10, 10, 3), refine_steps=3,
    )

    serial = [refine_parts(gr, mk, cam, table=build_point_table(gr), **kw)
              for gr, mk in zip(grids, masks)]

    batcher = DeformEvalBatcher(window_s=0.05)
    with ThreadPoolExecutor(max_workers=2) as ex:
        futs = [
            ex.submit(refine_parts, gr, mk, cam,
                      table=build_point_table(gr), batcher=batcher, **kw)
            for gr, mk in zip(grids, masks)
        ]
        batched = [f.result() for f in futs]

    assert batcher.dispatches > 0
    for s, b in zip(serial, batched):
        assert set(s) == set(b)
        for p in s:
            assert s[p]["deform"] == b[p]["deform"], p
            assert s[p]["iou"] == b[p]["iou"], p
