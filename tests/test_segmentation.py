"""Segmentation tooling: crop/symmetry, cleanup, compositing, SAM stubs."""

import numpy as np
import pytest

from pbr3d import config
from pbr3d.segmentation import (
    ImageState,
    MaskEditor,
    apply_crop,
    close_holes,
    find_symmetry_axis,
    rasterize_polygon,
    remove_small_regions_2d,
    sam_box,
    sam_point,
)


def test_apply_crop_symmetric():
    img = np.arange(20 * 30 * 3, dtype=np.uint8).reshape(20, 30, 3)
    out, (L, T, R, B) = apply_crop(img, (5, 2, 12, 18), sym_on=True, sym_x=10)
    # half = max(10-5, 12-10) = 5 -> L=5, R=15
    assert (L, T, R, B) == (5, 2, 15, 18)
    np.testing.assert_array_equal(out, img[2:18, 5:15])
    with pytest.raises(ValueError):
        apply_crop(img, (10, 5, 10, 8))


def test_find_symmetry_axis(rng):
    # Build an image symmetric about column 24 of 40.
    half = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    img = np.zeros((16, 40, 3), np.uint8)
    img[:, 8:24] = half
    img[:, 24:40] = half[:, ::-1]
    axis = find_symmetry_axis(img)
    assert abs(axis - 24) <= 1


def test_cleanup_ops(rng):
    m = np.zeros((40, 40), np.uint8)
    m[5:20, 5:20] = 1
    m[10, 10] = 0  # hole
    m[30, 30] = 1  # speck
    closed = close_holes(m, 3)
    assert closed[10, 10]
    cleaned = remove_small_regions_2d(m, min_area=10)
    assert not cleaned[30, 30] and cleaned[6, 6]


def test_rasterize_polygon():
    sel = rasterize_polygon([(2, 2), (10, 2), (10, 8), (2, 8)], (12, 14))
    assert sel[5, 5] and not sel[0, 0] and not sel[11, 13]
    assert sel.sum() == pytest.approx(6 * 8, rel=0.4)


def test_mask_editor_modes():
    ed = MaskEditor((10, 10), ["dome", "plinth"])
    a = np.zeros((10, 10), bool); a[2:5, 2:5] = True
    b = np.zeros((10, 10), bool); b[3:7, 3:7] = True
    ed.apply(a, "dome", "replace")
    ed.apply(b, "plinth", "add")  # add: only unowned pixels
    assert ed.masks["dome"][3, 3] == 1 and ed.masks["plinth"][3, 3] == 0
    assert ed.masks["plinth"][6, 6] == 1
    ed.apply(b, "plinth", "replace")  # replace: claims from dome
    assert ed.masks["dome"][3, 3] == 0 and ed.masks["plinth"][3, 3] == 1
    ed.apply(a, "plinth", "subtract")
    assert ed.masks["plinth"][3, 3] == 0
    assert ed.undo()  # revert the subtract
    assert ed.masks["plinth"][3, 3] == 1
    rgb = ed.render_color_mask()
    assert tuple(rgb[6, 6]) == config.PART_COLORS["plinth"]
    assert tuple(rgb[0, 0]) == config.PART_COLORS["background"]


def test_sam_wrappers_with_stub():
    class StubPredictor:
        def set_image(self, img):
            self.img = img

        def predict(self, point_coords=None, point_labels=None, box=None,
                    multimask_output=True):
            H, W = self.img.shape[:2]
            masks = np.zeros((3, H, W), bool)
            masks[2, :5, :5] = True
            return masks, np.array([0.1, 0.2, 0.9]), None

    img = np.zeros((8, 8, 3), np.uint8)
    m = sam_point(StubPredictor(), img, 2, 2)
    assert m[0, 0] and not m[6, 6]
    m = sam_box(StubPredictor(), img, (0, 0, 4, 4))
    assert m[0, 0]


def test_image_state_undo(tmp_path):
    import cv2

    img = np.random.default_rng(0).integers(0, 255, (6, 6, 3)).astype(np.uint8)
    p = tmp_path / "x.png"
    cv2.imwrite(str(p), img)
    st = ImageState().load(p)
    st.push_undo()
    st.curr_np = st.curr_np[:3, :3]
    assert st.pop_undo()
    assert st.curr_np.shape == (6, 6, 3)
    assert not ImageState().pop_undo()


@pytest.mark.parametrize("ksize", [3, 5, 7])
def test_close_holes_matches_cv2(rng, ksize):
    """close_holes must equal cv2.morphologyEx MORPH_CLOSE with the dense
    square kernel bit-for-bit, including the border rule
    (reference: interactive_part_segmentation.py:375-378)."""
    import cv2

    m = (rng.random((41, 37)) > 0.6).astype(np.uint8)
    ref = cv2.morphologyEx(m, cv2.MORPH_CLOSE, np.ones((ksize, ksize), np.uint8))
    ours = close_holes(m.astype(bool), ksize)
    np.testing.assert_array_equal(ours.astype(np.uint8), ref)
