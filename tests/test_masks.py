"""Mask loading/preparation vs the reference semantics (cv2 oracle)."""

import cv2
import numpy as np
import pytest

from pbr3d import config
from pbr3d.io.masks import load_mask_rgb, prepare_masks, mask_parts_from_labels


def test_load_mask_nearest(data_root):
    m = load_mask_rgb(data_root, "Bibi", "front", 128)
    # nearest resize: every pixel must be an exact source color
    src = cv2.cvtColor(
        cv2.imread(f"{data_root}/Bibi/masks/Bibi_front_mask.png"), cv2.COLOR_BGR2RGB
    )
    src_colors = set(map(tuple, np.unique(src.reshape(-1, 3), axis=0)))
    out_colors = set(map(tuple, np.unique(m.reshape(-1, 3), axis=0)))
    assert out_colors <= src_colors
    h, w = src.shape[:2]
    s = 128 / max(h, w)
    assert m.shape[:2] == (int(h * s), int(w * s))


def test_prepare_masks_oracle(data_root):
    """prepare_masks vs an independent restatement of the reference recipe."""
    ms = prepare_masks(data_root, "Bibi", "front", 96)

    src = cv2.cvtColor(
        cv2.imread(f"{data_root}/Bibi/masks/Bibi_front_mask.png"), cv2.COLOR_BGR2RGB
    )
    interior = np.zeros(src.shape[:2], bool)
    for p in config.INTERIOR_PARTS:
        interior |= np.all(src == config.PART_COLORS_NP[p], axis=-1)
    ext = src.copy()
    ext[interior] = config.PART_COLORS_NP["full_building"]

    def rz(img):  # the reference's effective resize (INTER_LINEAR quirk)
        h, w = img.shape[:2]
        s = 96 / max(h, w)
        return cv2.resize(img, (int(w * s), int(h * s)), interpolation=cv2.INTER_LINEAR)

    np.testing.assert_array_equal(ms.semantic, rz(src))
    np.testing.assert_array_equal(ms.exterior, rz(ext))
    binary = (
        ~np.all(rz(ext) == config.PART_COLORS_NP["background"], axis=-1)
    ).astype(np.uint8)
    np.testing.assert_array_equal(ms.binary, binary)


def test_label_roundtrip():
    labels = np.array([[0, 1, 5], [10, 11, 3]], np.uint8)
    rgb = config.labels_to_rgb(labels)
    back = config.rgb_to_labels(rgb)
    np.testing.assert_array_equal(labels, back)


def test_mask_parts_from_labels():
    labels = np.array([[1, 2, 3], [4, 10, 11]], np.uint8)
    out = mask_parts_from_labels(labels, ["full_building", "dome"])
    np.testing.assert_array_equal(
        out, np.array([[1, 0, 0], [4, 0, 0]], np.uint8)
    )
