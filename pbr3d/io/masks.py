"""Semantic part-mask loading & preparation.

Host-side (cv2/numpy) — this is dataset IO, not the compute path.  Produces
both exact-RGB arrays (for artifact parity) and compact uint8 label planes
(what the TPU kernels consume).

Semantics preserved from the reference:

* ``load_mask``: BGR PNG -> RGB; optional aspect-preserving resize with
  truncating output dims and true INTER_NEAREST
  (reference: utils/mask_utils.py:14-33).
* ``prepare_masks``: interior->exterior part folding happens at FULL
  resolution before resize (reference: utils/mask_utils.py:48-54); the resize
  inside the prepare path accidentally uses the cv2 default INTER_LINEAR
  because the reference passes the interpolation flag positionally into the
  ``dst`` slot (reference: utils/mask_utils.py:57-60).  Golden stage-1 grids
  were produced with that quirk, so it is replicated by default
  (``quirk_linear_resize=True``); pass False for clean nearest resizing.
* Charminar window-variant override (reference: utils/mask_utils.py:66-71).
* binary silhouette = any pixel whose exterior color != background
  (reference: utils/mask_utils.py:74-76).
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Optional

import cv2
import numpy as np

from pbr3d import config
from pbr3d.config import BACKGROUND_ID, PART_IDS, rgb_to_labels


def _read_rgb(path: str | os.PathLike) -> np.ndarray:
    img = cv2.imread(str(path))
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def _resize_to_max(img: np.ndarray, max_dim: int, linear: bool) -> np.ndarray:
    """Aspect-preserving resize: scale = max_dim / max(h, w), truncating dims."""
    h, w = img.shape[:2]
    s = max_dim / max(h, w)
    interp = cv2.INTER_LINEAR if linear else cv2.INTER_NEAREST
    return cv2.resize(img, (int(w * s), int(h * s)), interpolation=interp)


def load_mask_rgb(
    root_path: str | Path,
    monument_name: str,
    view_name: str,
    max_dim: Optional[int] = None,
) -> np.ndarray:
    """RGB uint8 (H, W, 3) part mask; nearest-resized if max_dim is given."""
    path = Path(root_path) / monument_name / "masks" / f"{monument_name}_{view_name}_mask.png"
    mask = _read_rgb(path)
    if max_dim is not None:
        mask = _resize_to_max(mask, max_dim, linear=False)
    return mask


def load_mask_labels(
    root_path: str | Path,
    monument_name: str,
    view_name: str,
    max_dim: Optional[int] = None,
) -> np.ndarray:
    """uint8 (H, W) label plane version of :func:`load_mask_rgb`."""
    return rgb_to_labels(load_mask_rgb(root_path, monument_name, view_name, max_dim))


@dataclasses.dataclass
class MaskSet:
    """Prepared per-view masks for stage-1 carving.

    RGB fields keep artifact-exact colors; ``*_labels`` fields are the uint8
    label planes fed to the TPU kernels (part ids 1..10, OTHER_ID for blend
    pixels, BACKGROUND_ID for background).
    """

    semantic: np.ndarray  # (H, W, 3) uint8 — full mask (doors/windows kept)
    exterior: np.ndarray  # (H, W, 3) uint8 — interior folded into full_building
    binary: np.ndarray  # (H, W) uint8 {0,1} — carving silhouette
    semantic_labels: np.ndarray  # (H, W) uint8
    exterior_labels: np.ndarray  # (H, W) uint8

    @property
    def hw(self) -> tuple[int, int]:
        return self.binary.shape[:2]


def prepare_masks(
    root_path: str | Path,
    monument_name: str,
    view_name: str = "front",
    max_dim: int = config.MAX_DIM,
    quirk_linear_resize: bool = True,
) -> MaskSet:
    """Load + fold + resize the semantic masks for one monument view.

    Mirrors ``load_and_prepare_masks`` (reference: utils/mask_utils.py:35-87);
    see module docstring for the replicated behaviors.
    """
    mask_dir = Path(root_path) / monument_name / "masks"
    semantic_full = _read_rgb(mask_dir / f"{monument_name}_{view_name}_mask.png")

    # Interior -> exterior folding at full resolution.
    labels_full = rgb_to_labels(semantic_full)
    interior = np.isin(
        labels_full, [PART_IDS[p] for p in config.INTERIOR_PARTS]
    )
    exterior_full = semantic_full.copy()
    exterior_full[interior] = config.PART_COLORS_NP["full_building"]

    semantic = _resize_to_max(semantic_full, max_dim, linear=quirk_linear_resize)
    exterior = _resize_to_max(exterior_full, max_dim, linear=quirk_linear_resize)

    # Charminar window-variant override of the *semantic* (full) mask only.
    if monument_name == "Charminar":
        win_path = mask_dir / f"{monument_name}_{view_name}_mask_win.png"
        if win_path.exists():
            semantic = _resize_to_max(
                _read_rgb(win_path), max_dim, linear=quirk_linear_resize
            )

    semantic_labels = rgb_to_labels(semantic)
    exterior_labels = rgb_to_labels(exterior)
    binary = (exterior_labels != BACKGROUND_ID).astype(np.uint8)

    return MaskSet(
        semantic=semantic,
        exterior=exterior,
        binary=binary,
        semantic_labels=semantic_labels,
        exterior_labels=exterior_labels,
    )


def mask_parts_from_labels(labels: np.ndarray, part_names) -> np.ndarray:
    """Keep only the selected parts of a label plane (others -> 0).

    Label-domain analogue of ``mask_parts_from_image``
    (reference: utils/mask_utils.py:89-97).
    """
    ids = config.part_ids(part_names)
    keep = np.isin(labels, ids)
    return np.where(keep, labels, 0).astype(labels.dtype)
