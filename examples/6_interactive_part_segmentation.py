#!/usr/bin/env python
"""Notebook 6 — mask authoring, headless.

The reference drives SAM + matplotlib widgets interactively; the same
operations are exposed here as a scriptable flow: symmetric crop, SAM-prompted
(or polygon) part selection, cleanup, composite, save.  SAM requires the
external ``segment_anything`` package + checkpoint; without it, polygon
selections still work.
"""

import argparse

import numpy as np

from pbr3d.segmentation import (
    ImageState,
    MaskEditor,
    apply_crop,
    find_symmetry_axis,
    rasterize_polygon,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image")
    ap.add_argument("--crop", nargs=4, type=int, metavar=("L", "T", "R", "B"))
    ap.add_argument("--part", default="full_building")
    ap.add_argument("--polygon", nargs="+", type=float,
                    help="x0 y0 x1 y1 ... polygon selection in pixels")
    ap.add_argument("--close", type=int, default=0, help="closing kernel size")
    ap.add_argument("--min-area", type=int, default=0)
    args = ap.parse_args()

    st = ImageState().load(args.image)
    st.sym_x = find_symmetry_axis(st.curr_np)
    print(f"symmetry axis: x={st.sym_x}")

    if args.crop:
        st.push_undo()
        st.curr_np, eff = apply_crop(st.curr_np, tuple(args.crop), True, st.sym_x)
        print(f"cropped to {eff}; new shape {st.curr_np.shape}")

    editor = MaskEditor(st.curr_np.shape[:2])
    if args.polygon:
        verts = list(zip(args.polygon[0::2], args.polygon[1::2]))
        sel = rasterize_polygon(verts, st.curr_np.shape[:2])
        editor.apply(sel, args.part, "replace")
        if args.close or args.min_area:
            editor.clean(args.part, args.close or None, args.min_area or None)
        out = editor.save(st.path)
        print(f"saved mask: {out}")


if __name__ == "__main__":
    main()
