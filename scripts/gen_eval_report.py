#!/usr/bin/env python
"""Refresh the notebook-4 table blocks inside EVAL_REPORT.md in place.

Regenerates the three ```-fenced table blocks (ours @256, ours @golden,
reference goldens) from the CURRENT artifacts, leaving every hand-written
analysis section (parity methodology, capability analysis, control
experiments) untouched.  Replaces the old whole-file generator that would
have clobbered them.

Run from /root/repo:  python scripts/gen_eval_report.py
"""
import contextlib
import io
import os
import re
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

from pbr3d.eval.intra import (
    run_minaret_iou_evaluation,
    run_minaret_kp_evaluation,
    run_part_minaret_binary_iou,
)

MON = ["Taj", "Bibi", "Itimad", "Akbar", "Charminar"]
REPORT = "/root/repo/EVAL_REPORT.md"


def capture(fn, *a, **k):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fn(*a, **k)
    return buf.getvalue()


def tables(root):
    kw = dict(monuments=MON, view="front",
              root_voxels=f"{root}/1.Orthographic_Voxel_Carving",
              root_masks="/root/reference/data",
              cam_dir=f"{root}/2.Perspective_Camera_Estimation")
    out = [capture(run_minaret_kp_evaluation, **kw),
           capture(run_minaret_iou_evaluation, **kw),
           capture(run_part_minaret_binary_iou,
                   deformed_voxels=f"{root}/3.Part-wise_3D_Refinement", **kw)]
    return "\n".join(out)


def replace_block(text, heading_prefix, new_body):
    """Swap the first ```-fenced block after the heading that starts with
    ``heading_prefix``; returns the updated text (error if not found)."""
    h = text.find(heading_prefix)
    if h < 0:
        raise SystemExit(f"heading not found: {heading_prefix!r}")
    a = text.index("```", h)
    b = text.index("```", a + 3)
    return text[: a + 3] + "\n" + new_body.rstrip("\n") + "\n" + text[b:]


def main():
    text = open(REPORT).read()
    text = replace_block(
        text, "## pbr3d pipeline output (results_temp,",
        tables("/root/repo/results_temp"))
    g = "/root/repo/results_temp_golden"
    if all(os.path.exists(
            f"{g}/3.Part-wise_3D_Refinement/{m}_deformed_voxel_grid.npz")
           for m in MON):
        text = replace_block(
            text, "## pbr3d pipeline output at GOLDEN resolution",
            tables(g))
    text = replace_block(
        text, "## Reference goldens (results/",
        tables("/root/reference/results"))
    open(REPORT, "w").write(text)
    print("refreshed table blocks in EVAL_REPORT.md")


if __name__ == "__main__":
    main()
