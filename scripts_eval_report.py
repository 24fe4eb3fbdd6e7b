#!/usr/bin/env python
"""Generate EVAL_REPORT.md: notebook-4 tables over our results_temp artifacts
AND over the reference goldens, side by side."""
import io, sys, contextlib

def capture(fn, *a, **k):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fn(*a, **k)
    return buf.getvalue()

from pbr3d.eval.intra import (
    run_minaret_kp_evaluation, run_minaret_iou_evaluation, run_part_minaret_binary_iou)

MON = ["Taj", "Bibi", "Itimad", "Akbar", "Charminar"]

def tables(root):
    kw = dict(monuments=MON, view="front",
              root_voxels=f"{root}/1.Orthographic_Voxel_Carving",
              root_masks="/root/reference/data",
              cam_dir=f"{root}/2.Perspective_Camera_Estimation")
    out = []
    out.append(capture(run_minaret_kp_evaluation, **kw))
    out.append(capture(run_minaret_iou_evaluation, **kw))
    out.append(capture(run_part_minaret_binary_iou,
                       deformed_voxels=f"{root}/3.Part-wise_3D_Refinement", **kw))
    return "\n".join(out)

sections = []
sections.append("# Intra-method evaluation (notebook 4 tables)\n")
sections.append("## pbr3d pipeline output (results_temp, max_dim=256, fully automated)\n")
sections.append("```\n" + tables("/root/repo/results_temp") + "\n```\n")

import os
_g = "/root/repo/results_temp_golden"
if all(
    os.path.exists(f"{_g}/3.Part-wise_3D_Refinement/{m}_deformed_voxel_grid.npz")
    for m in MON
):
    sections.append(
        "## pbr3d pipeline output at GOLDEN resolution "
        "(results_temp_golden, max_dim=512/128, fully automated)\n"
    )
    sections.append("```\n" + tables(_g) + "\n```\n")

sections.append("## Reference goldens (results/, max_dim=512/128, human-in-the-loop stages 2-3)\n")
sections.append("```\n" + tables("/root/reference/results") + "\n```\n")
open("/root/repo/EVAL_REPORT.md", "w").write("\n".join(sections))
print("written EVAL_REPORT.md")
