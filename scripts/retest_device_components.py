#!/usr/bin/env python
"""Retest the device connected-components path on the current backend.

Round-1 disabled the device CC programs on axon after observing
nondeterministically wrong results (pbr3d/ops/components.py routes to host
scipy under PBR3D_COMPONENTS=auto).  This script re-runs the comparison so
the fallback stays justified — or can be lifted — per VERDICT r1 item 9.

It exercises exactly the ops stage 1 needs: 3-D face-connectivity labeling
(label counts + voxel partitions) and component stats (bbox/centroid/count),
on random volumes and on a real carved monument grid, comparing the DEVICE
path against host scipy.  Label IDs are order-sensitive; the comparison is
partition-equality (same voxel groups), which is what the consumers rely on.

Usage: python scripts/retest_device_components.py [n_random_trials]
Exit code 0 = device path agrees everywhere; 1 = mismatch (repro printed).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def partitions_equal(a: np.ndarray, b: np.ndarray) -> bool:
    """True iff the two labelings induce the same voxel partition."""
    if (a > 0).sum() != (b > 0).sum() or not ((a > 0) == (b > 0)).all():
        return False
    fa, fb = a[a > 0], b[b > 0]
    # map a-label -> b-label must be a bijection constant per component
    pairs = np.unique(np.stack([fa, fb], 1), axis=0)
    return (
        len(np.unique(pairs[:, 0])) == len(pairs)
        and len(np.unique(pairs[:, 1])) == len(pairs)
    )


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    os.environ["PBR3D_COMPONENTS"] = "device"
    import jax

    from pbr3d.ops.components import _host_scipy_label, connected_components

    print(f"backend: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    bad = 0

    for t in range(trials):
        shape = (48, 40, 48) if t % 2 else (96, 80, 96)
        mask = rng.random(shape) > (0.55 + 0.1 * (t % 3))
        for conn in ("face", "full"):
            dev, n_dev = connected_components(mask, conn)
            host, n_host = _host_scipy_label(mask, conn)
            ok = n_dev == n_host and partitions_equal(dev, host)
            if not ok:
                bad += 1
                print(
                    f"MISMATCH trial={t} conn={conn} shape={shape} "
                    f"n_dev={n_dev} n_host={n_host} "
                    f"(seed 0, trial index {t} reproduces)",
                )
        print(f"trial {t}: ok", file=sys.stderr)

    # a real monument grid (the actual stage-1 workload)
    from pbr3d.io.masks import prepare_masks
    from pbr3d.carving.stage1 import global_carve, part_carve
    from pbr3d import config

    masks = prepare_masks("/root/reference/data", "Akbar", "front", 128)
    grid = np.asarray(
        part_carve(
            global_carve(masks.binary, masks.exterior_labels, 90),
            masks.exterior_labels, config.DEFAULT_CARVE_PRESET.group_jobs,
        )
    )
    for part in ("front_minarets", "small_minarets", "dome"):
        m = grid == config.PART_IDS[part]
        if not m.any():
            continue
        dev, n_dev = connected_components(m, "face")
        host, n_host = _host_scipy_label(m, "face")
        ok = n_dev == n_host and partitions_equal(dev, host)
        print(f"Akbar/{part}: n_dev={n_dev} n_host={n_host} {'OK' if ok else 'MISMATCH'}")
        bad += 0 if ok else 1

    if bad:
        print(f"{bad} mismatches — keep the host fallback (PBR3D_COMPONENTS=auto)")
        sys.exit(1)
    print("device CC path agrees with host scipy on all cases")


if __name__ == "__main__":
    main()
