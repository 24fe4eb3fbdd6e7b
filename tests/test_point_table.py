"""Device point table vs the host PointCache / np.where oracles."""

import numpy as np
import pytest

from pbr3d import config
from pbr3d.carving.voxel import PointCache, all_points, bucket_size
from pbr3d.ops.point_table import build_point_table


@pytest.fixture(scope="module")
def grid():
    rng = np.random.default_rng(7)
    g = (rng.random((40, 33, 40)) < 0.3).astype(np.uint8) * rng.integers(
        1, 10, (40, 33, 40)
    ).astype(np.uint8)
    return g


@pytest.fixture(scope="module")
def table(grid):
    return build_point_table(grid)


def test_table_matches_all_points(grid, table):
    pts, labels = all_points(grid)
    n = len(pts)
    assert table.n == n
    tv = np.asarray(table.valid)
    assert tv[:n].all() and not tv[n:].any()
    np.testing.assert_array_equal(
        np.asarray(table.coords)[:n].astype(np.float32), pts
    )
    np.testing.assert_array_equal(np.asarray(table.labels)[:n], labels)


def test_table_surface_matches_pointcache(grid, table):
    cache = PointCache(grid)
    n = table.n
    np.testing.assert_array_equal(
        np.asarray(table.surf)[:n], cache._surface
    )


def test_counts_sums_centers(grid, table):
    cache = PointCache(grid)
    for part, pid in config.PART_IDS.items():
        if pid >= 10:
            continue
        pts, _ = cache.points_by_parts([part])
        assert table.count(pid) == len(pts)
        sh, _ = cache.surface_points_by_parts([part])
        assert table.shell_count(pid) == len(sh)
        if len(pts):
            np.testing.assert_allclose(
                table.center(pid),
                pts.astype(np.float64).mean(axis=0),
                rtol=0, atol=1e-12,
            )


def test_windows_match_host_stride(grid, table):
    cache = PointCache(grid)
    for part, pid in config.PART_IDS.items():
        if pid >= 10 or table.count(pid) == 0:
            continue
        pts, _ = cache.points_by_parts([part])
        shell, _ = cache.surface_points_by_parts([part])
        for stride in (1, 3):
            want = pts[::stride]
            cap = bucket_size(len(want))
            got_c, got_v = table.part_window(pid, stride, cap)
            got_c, got_v = np.asarray(got_c), np.asarray(got_v)
            assert got_v.sum() == len(want)
            np.testing.assert_array_equal(
                got_c[: len(want)].astype(np.float32), want
            )
            assert got_v[: len(want)].all()
            want_s = shell[::stride]
            cap = bucket_size(len(want_s))
            got_c, got_v = table.shell_window(pid, stride, cap)
            got_c, got_v = np.asarray(got_c), np.asarray(got_v)
            assert got_v.sum() == len(want_s)
            np.testing.assert_array_equal(
                got_c[: len(want_s)].astype(np.float32), want_s
            )
