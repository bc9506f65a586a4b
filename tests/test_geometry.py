"""Geometry engine tests: even-odd containment, strict boundaries, centroids."""

import numpy as np

from wsinsight_tpu.geometry import MultiPolygon, polygon_area, polygon_centroid


def square(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64)


def test_simple_containment():
    mp = MultiPolygon([square(0, 0, 10, 10)])
    pts = np.array([[5, 5], [0, 5], [10, 5], [-1, 5], [11, 5], [5, 0], [5, 10]])
    got = mp.contains_points(pts)
    # strictly inside only; boundary excluded (shapely `contains` semantics)
    assert got.tolist() == [True, False, False, False, False, False, False]


def test_hole_and_island():
    outer = square(0, 0, 100, 100)
    hole = square(20, 20, 80, 80)
    island = square(40, 40, 60, 60)
    mp = MultiPolygon([outer, hole, island])
    pts = np.array([[10, 10], [30, 30], [50, 50], [90, 90], [25, 50]])
    got = mp.contains_points(pts)
    assert got.tolist() == [True, False, True, True, False]


def test_grid_containment_matches_points():
    rng = np.random.default_rng(0)
    ring = square(3, 7, 57, 43)
    mp = MultiPolygon([ring])
    xs = np.arange(0, 70, 4).astype(float)
    ys = np.arange(0, 50, 3).astype(float)
    grid = mp.contains_grid(xs, ys)
    for i, y in enumerate(ys):
        pts = np.stack([xs, np.full_like(xs, y)], axis=1)
        np.testing.assert_array_equal(grid[i], mp.contains_points(pts))


def test_area_and_centroid():
    ring = square(0, 0, 4, 2)
    assert abs(polygon_area(ring)) == 8
    assert polygon_centroid(ring) == (2.0, 1.0)
    mp = MultiPolygon([square(0, 0, 10, 10), square(2, 2, 4, 4)])
    assert mp.area == 100 - 4


def test_empty():
    mp = MultiPolygon([])
    assert mp.is_empty
    assert mp.contains_points(np.array([[1.0, 1.0]])).tolist() == [False]
