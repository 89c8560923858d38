"""Geometry kernel unit tests, mirroring the reference's unit suite
(test/visvalingam-test.js metric checks, PIP cases from
src/geom/mapshaper-shape-geom.js semantics)."""

import math

import numpy as np
import pytest

from mapshaper_ray.geom import kernels as K


def test_triangle_area():
    assert K.triangle_area(0, 0, 1, 2, 4, 1) == pytest.approx(3.5)
    assert K.triangle_area(0, 0, 1, 1, 2, 2) == 0.0


def test_triangle_area_3d_matches_2d_in_plane():
    a2 = K.triangle_area(0, 0, 1, 2, 4, 1)
    a3 = K.triangle_area_3d(0, 0, 0, 1, 2, 0, 4, 1, 0)
    assert a3 == pytest.approx(a2)


def test_point_seg_dist_sq():
    # perpendicular interior projection
    assert K.point_seg_dist_sq(1, 1, 0, 0, 2, 0) == pytest.approx(1.0)
    # beyond endpoint -> endpoint distance
    assert K.point_seg_dist_sq(3, 1, 0, 0, 2, 0) == pytest.approx(2.0)
    # degenerate segment
    assert K.point_seg_dist_sq(1, 1, 5, 5, 5, 5) == pytest.approx(32.0)


def test_planar_ring_area_orientation():
    # counter-clockwise square (math convention) -> negative in mapshaper
    x = np.array([0, 1, 1, 0, 0], dtype=float)
    y = np.array([0, 0, 1, 1, 0], dtype=float)
    a = K.planar_ring_area(x, y)
    assert abs(a) == pytest.approx(1.0)
    a_rev = K.planar_ring_area(x[::-1], y[::-1])
    assert a_rev == pytest.approx(-a)


def test_spherical_ring_area_hemisphere_scale():
    # a large ring: area positive and within earth's surface area
    lng = np.array([0, 90, 90, 0, 0], dtype=float)
    lat = np.array([0, 0, 45, 45, 0], dtype=float)
    a = abs(K.spherical_ring_area(lng, lat))
    earth = 4 * math.pi * K.R ** 2
    assert 0 < a < earth / 4


def test_points_in_ring_basic():
    # unit square ring
    rx = np.array([0, 1, 1, 0, 0], dtype=float)
    ry = np.array([0, 0, 1, 1, 0], dtype=float)
    px = np.array([0.5, 2.0, 0.5, 0.0, 1.0, 0.5, -0.5])
    py = np.array([0.5, 0.5, 1.0, 0.0, 1.0, 0.0, 0.5])
    res = K.points_in_ring(px, py, rx, ry)
    assert res[0] == 1      # inside
    assert res[1] == 0      # outside
    assert res[2] == -1     # on top edge
    assert res[3] == -1     # on corner vertex
    assert res[4] == -1     # on corner vertex
    assert res[5] == -1     # on bottom edge
    assert res[6] == 0      # outside left


def test_points_in_shape_with_hole():
    outer = (np.array([0, 4, 4, 0, 0], float), np.array([0, 0, 4, 4, 0], float))
    hole = (np.array([1, 3, 3, 1, 1], float), np.array([1, 1, 3, 3, 1], float))
    px = np.array([0.5, 2.0, 3.5, 2.0])
    py = np.array([0.5, 2.0, 3.5, 1.0])
    res = K.points_in_shape(px, py, [outer, hole])
    assert list(res) == [True, False, True, True]  # hole boundary counts in


def test_great_circle_distance_quarter():
    d = K.great_circle_distance(0, 0, 90, 0)
    assert d == pytest.approx(math.pi / 2 * K.R, rel=1e-9)


def test_segment_intersection():
    assert K.segment_intersection(0, 0, 2, 2, 0, 2, 2, 0) == pytest.approx((1.0, 1.0))
    assert K.segment_intersection(0, 0, 1, 1, 2, 2, 3, 3) is None  # collinear
    assert K.segment_intersection(0, 0, 1, 0, 0, 1, 1, 1) is None  # parallel
    assert K.segment_intersection(0, 0, 1, 0, 2, -1, 2, 1) is None  # no touch


def test_ring_centroid_square():
    x = np.array([0, 2, 2, 0, 0], float)
    y = np.array([0, 0, 2, 2, 0], float)
    cx, cy = K.ring_centroid(x, y)
    assert (cx, cy) == pytest.approx((1.0, 1.0))
