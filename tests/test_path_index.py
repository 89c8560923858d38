"""PathIndex probe tests (spatial-join broadcast index) + cells scheme."""

import numpy as np

from mapshaper_ray.cells import (cell_bounds, cover_bbox, lonlat_to_cell_id,
                                 lonlat_to_quadkey, quadkey_prefix)
from mapshaper_ray.state.path_index import PathIndex


def diamond(cx, cy, r):
    return np.array([[cx + r, cy], [cx, cy + r], [cx - r, cy],
                     [cx, cy - r], [cx + r, cy]], dtype=float)


def test_find_enclosing_feature_basic():
    feats = [[diamond(0, 0, 1)], [diamond(5, 5, 2)]]
    idx = PathIndex.from_features(feats)
    px = np.array([0.0, 5.0, 10.0, 0.9, 5.0])
    py = np.array([0.0, 5.0, 10.0, 0.0, 6.9])
    res = idx.find_enclosing_feature(px, py)
    assert list(res) == [0, 1, -1, 0, 1]


def test_boundary_counts_as_inside():
    idx = PathIndex.from_features([[diamond(0, 0, 1)]])
    res = idx.find_enclosing_feature(np.array([1.0]), np.array([0.0]))
    assert res[0] == 0  # vertex on boundary
    res = idx.find_enclosing_feature(np.array([0.5]), np.array([0.5]))
    assert res[0] == 0  # point on edge


def test_hole_excluded():
    outer = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    hole = np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], dtype=float)
    idx = PathIndex.from_features([[outer, hole]])
    res = idx.find_enclosing_feature(np.array([2.0, 0.5]), np.array([2.0, 0.5]))
    assert res[0] == -1  # inside the hole -> outside the shape
    assert res[1] == 0


def test_null_feature_skipped():
    feats = [None, [diamond(0, 0, 1)]]
    idx = PathIndex.from_features(feats)
    res = idx.find_enclosing_feature(np.array([0.0]), np.array([0.0]))
    assert res[0] == 1


def test_pack_unpack_roundtrip():
    feats = [[diamond(0, 0, 1)], [diamond(5, 5, 2)]]
    idx = PathIndex.from_features(feats)
    idx2 = PathIndex.unpack(idx.pack())
    px = np.random.RandomState(0).uniform(-2, 8, 200)
    py = np.random.RandomState(1).uniform(-2, 8, 200)
    assert np.array_equal(idx.find_enclosing_feature(px, py),
                          idx2.find_enclosing_feature(px, py))


def test_many_points_grid_consistency():
    # grid index must not change results vs brute-force shape test
    from mapshaper_ray.geom.kernels import points_in_shape
    rng = np.random.RandomState(42)
    feats = [[diamond(rng.uniform(-50, 50), rng.uniform(-50, 50),
                      rng.uniform(1, 8))] for _ in range(20)]
    idx = PathIndex.from_features(feats)
    px = rng.uniform(-60, 60, 1000)
    py = rng.uniform(-60, 60, 1000)
    res = idx.find_enclosing_feature(px, py)
    # brute force: lowest enclosing feature id
    brute = np.full(len(px), -1, dtype=np.int64)
    for fid in range(len(feats) - 1, -1, -1):
        d = feats[fid][0]
        inside = points_in_shape(px, py, [(d[:, 0], d[:, 1])])
        brute = np.where(inside, fid, brute)
    assert np.array_equal(res, brute)


# ---------------------------------------------------------------------------
# cells

def test_quadkey_prefix_is_parent():
    lon = np.array([-122.4, 2.35, 139.7])
    lat = np.array([37.8, 48.85, 35.7])
    q8 = lonlat_to_quadkey(lon, lat, 8)
    q4 = lonlat_to_quadkey(lon, lat, 4)
    assert list(quadkey_prefix(q8, 4)) == list(q4)


def test_cell_bounds_roundtrip():
    lon, lat = np.array([-122.4]), np.array([37.8])
    q = lonlat_to_quadkey(lon, lat, 10)[0]
    b = cell_bounds(q)
    assert b[0] <= lon[0] <= b[2]
    assert b[1] <= lat[0] <= b[3]


def test_cover_bbox_contains_point_cell():
    q = lonlat_to_quadkey(np.array([10.0]), np.array([20.0]), 6)[0]
    cover = cover_bbox(5, 15, 15, 25, 6)
    assert q in set(cover)


def test_cell_id_deterministic():
    lon = np.linspace(-179, 179, 100)
    lat = np.linspace(-89, 89, 100)
    a = lonlat_to_cell_id(lon, lat, 12)
    b = lonlat_to_cell_id(lon, lat, 12)
    assert np.array_equal(a, b)
    assert a.dtype == np.uint64
