"""Clip/erase, projections, generators, split/merge tests."""

import numpy as np
import pandas as pd
import pytest

from mapshaper_ray.ops.clip import (_clip_segments, _sh_clip_ring,
                                    clip_bbox, clip_points, erase_points)
from mapshaper_ray.ops.generate import (graticule, point_grid,
                                        points_from_columns, polygon_grid,
                                        rectangle)
from mapshaper_ray.ops.split import merge_layers, split_on_grid, subdivide
from mapshaper_ray.stages.proj import (albers_fwd, project_points,
                                       webmercator_fwd, webmercator_inv)
from mapshaper_ray.state.path_index import PathIndex


def test_sh_clip_ring():
    x = np.array([0, 4, 4, 0, 0], dtype=float)
    y = np.array([0, 0, 4, 4, 0], dtype=float)
    res = _sh_clip_ring(x, y, (2, 2, 6, 6))
    assert res is not None
    cx, cy = res
    # clipped square = [2,4]x[2,4], area 4
    from mapshaper_ray.geom.kernels import planar_ring_area
    assert np.isclose(abs(planar_ring_area(cx, cy)), 4.0)
    # fully outside -> None
    assert _sh_clip_ring(x, y, (10, 10, 12, 12)) is None


def test_clip_segments():
    x = np.array([-1, 5], dtype=float)
    y = np.array([2, 2], dtype=float)
    parts = _clip_segments(x, y, (0, 0, 4, 4))
    assert len(parts) == 1
    px, py = parts[0]
    assert px.tolist() == [0.0, 4.0]
    # segment crossing out and back: two parts
    x = np.array([1, 6, 1], dtype=float)
    y = np.array([1, 1, 3], dtype=float)
    parts = _clip_segments(x, y, (0, 0, 4, 4))
    assert len(parts) == 2


def test_point_clip_erase(ray_session):
    import ray.data as rd
    idx = PathIndex.from_features([
        [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)]])
    pts = rd.from_items([
        {"feature_id": 0, "tag": "in", "px": [1.0], "py": [1.0]},
        {"feature_id": 1, "tag": "on", "px": [0.0], "py": [2.0]},
        {"feature_id": 2, "tag": "out", "px": [9.0], "py": [9.0]},
        {"feature_id": 3, "tag": "multi", "px": [1.0, 9.0], "py": [1.0, 9.0]},
    ])
    kept = clip_points(pts, idx).to_pandas()
    assert set(kept["tag"]) == {"in", "on", "multi"}
    assert kept[kept["tag"] == "multi"]["px"].iloc[0] == [1.0]
    erased = erase_points(pts, idx).to_pandas()
    assert set(erased["tag"]) == {"out", "multi"}
    assert erased[erased["tag"] == "multi"]["px"].iloc[0] == [9.0]


def test_clip_bbox_layer(ray_session):
    import ray.data as rd
    ds = rd.from_items([{
        "feature_id": 0,
        "rings_x": [[0.0, 4.0, 4.0, 0.0, 0.0]],
        "rings_y": [[0.0, 0.0, 4.0, 4.0, 0.0]],
        "ring_poly": [0]}])
    out = clip_bbox(ds, (2, 2, 6, 6)).to_pandas()
    assert len(out) == 1
    from mapshaper_ray.geom.kernels import planar_ring_area
    a = planar_ring_area(np.asarray(out.iloc[0]["rings_x"][0]),
                         np.asarray(out.iloc[0]["rings_y"][0]))
    assert np.isclose(abs(a), 4.0)


def test_webmercator_roundtrip():
    lon = np.array([-180, -60.5, 0, 120.25])
    lat = np.array([-80, -10, 0, 70.5])
    x, y = webmercator_fwd(lon, lat)
    lon2, lat2 = webmercator_inv(x, y)
    assert np.allclose(lon, lon2, atol=1e-9)
    assert np.allclose(lat, lat2, atol=1e-9)
    assert np.isclose(webmercator_fwd(0, 0)[0], 0.0)
    # known point: lon=180 -> pi*R
    assert np.isclose(webmercator_fwd(180, 0)[0], np.pi * 6378137.0)


def test_albers_sane():
    x0, y0 = albers_fwd(-96.0, 37.5)
    assert np.isclose(x0, 0.0, atol=1e-6)
    assert np.isclose(y0, 0.0, atol=1e-6)
    x1, _ = albers_fwd(-90.0, 37.5)
    assert x1 > 0


def test_project_points_ds(ray_session):
    import ray.data as rd
    ds = rd.from_items([{"lon": 0.0, "lat": 0.0},
                        {"lon": 180.0, "lat": 0.0}])
    out = project_points(ds, "webmercator").to_pandas()
    assert np.isclose(out["x"].iloc[1], np.pi * 6378137.0)
    with pytest.raises(ValueError):
        project_points(ds, "nope")


def test_generators(ray_session):
    pg = point_grid(4, 2, bbox=(0, 0, 4, 2)).to_pandas()
    assert len(pg) == 8
    assert pg.sort_values("feature_id").iloc[0]["px"][0] == 0.5
    gg = polygon_grid(2, 2, bbox=(0, 0, 2, 2)).to_pandas()
    assert len(gg) == 4
    r = rectangle((0, 0, 5, 3)).to_pandas()
    # reference convertBboxToGeoJSON vertex order: up first
    assert r.iloc[0]["rings_x"][0][2] == 5 and r.iloc[0]["rings_y"][0][1] == 3
    g = graticule(interval=90, bbox=(-180, -90, 180, 90)).to_pandas()
    assert (g["type"] == "meridian").sum() == 5
    assert (g["type"] == "parallel").sum() == 3


def test_points_from_columns(ray_session):
    import ray.data as rd
    ds = rd.from_items([{"feature_id": 0, "x": 1.5, "y": -2.0},
                        {"feature_id": 1, "x": None, "y": 3.0}])
    out = points_from_columns(ds, "x", "y").to_pandas() \
        .sort_values("feature_id")
    assert out.iloc[0]["px"] == [1.5]
    assert out.iloc[1]["px"] == []


def test_split_on_grid(ray_session):
    grid = polygon_grid(4, 4, bbox=(0, 0, 4, 4))
    out = split_on_grid(grid, 2, 2, bbox=(0, 0, 4, 4)).to_pandas()
    assert sorted(out["cell"].value_counts().values.tolist()) == [4, 4, 4, 4]


def test_merge_layers(ray_session):
    import ray.data as rd
    a = rd.from_items([{"feature_id": 0, "px": [1.0], "py": [1.0],
                        "name": "a"}])
    b = rd.from_items([{"feature_id": 1, "px": [2.0], "py": [2.0],
                        "pop": 5}])
    with pytest.raises(ValueError):
        merge_layers([a, b])
    m = merge_layers([a, b], force=True).to_pandas()
    assert len(m) == 2
    assert set(m.columns) >= {"name", "pop"}


def test_subdivide(ray_session):
    grid = point_grid(8, 1, bbox=(0, 0, 8, 1))
    parts = subdivide(grid, max_features=3)
    ns = sorted(p[1].count() for p in parts)
    assert sum(ns) == 8
    assert max(ns) <= 3
