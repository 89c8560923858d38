"""Feature-command tests: explode / affine / round / centroid / filters
(reference behaviors from SURVEY.md §2.2, §2.6 filter rows)."""

import json

import numpy as np
import pytest

from mapshaper_ray.ops.features import (add_polygon_metrics, affine,
                                        centroids, explode, filter_bbox,
                                        filter_islands, filter_slivers,
                                        layer_info, round_coords,
                                        to_point_layer)
from mapshaper_ray.sources.geojson import read_geojson


@pytest.fixture()
def poly_ds(ray_session, tmp_path):
    fc = {"type": "FeatureCollection", "features": [
        # square with a hole
        {"type": "Feature", "properties": {"name": "a"},
         "geometry": {"type": "Polygon", "coordinates":
                      [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
                       [[1, 1], [1, 2], [2, 2], [2, 1], [1, 1]]]}},
        # two-part multipolygon: big island + tiny island
        {"type": "Feature", "properties": {"name": "b"},
         "geometry": {"type": "MultiPolygon", "coordinates":
                      [[[[10, 0], [13, 0], [13, 3], [10, 3], [10, 0]]],
                       [[[20, 0], [20.1, 0], [20.1, 0.1], [20, 0.1],
                         [20, 0]]]]}},
    ]}
    p = tmp_path / "f.json"
    p.write_text(json.dumps(fc))
    return read_geojson(str(p))


def test_explode(poly_ds):
    out = explode(poly_ds).to_pandas()
    # a:1 part, b:2 parts -> 3 features
    assert len(out) == 3
    a = out[out["name"] == "a"].iloc[0]
    assert len(a["rings_x"]) == 2  # hole travels with its outer ring


def test_area_and_centroid(poly_ds):
    out = add_polygon_metrics(poly_ds).to_pandas().sort_values("feature_id")
    # a: 16 - 1(hole) = 15 ; b: 9 + 0.01
    assert np.isclose(out.iloc[0]["area"], 15.0)
    assert np.isclose(out.iloc[1]["area"], 9.01)
    c = centroids(poly_ds).to_pandas().sort_values("feature_id")
    # reference getShapeCentroid: LARGEST ring only, holes ignored
    # (src/points/mapshaper-polygon-centroid.js:6-9) -> square center
    assert np.isclose(c.iloc[0]["cx"], 2.0)
    assert np.isclose(c.iloc[0]["cy"], 2.0)


def test_point_layer(poly_ds):
    pts = to_point_layer(poly_ds).to_pandas().sort_values("feature_id")
    assert np.isclose(pts.iloc[0]["px"][0], 2.0)
    assert list(pts.columns).count("rings_x") == 0


def test_affine_and_round(poly_ds):
    moved = affine(poly_ds, shift=(100, -10)).to_pandas().sort_values(
        "feature_id")
    x0 = np.asarray(moved.iloc[0]["rings_x"][0])
    assert x0.min() == 100.0 and x0.max() == 104.0
    # reference convention: positive rotation is clockwise, so -90
    # maps (x, y) -> (-y, x) (mapshaper-affine.js:84-93)
    rot = affine(poly_ds, rotate_deg=-90, anchor=(0, 0)).to_pandas()
    r0x = np.asarray(rot.sort_values("feature_id").iloc[0]["rings_x"][0])
    assert np.isclose(r0x.min(), -4.0) and np.isclose(r0x.max(), 0.0)
    rd_ = round_coords(affine(poly_ds, shift=(0.123456, 0)),
                       0.01).to_pandas()
    v = np.asarray(rd_.sort_values("feature_id").iloc[0]["rings_x"][0])
    assert np.allclose(v * 100, np.round(v * 100))


def test_filters(poly_ds):
    kept = filter_bbox(poly_ds, 9, -1, 14, 4).to_pandas()
    assert list(kept["name"]) == ["b"]
    no_tiny = filter_islands(poly_ds, min_area=1.0).to_pandas() \
        .sort_values("feature_id")
    assert len(no_tiny.iloc[1]["rings_x"]) == 1  # tiny island dropped
    assert len(no_tiny.iloc[0]["rings_x"]) == 2  # hole kept (not island)
    no_sliver = filter_slivers(poly_ds, min_area=1.5).to_pandas() \
        .sort_values("feature_id")
    assert len(no_sliver.iloc[0]["rings_x"]) == 1  # 1.0-area hole dropped


def test_layer_info(poly_ds):
    info = layer_info(poly_ds)
    assert info["count"] == 2
    assert info["null_geometries"] == 0
    assert info["bbox"] == [0.0, 0.0, 20.1, 4.0]
