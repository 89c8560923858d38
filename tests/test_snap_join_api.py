"""Snap sweep port, join-calc / side outputs, api facade import."""

import numpy as np
import pandas as pd


def test_api_facade_imports():
    from mapshaper_ray import api
    assert callable(api.read_geojson)
    assert callable(api.visvalingam_thresholds)
    assert callable(api.dissolve2)
    assert callable(api.polygon_mosaic)
    assert callable(api.clean_layer)


def test_pandas_stage_then_write_geojson(ray_session, tmp_path):
    """Regression: after a pandas map_batches stage, ring_poly comes
    back as a numpy/tensor column whose single-element [0] is FALSY —
    a `v or []` in the renderer silently emitted null geometry."""
    import json
    from mapshaper_ray import api
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"g": "a"},
         "geometry": {"type": "Polygon", "coordinates":
                      [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]}}]}
    src = tmp_path / "in.json"
    src.write_text(json.dumps(fc))
    lyr = api.add_polygon_metrics(
        api.affine(api.read_geojson(str(src)), shift=(10, 0)))
    out = tmp_path / "out.json"
    api.write_geojson(lyr, str(out), decimals=6)
    got = json.loads(out.read_text())
    geom = got["features"][0]["geometry"]
    assert geom is not None and geom["type"] == "Polygon"
    assert geom["coordinates"][0][0] == [10, 0]
    assert got["features"][0]["properties"]["area"] == 1.0


def test_snap_sweep_semantics():
    from mapshaper_ray.topo.snap import snap_coords_by_interval
    # three points: b within dist of a (a first in x-order wins), c far
    xx = np.array([0.0, 0.05, 5.0])
    yy = np.array([0.0, 0.0, 0.0])
    n = snap_coords_by_interval(xx, yy, 0.1)
    assert n == 1
    assert xx[1] == 0.0
    assert xx[2] == 5.0
    # chain: a<-b, then c snaps to b's new position only if within dist
    xx = np.array([0.0, 0.08, 0.15])
    yy = np.zeros(3)
    snap_coords_by_interval(xx, yy, 0.1)
    # b snapped to a (0.0); c (0.15) is within 0.1 of a? no (0.15>0.1),
    # but was within 0.07 of b's ORIGINAL x -- reference sweeps over
    # the mutating arrays, with c compared against a's position since
    # b moved: c stays
    assert xx[1] == 0.0
    assert xx[2] == 0.15


def test_dedup_arc_coords():
    from mapshaper_ray.topo.arcs import ArcTable
    from mapshaper_ray.topo.snap import dedup_arc_coords
    arcs = ArcTable.from_coord_lists([
        np.array([[0, 0], [0, 0], [1, 1], [np.nan, 2], [2, 2]])])
    out = dedup_arc_coords(arcs)
    assert out.nn[0] == 3
    assert out.xx.tolist() == [0, 1, 2]


def test_snap_points_ds(ray_session):
    import ray.data as rd
    from mapshaper_ray.topo.snap import snap_points_ds
    ds = rd.from_items([
        {"doc_id": 0, "lon": 10.0, "lat": 10.0},
        {"doc_id": 1, "lon": 10.0000005, "lat": 10.0},
        {"doc_id": 2, "lon": 40.0, "lat": 40.0},
    ])
    out = snap_points_ds(ds, snap_dist=1e-5).to_pandas() \
        .sort_values("doc_id")
    assert out.iloc[0]["lon"] == out.iloc[1]["lon"]
    assert out.iloc[2]["lon"] == 40.0


def test_broadcast_join_calc(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.relational import broadcast_join_calc
    big = rd.from_items([{"k": 1, "v": 10}, {"k": 2, "v": 20},
                         {"k": 3, "v": 30}])
    src = pd.DataFrame({"k": [1, 1, 2], "x": [5.0, 7.0, 9.0]})
    out = broadcast_join_calc(big, src, on="k",
                              calc={"n": ("x", "count"),
                                    "sum_x": ("x", "sum")}).to_pandas() \
        .sort_values("k")
    assert out["n"].fillna(0).tolist() == [2, 1, 0]
    assert out["sum_x"].fillna(0).tolist() == [12.0, 9.0, 0.0]


def test_join_side_outputs(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.relational import join_side_outputs
    big = rd.from_items([{"k": 1}, {"k": 2}, {"k": 9}])
    src = pd.DataFrame({"k": [1, 2, 3], "x": ["a", "b", "c"]})
    unmatched_ds, unjoined_src = join_side_outputs(big, src, on="k")
    assert unmatched_ds.to_pandas()["k"].tolist() == [9]
    assert unjoined_src["k"].tolist() == [3]


def test_io_dispatch(ray_session, tmp_path):
    """api.i / api.o format dispatch incl. Topology content sniff."""
    import json
    import numpy as np
    import pytest
    from mapshaper_ray import api
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"n": 1},
         "geometry": {"type": "Polygon", "coordinates":
                      [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]}}]}
    src = tmp_path / "a.geojson"
    src.write_text(json.dumps(fc))
    lyr = api.i(str(src))
    api.o(lyr, str(tmp_path / "b.shp"))
    assert api.i(str(tmp_path / "b.shp")).count() == 1
    api.o(lyr, str(tmp_path / "b.svg"))
    assert (tmp_path / "b.svg").read_text().startswith(
        '<?xml version="1.0"?>\n<svg ')
    from mapshaper_ray.sources.topojson import write_topojson
    write_topojson([[np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]],
                              float)]], str(tmp_path / "t.json"))
    assert api.i(str(tmp_path / "t.json")).count() == 1  # content sniff
    with pytest.raises(ValueError):
        api.o(lyr, str(tmp_path / "x.unknown"))
