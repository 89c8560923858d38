"""Regression tests for the round-1 ADVICE findings:
- keep-shapes ring assembly must reverse negatively-traversed arcs
- api.o must dispatch .topojson
- read_topojson must preserve MultiPolygon ring nesting
- PolygonIndex boundary test uses exact equality, not rtol-1e-5
- insert_cuts dedups crossing vertices exactly, not with np.isclose
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest


def test_keep_shapes_reversed_arc_ring(ray_session):
    """Two squares sharing a border: each ring traverses the shared arc
    in opposite directions, so one shape sees it with a negative signed
    id.  Before the fix the protect pass evaluated scrambled geometry
    (ADVICE: area 1.15 instead of 0.85); the collapse guard could then
    let a degenerating ring through.  At pct=0 with keep_shapes=True
    every output ring must retain a positive area."""
    import ray.data as rd
    from mapshaper_ray.geom.kernels import planar_ring_area
    from mapshaper_ray.pipelines.simplify_layer import simplify_layer

    sq_a = ([0.0, 1.0, 1.0, 0.3, 0.0, 0.0],
            [0.0, 0.0, 1.0, 1.15, 1.0, 0.0])
    sq_b = ([1.0, 2.0, 2.0, 1.0, 0.3, 1.0],
            [0.0, 0.0, 1.0, 1.0, 1.15, 0.0])
    ds = rd.from_items([
        {"feature_id": 0, "rings_x": [list(sq_a[0])],
         "rings_y": [list(sq_a[1])], "ring_poly": [0]},
        {"feature_id": 1, "rings_x": [list(sq_b[0])],
         "rings_y": [list(sq_b[1])], "ring_poly": [0]},
    ])
    out = simplify_layer(ds, pct=0.0, keep_shapes=True).to_pandas()
    for _, row in out.iterrows():
        for x, y in zip(row["rings_x"], row["rings_y"]):
            x = np.asarray(x)
            y = np.asarray(y)
            assert len(x) >= 4
            assert abs(planar_ring_area(x, y)) > 1e-9


def test_api_o_topojson(ray_session, tmp_path):
    import ray.data as rd
    from mapshaper_ray import api
    ds = rd.from_items([
        {"feature_id": 0, "rings_x": [[0.0, 1.0, 1.0, 0.0, 0.0]],
         "rings_y": [[0.0, 0.0, 1.0, 1.0, 0.0]], "ring_poly": [0],
         "name": "a"},
        {"feature_id": 1, "rings_x": [[1.0, 2.0, 2.0, 1.0, 1.0]],
         "rings_y": [[0.0, 0.0, 1.0, 1.0, 0.0]], "ring_poly": [0],
         "name": "b"},
    ])
    p = tmp_path / "out.topojson"
    api.o(ds, str(p))
    topo = json.loads(p.read_text())
    assert topo["type"] == "Topology"
    geoms = topo["objects"]["layer1"]["geometries"]
    assert [g["properties"]["name"] for g in geoms] == ["a", "b"]
    # shared border stored once: 2 squares sharing an edge -> 3 arcs
    assert len(topo["arcs"]) == 3


def test_read_topojson_multipolygon_nesting(ray_session, tmp_path):
    """Two disjoint outer rings of one MultiPolygon must land in
    DIFFERENT ring_poly groups (ADVICE: flattening them into one polygon
    makes the second outer ring read as a hole)."""
    from mapshaper_ray.sources.topojson import read_topojson
    topo = {
        "type": "Topology",
        "arcs": [
            [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]],
            [[5, 5], [1, 0], [1, 1], [0, 1], [0, 0]],
        ],
        "objects": {"layer1": {"type": "GeometryCollection",
                               "geometries": [
            {"type": "MultiPolygon", "arcs": [[[0]], [[1]]],
             "properties": {"name": "mp"}}]}},
    }
    p = tmp_path / "mp.topojson"
    p.write_text(json.dumps(topo))
    df = read_topojson(str(p)).to_pandas()
    assert len(df) == 1
    assert list(df.iloc[0]["ring_poly"]) == [0, 1]


def test_polygon_index_exact_boundary(ray_session):
    """A probe 5e-6 inside an edge is INSIDE (1), not boundary (-1):
    np.isclose's rtol snapped it to the edge."""
    from mapshaper_ray.state.polygon_index import PolygonIndex
    x = np.array([0.0, 10.0, 10.0, 0.0, 0.0])
    y = np.array([0.0, 0.0, 10.0, 10.0, 0.0])
    idx = PolygonIndex(x, y)
    assert idx.point_in_polygon(5.0, 5e-6) == 1
    assert idx.point_in_polygon(5.0, 0.0) == -1
    assert idx.point_in_polygon(5.0, -5e-6) == 0


def test_insert_cuts_close_crossings_survive(ray_session):
    """Two crossings ~1e-5 apart (relative to 1e6-scale coords) are
    DISTINCT cut points; np.isclose(rtol=1e-5) used to merge them."""
    from mapshaper_ray.topo.arcs import ArcTable
    from mapshaper_ray.topo.cuts import add_intersection_cuts

    base = 1.0e6
    # horizontal arc crossed by a narrow V whose two legs cross it at
    # x = base+2 and x = base+8 (6 units apart: inside rtol*|x|=10)
    h = np.array([[base, 0.0], [base + 20.0, 0.0]])
    v = np.array([[base + 2.0, 5.0], [base + 5.0, -5.0],
                  [base + 8.0, 5.0]])
    arcs = ArcTable.from_coord_lists([h, v])
    table, remap, _ = add_intersection_cuts(arcs)
    # the horizontal arc must split into 3 pieces (2 distinct cuts)
    assert len(remap[0]) == 3


def test_topojson_multipolygon_roundtrip(ray_session, tmp_path):
    """MultiPolygon nesting survives a full write/read cycle (the
    exporter emits type MultiPolygon from ring_poly; without it the
    second island round-trips as a hole)."""
    import ray.data as rd
    from mapshaper_ray import api
    ds = rd.from_items([{
        "feature_id": 0, "name": "islands",
        # layer-model winding convention: outer rings CW (reference
        # importRing orientation) — the exporter's explodePolygon
        # regroup classifies CCW rings as holes
        "rings_x": [[0.0, 0.0, 1.0, 1.0, 0.0],
                    [5.0, 5.0, 6.0, 6.0, 5.0]],
        "rings_y": [[0.0, 1.0, 1.0, 0.0, 0.0],
                    [0.0, 1.0, 1.0, 0.0, 0.0]],
        "ring_poly": [0, 1]}])
    p = tmp_path / "mp.topojson"
    api.o(ds, str(p))
    import json as _json
    topo = _json.loads(p.read_text())
    g = topo["objects"]["layer1"]["geometries"][0]
    assert g["type"] == "MultiPolygon"
    back = api.i(str(p)).to_pandas()
    assert list(back.iloc[0]["ring_poly"]) == [0, 1]


def test_shapefile_roundtrip_geojson_winding(ray_session, tmp_path):
    """RFC-7946-wound GeoJSON (CCW outer, CW hole) round-trips through
    the shapefile writer/reader with correct nesting (the writer
    enforces shapefile ring orientation)."""
    import json as _json
    from mapshaper_ray import api
    src = tmp_path / "donut.json"
    src.write_text(_json.dumps({
        "type": "FeatureCollection", "features": [{
            "type": "Feature", "properties": {"n": 1},
            "geometry": {"type": "Polygon", "coordinates": [
                [[0, 0], [6, 0], [6, 6], [0, 6], [0, 0]],   # CCW outer
                [[2, 2], [2, 4], [4, 4], [4, 2], [2, 2]],   # CW hole
            ]}}]}))
    ds = api.i(str(src))
    shp = tmp_path / "out.shp"
    api.o(ds, str(shp))
    back = api.i(str(shp)).to_pandas()
    assert len(back) == 1
    # both rings belong to ONE polygon (hole not misread as an island)
    assert list(back.iloc[0]["ring_poly"]) == [0, 0]


def test_ndjson_reimport(ray_session, tmp_path):
    """api.i re-imports write_geojson_shards NDJSON output."""
    import ray.data as rd
    from mapshaper_ray import api
    ds = rd.from_items([
        {"feature_id": i, "v": i,
         "rings_x": [[i, i + 1.0, i + 1.0, i, i]],
         "rings_y": [[0.0, 0.0, 1.0, 1.0, 0.0]], "ring_poly": [0]}
        for i in range(3)])
    out_dir = tmp_path / "shards"
    api.write_geojson_shards(ds, str(out_dir))
    import glob
    files = sorted(glob.glob(f"{out_dir}/*"))
    assert files
    total = 0
    for f in files:
        total += api.i(f).count()
    assert total == 3
