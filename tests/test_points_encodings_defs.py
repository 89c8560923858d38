"""-points vertices/endpoints/interpolated, encodings, -include defs,
and the filter-slivers auto threshold."""

import numpy as np
import pandas as pd
import pytest


def _two_part_line():
    import ray.data as rd
    return rd.from_items([{
        "feature_id": 0,
        "part_x": [[0.0, 2.0], [2.0, 3.7]],
        "part_y": [[0.0, 0.0], [0.0, 0.0]]}])


def test_points_vertices_dedups_shared(ray_session):
    from mapshaper_ray.ops.generate import points_vertices
    out = points_vertices(_two_part_line()).to_pandas()
    assert list(out.iloc[0]["px"]) == [0.0, 2.0, 3.7]


def test_points_vertices_polygon_ring(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.generate import points_vertices
    sq = rd.from_items([{
        "feature_id": 0, "rings_x": [[0.0, 1.0, 1.0, 0.0, 0.0]],
        "rings_y": [[0.0, 0.0, 1.0, 1.0, 0.0]], "ring_poly": [0]}])
    out = points_vertices(sq).to_pandas()
    assert len(out.iloc[0]["px"]) == 4  # closing vertex deduped


def test_points_endpoints(ray_session):
    from mapshaper_ray.ops.generate import points_endpoints
    out = points_endpoints(_two_part_line()).to_pandas()
    assert list(out.iloc[0]["px"]) == [0.0, 2.0, 3.7]


def test_points_interpolated(ray_session):
    from mapshaper_ray.ops.generate import points_interpolated
    out = points_interpolated(_two_part_line(), interval=1.0).to_pandas()
    px = np.asarray(out.iloc[0]["px"])
    # part 1 (len 2.0): 0, 1, 2; part 2 (len 1.7): 2, 3, 3.7
    assert np.allclose(px, [0, 1, 2, 2, 3, 3.7])


def test_encoding_detection():
    from mapshaper_ray.sources.encodings import detect_encoding
    assert detect_encoding(["hello world".encode()]) == "utf-8"
    assert detect_encoding(["café touché".encode("utf-8")]) == "utf-8"
    # n-dash in cp1252 (0x96) is invalid utf-8 -> win1252 path
    assert detect_encoding([b"airport \x96 south",
                            b"plain ascii text here"]) == "cp1252"


def test_dbf_encoding_roundtrip(ray_session, tmp_path):
    from mapshaper_ray.sources.shapefile import parse_dbf, write_dbf
    recs = [{"name": "café"}, {"name": "naïve"}]
    p = tmp_path / "t.dbf"
    write_dbf(str(p), recs)
    buf = p.read_bytes()
    _, back = parse_dbf(buf)
    assert [r["name"] for r in back] == ["café", "naïve"]
    # explicit encoding override still honored
    _, back2 = parse_dbf(buf, encoding="latin-1")
    assert [r["name"] for r in back2] == ["café", "naïve"]


def test_include_defs(ray_session, tmp_path):
    import ray.data as rd
    from mapshaper_ray.ops.relational import each_expr, include_defs
    mod = tmp_path / "defs.py"
    mod.write_text("K = 10\n\ndef scale(v):\n    return v * K\n")
    defs = include_defs(str(mod))
    assert defs["K"] == 10 and "scale" in defs and "_" not in defs
    ds = rd.from_pandas(pd.DataFrame({"v": [1.0, 2.0]}))
    out = each_expr(ds, {"w": "scale(v) + K"}, defs=defs).to_pandas()
    assert list(out["w"]) == [20.0, 30.0]


def test_filter_slivers_auto_threshold(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.features import (filter_slivers,
                                            sliver_area_threshold)
    # unit squares (segment length 1 -> threshold 1.0) + one sliver ring
    rows = []
    for i in range(4):
        rows.append({"feature_id": i,
                     "rings_x": [[i, i + 1.0, i + 1.0, i, i]],
                     "rings_y": [[0.0, 0.0, 1.0, 1.0, 0.0]],
                     "ring_poly": [0]})
    rows.append({"feature_id": 4,
                 "rings_x": [[10.0, 10.5, 10.5, 10.0, 10.0]],
                 "rings_y": [[0.0, 0.0, 0.1, 0.1, 0.0]],
                 "ring_poly": [0]})
    ds = rd.from_items(rows)
    thr = sliver_area_threshold(ds)
    assert 0 < thr <= 1.0
    out = filter_slivers(ds).to_pandas().set_index("feature_id")
    assert len(out.loc[4]["rings_x"]) == 0  # 0.05-area ring dropped
    assert all(len(out.loc[i]["rings_x"]) == 1 for i in range(4))


def test_clean_shapes(ray_session):
    """NaN vertices, consecutive duplicates, defective paths, unclosed
    rings and same-winding nested rings all repair."""
    import ray.data as rd
    from mapshaper_ray.ops.features import clean_shapes
    ds = rd.from_items([{
        "feature_id": 0,
        "rings_x": [[0.0, 0.0, np.nan, 5.0, 5.0, 0.0],   # dup+nan, unclosed
                    [1.0, 1.0, 1.0, 1.0],                 # collapses away
                    [2.0, 3.0, 3.0, 2.0, 2.0]],  # same-winding nested
        "rings_y": [[0.0, 0.0, np.nan, 0.0, 5.0, 5.0],
                    [1.0, 1.0, 1.0, 1.0],
                    [2.0, 2.0, 3.0, 3.0, 2.0]],
        "ring_poly": [0, 0, 0]}])
    out = clean_shapes(ds).to_pandas()
    rx = out.iloc[0]["rings_x"]
    assert len(rx) == 1  # degenerate + same-winding nested dropped
    x = np.asarray(rx[0])
    assert np.isfinite(x).all()
    assert x[0] == x[-1]  # re-closed


def test_json_table_reader(ray_session, tmp_path):
    """-i of a JSON array of records -> data-only layer (reference
    importJSONTable, src/data/mapshaper-json-table.js:3)."""
    import json as _json
    from mapshaper_ray import api
    p = tmp_path / "tbl.json"
    p.write_text(_json.dumps([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]))
    ds = api.i(str(p))
    df = ds.to_pandas()
    assert list(df["a"]) == [1, 2]
    assert list(df["b"]) == ["x", "y"]
