"""Shapefile/.dbf round-trip (SURVEY.md §2.1 Shapefile/DBF rows)."""

import numpy as np

from mapshaper_ray.sources.geojson import read_geojson, write_geojson
from mapshaper_ray.sources.shapefile import (parse_dbf, read_shapefile,
                                             write_dbf, write_shapefile)


def test_dbf_roundtrip(tmp_path):
    recs = [{"name": "alpha", "pop": 123, "rate": 1.5, "ok": True},
            {"name": "beta", "pop": 4, "rate": -0.25, "ok": False},
            {"name": "", "pop": None, "rate": None, "ok": None}]
    p = tmp_path / "t.dbf"
    write_dbf(str(p), recs)
    fields, back = parse_dbf(p.read_bytes())
    assert [f[0] for f in fields] == ["name", "pop", "rate", "ok"]
    assert back[0]["name"] == "alpha"
    assert back[0]["pop"] == 123
    assert abs(back[0]["rate"] - 1.5) < 1e-9
    assert back[0]["ok"] is True
    assert back[1]["rate"] == -0.25
    assert back[2]["pop"] is None


def _poly_ds(tmp_path, ray_session):
    import json
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"name": "a", "pop": 10},
         "geometry": {"type": "Polygon", "coordinates":
                      [[[0, 0], [0, 4], [4, 4], [4, 0], [0, 0]]]}},
        {"type": "Feature", "properties": {"name": "b", "pop": 20},
         "geometry": {"type": "Polygon", "coordinates":
                      [[[10, 0], [10, 2], [12, 2], [12, 0], [10, 0]]]}},
    ]}
    src = tmp_path / "in.json"
    src.write_text(json.dumps(fc))
    return read_geojson(str(src))


def test_shp_polygon_roundtrip(ray_session, tmp_path):
    ds = _poly_ds(tmp_path, ray_session)
    shp = tmp_path / "out.shp"
    write_shapefile(ds, str(shp))
    assert (tmp_path / "out.shx").exists()
    assert (tmp_path / "out.dbf").exists()
    back = read_shapefile(str(shp)).to_pandas().sort_values("feature_id")
    assert len(back) == 2
    assert list(back["name"]) == ["a", "b"]
    assert list(back["pop"]) == [10, 20]
    x0 = np.asarray(back.iloc[0]["rings_x"][0])
    y0 = np.asarray(back.iloc[0]["rings_y"][0])
    assert len(x0) == 5
    assert {0.0, 4.0} == set(np.unique(x0)) == set(np.unique(y0))


def test_shp_point_roundtrip(ray_session, tmp_path):
    import json
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"tag": "p1"},
         "geometry": {"type": "Point", "coordinates": [3.5, -1.25]}},
        {"type": "Feature", "properties": {"tag": "p2"},
         "geometry": {"type": "Point", "coordinates": [-7, 2]}},
    ]}
    src = tmp_path / "pts.json"
    src.write_text(json.dumps(fc))
    ds = read_geojson(str(src))
    shp = tmp_path / "pts.shp"
    write_shapefile(ds, str(shp))
    back = read_shapefile(str(shp)).to_pandas().sort_values("feature_id")
    assert list(back["tag"]) == ["p1", "p2"]
    assert back.iloc[0]["px"][0] == 3.5
    assert back.iloc[0]["py"][0] == -1.25


def test_shp_geojson_identity(ray_session, tmp_path):
    """geojson -> shp -> geojson preserves coordinates + attrs."""
    import json
    ds = _poly_ds(tmp_path, ray_session)
    shp = tmp_path / "mid.shp"
    write_shapefile(ds, str(shp))
    back = read_shapefile(str(shp))
    out = tmp_path / "back.json"
    write_geojson(back, str(out))
    got = json.loads(out.read_text())
    assert [f["properties"]["name"] for f in got["features"]] == ["a", "b"]
    c = got["features"][1]["geometry"]["coordinates"][0]
    assert [10, 0] in c and [12, 2] in c
