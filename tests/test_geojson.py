"""GeoJSON reader/writer round-trip (SURVEY.md §2.1 rows GeoJSON
reader/writer; reference e2e style: import → export → compare)."""

import json

import numpy as np
import pytest

from mapshaper_ray.sources.geojson import (read_geojson, split_features,
                                           write_geojson)

FC = {
    "type": "FeatureCollection",
    "features": [
        {"type": "Feature", "properties": {"name": "a", "pop": 10},
         "geometry": {"type": "Polygon", "coordinates":
                      [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
                       [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]]}},
        {"type": "Feature", "properties": {"name": "b", "pop": 20},
         "geometry": {"type": "MultiPolygon", "coordinates":
                      [[[[10, 0], [12, 0], [12, 2], [10, 2], [10, 0]]],
                       [[[20, 0], [22, 0], [22, 2], [20, 2], [20, 0]]]]}},
        {"type": "Feature", "properties": {"name": "c", "pop": None},
         "geometry": None},
    ],
}

LINES = {
    "type": "FeatureCollection",
    "features": [
        {"type": "Feature", "properties": {"id": 1},
         "geometry": {"type": "LineString",
                      "coordinates": [[0, 0], [1, 1], [2, 0.5]]}},
        {"type": "Feature", "properties": {"id": 2},
         "geometry": {"type": "MultiLineString",
                      "coordinates": [[[0, 0], [1, 0]], [[5, 5], [6, 5]]]}},
    ],
}

POINTS = {
    "type": "FeatureCollection",
    "features": [
        {"type": "Feature", "properties": {"tag": "p"},
         "geometry": {"type": "Point", "coordinates": [3.5, -1.25]}},
        {"type": "Feature", "properties": {"tag": "mp"},
         "geometry": {"type": "MultiPoint",
                      "coordinates": [[0, 0], [1, 2]]}},
    ],
}


def test_split_features_scanner():
    txt = json.dumps(FC)
    feats = split_features(txt)
    assert len(feats) == 3
    assert json.loads(feats[0])["properties"]["name"] == "a"
    # strings containing braces don't break the scanner
    tricky = ('{"type":"FeatureCollection","features":['
              '{"type":"Feature","properties":{"s":"a{b}c\\"}"},'
              '"geometry":{"type":"Point","coordinates":[1,2]}}]}')
    assert len(split_features(tricky)) == 1


@pytest.mark.parametrize("fc,n", [(FC, 3), (LINES, 2), (POINTS, 2)])
def test_roundtrip(ray_session, tmp_path, fc, n):
    src = tmp_path / "in.json"
    src.write_text(json.dumps(fc))
    ds = read_geojson(str(src))
    assert ds.count() == n
    out = tmp_path / "out.json"
    write_geojson(ds, str(out))
    got = json.loads(out.read_text())
    assert got["type"] == "FeatureCollection"
    assert len(got["features"]) == n
    for a, b in zip(got["features"], fc["features"]):
        assert a["properties"] == b["properties"]
        if b["geometry"] is None:
            assert a["geometry"] is None
        elif a["geometry"]["type"].endswith("Polygon"):
            # import REWINDS rings to the reference convention
            # (importRing) — compare rings up to rotation/direction,
            # exactly like the reference's own round-trip behavior
            assert a["geometry"]["type"] == b["geometry"]["type"]
            assert sorted(map(_canon, _rings(a["geometry"]))) == \
                sorted(map(_canon, _rings(b["geometry"])))
        else:
            assert a["geometry"]["type"] == b["geometry"]["type"]
            assert np.allclose(
                np.asarray(a["geometry"]["coordinates"], dtype=object
                           ).astype(float).ravel()
                if a["geometry"]["type"] in ("Point",) else
                _flat(a["geometry"]["coordinates"]),
                _flat(b["geometry"]["coordinates"]))


def _rings(geom):
    c = geom["coordinates"]
    return list(c) if geom["type"] == "Polygon" else \
        [r for poly in c for r in poly]


def _canon(ring):
    pts = [tuple(p) for p in ring[:-1]]
    best = None
    for seq in (pts, pts[::-1]):
        i = min(range(len(seq)), key=lambda k: seq[k])
        rot = seq[i:] + seq[:i]
        best = rot if best is None or rot < best else best
    return tuple(best)


def _flat(c):
    out = []

    def rec(v):
        if isinstance(v, (int, float)):
            out.append(float(v))
        else:
            for u in v:
                rec(u)
    rec(c)
    return out


def test_precision_rounding(ray_session, tmp_path):
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {},
         "geometry": {"type": "Point",
                      "coordinates": [1.23456789, -7.98765432]}}]}
    src = tmp_path / "p.json"
    src.write_text(json.dumps(fc))
    out = tmp_path / "po.json"
    write_geojson(read_geojson(str(src)), str(out), decimals=3)
    got = json.loads(out.read_text())
    # field-less layers export as GeometryCollection (reference rule)
    assert got["geometries"][0]["coordinates"] == [1.235, -7.988]
