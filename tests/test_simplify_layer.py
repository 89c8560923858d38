"""User-facing -simplify over a layer: shared borders stay shared
(the mapshaper guarantee — no gaps between adjacent polygons)."""

import json

import numpy as np

from mapshaper_ray.pipelines.simplify_layer import simplify_layer
from mapshaper_ray.sources.geojson import read_geojson, write_geojson


def _wiggly_border_fc():
    """Two polygons sharing a wiggly vertical border at x~5."""
    t = np.linspace(0, 10, 21)
    border = [[5 + 0.3 * np.sin(v * 2.1), v] for v in t]
    left = [[0, 0]] + border + [[0, 10], [0, 0]]
    right = [[10, 0]] + border + [[10, 10], [10, 0]]
    right = [right[0]] + border + [[10, 10], [10, 0]]
    # proper rings: left = (0,0) -> border up -> (0,10) -> close
    left_ring = [[0.0, 0.0]] + border + [[0.0, 10.0], [0.0, 0.0]]
    right_ring = [[10.0, 0.0]] + border + [[10.0, 10.0], [10.0, 0.0]]
    return {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"side": "L"},
         "geometry": {"type": "Polygon", "coordinates": [left_ring]}},
        {"type": "Feature", "properties": {"side": "R"},
         "geometry": {"type": "Polygon", "coordinates": [right_ring]}},
    ]}


def test_shared_border_identical_after_simplify(ray_session, tmp_path):
    src = tmp_path / "in.json"
    src.write_text(json.dumps(_wiggly_border_fc()))
    ds = read_geojson(str(src))
    out = simplify_layer(ds, pct=0.3).to_pandas().sort_values("feature_id")

    def border_coords(row):
        x = np.asarray(row["rings_x"][0])
        y = np.asarray(row["rings_y"][0])
        m = (x > 2) & (x < 8)  # the wiggly border region
        return set(zip(np.round(x[m], 9), np.round(y[m], 9)))

    bl = border_coords(out.iloc[0])
    br = border_coords(out.iloc[1])
    assert bl == br, "shared border must be simplified identically"
    # vertices actually removed
    n_after = len(out.iloc[0]["rings_x"][0])
    assert n_after < 24


def test_simplify_keep_shapes(ray_session, tmp_path):
    """A tiny polygon survives aggressive simplification."""
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"n": "big"},
         "geometry": {"type": "Polygon", "coordinates":
                      [[[0, 0], [10, 0], [10, 10], [5, 11], [0, 10],
                        [0, 0]]]}},
        {"type": "Feature", "properties": {"n": "tiny"},
         "geometry": {"type": "Polygon", "coordinates":
                      [[[20, 0], [20.1, 0], [20.1, 0.1], [20.05, 0.12],
                        [20, 0.1], [20, 0]]]}},
    ]}
    src = tmp_path / "k.json"
    src.write_text(json.dumps(fc))
    ds = read_geojson(str(src))
    out = simplify_layer(ds, pct=0.01, keep_shapes=True).to_pandas() \
        .sort_values("feature_id")
    from mapshaper_ray.geom.kernels import planar_ring_area
    for _, row in out.iterrows():
        x = np.asarray(row["rings_x"][0])
        y = np.asarray(row["rings_y"][0])
        assert abs(planar_ring_area(x, y)) > 1e-10, \
            f"{row['n']} collapsed"


def test_roundtrip_simplified_geojson(ray_session, tmp_path):
    src = tmp_path / "in.json"
    src.write_text(json.dumps(_wiggly_border_fc()))
    out_path = tmp_path / "out.json"
    write_geojson(simplify_layer(read_geojson(str(src)), pct=0.5),
                  str(out_path))
    got = json.loads(out_path.read_text())
    assert len(got["features"]) == 2
    assert got["features"][0]["geometry"]["type"] == "Polygon"


def test_simplify_layer_distributed_matches_inprocess(ray_session):
    """The end-to-end distributed simplify (two-shuffle topology +
    distributed rank + join-based reassembly) must produce the same
    retained geometry as the in-process layer command (keep_shapes off)
    on a shared-border mesh."""
    import numpy as np
    import ray.data as rd
    from mapshaper_ray.pipelines.simplify_layer import (
        simplify_layer, simplify_layer_distributed)
    rng = np.random.RandomState(5)
    rows = []
    for i in range(9):
        r, c = divmod(i, 3)
        # wiggly shared borders: subdivide each edge and jitter
        t = np.linspace(0, 1, 6)
        bx = c + t
        rows.append({"feature_id": i,
                     "rings_x": [list(np.concatenate(
                         [c + t, np.full(4, c + 1.0), (c + t)[::-1][1:],
                          np.full(4, float(c))]))],
                     "rings_y": [list(np.concatenate(
                         [np.full(6, float(r)), r + t[1:5],
                          np.full(5, r + 1.0), (r + t[1:5])[::-1]]))],
                     "ring_poly": [0]})
    ds = rd.from_items(rows)
    for pct in (0.3, 0.7):
        a = simplify_layer(ds, pct=pct, keep_shapes=False,
                           spherical=False).to_pandas() \
            .sort_values("feature_id").reset_index(drop=True)
        b = simplify_layer_distributed(ds, pct=pct,
                                       spherical=False).to_pandas() \
            .sort_values("feature_id").reset_index(drop=True)
        assert len(a) == len(b)
        for i in range(len(a)):
            ar = [(tuple(x), tuple(y)) for x, y in
                  zip(a.iloc[i]["rings_x"], a.iloc[i]["rings_y"])]
            br = [(tuple(x), tuple(y)) for x, y in
                  zip(b.iloc[i]["rings_x"], b.iloc[i]["rings_y"])]
            assert sorted(ar) == sorted(br), (pct, i)


def test_simplify_layer_distributed_keeps_attrs_and_nesting(ray_session):
    import numpy as np
    import ray.data as rd
    from mapshaper_ray.pipelines.simplify_layer import (
        simplify_layer_distributed)
    # a donut (outer + hole) with attributes
    ds = rd.from_items([{
        "feature_id": 0, "name": "donut", "pop": 7,
        "rings_x": [[0.0, 0.0, 6.0, 6.0, 0.0],
                    [2.0, 4.0, 4.0, 2.0, 2.0]],
        "rings_y": [[0.0, 6.0, 6.0, 0.0, 0.0],
                    [2.0, 2.0, 4.0, 4.0, 2.0]],
        "ring_poly": [0, 0]}])
    out = simplify_layer_distributed(ds, pct=1.0).to_pandas()
    assert out.iloc[0]["name"] == "donut" and out.iloc[0]["pop"] == 7
    # hole keeps its polygon membership
    assert list(out.iloc[0]["ring_poly"]) == [0, 0]
    from mapshaper_ray.geom.kernels import planar_ring_area
    areas = [planar_ring_area(np.asarray(x), np.asarray(y))
             for x, y in zip(out.iloc[0]["rings_x"],
                             out.iloc[0]["rings_y"])]
    assert (areas[0] > 0) != (areas[1] > 0)  # outer + hole windings


def test_simplify_layer_distributed_keep_shapes(ray_session):
    """Distributed keep-shapes (feature-grouped protect + per-arc
    max-combine of z locks) matches the in-process command at pct=0:
    every feature keeps a positive-area ring."""
    import numpy as np
    import ray.data as rd
    from mapshaper_ray.geom.kernels import planar_ring_area
    from mapshaper_ray.pipelines.simplify_layer import (
        simplify_layer, simplify_layer_distributed)
    rows = []
    for i in range(4):
        r, c = divmod(i, 2)
        t = np.linspace(0, 1, 5)
        rows.append({"feature_id": i,
                     "rings_x": [list(np.concatenate(
                         [c + t, np.full(3, c + 1.0), (c + t)[::-1][1:],
                          np.full(3, float(c))]))],
                     "rings_y": [list(np.concatenate(
                         [np.full(5, float(r)), r + t[1:4],
                          np.full(4, r + 1.0), (r + t[1:4])[::-1]]))],
                     "ring_poly": [0]})
    ds = rd.from_items(rows)
    a = simplify_layer(ds, pct=0.0, keep_shapes=True).to_pandas() \
        .sort_values("feature_id").reset_index(drop=True)
    b = simplify_layer_distributed(ds, pct=0.0, keep_shapes=True) \
        .to_pandas().sort_values("feature_id").reset_index(drop=True)
    for i in range(len(b)):
        for x, y in zip(b.iloc[i]["rings_x"], b.iloc[i]["rings_y"]):
            assert abs(planar_ring_area(np.asarray(x),
                                        np.asarray(y))) > 1e-12
        ar = [(tuple(x), tuple(y)) for x, y in
              zip(a.iloc[i]["rings_x"], a.iloc[i]["rings_y"])]
        br = [(tuple(x), tuple(y)) for x, y in
              zip(b.iloc[i]["rings_x"], b.iloc[i]["rings_y"])]
        assert sorted(ar) == sorted(br), i
