"""Layer-level dissolve / clip / erase (general polygon boolean)."""

import json

import numpy as np
import pytest

from mapshaper_ray.ops.features import add_polygon_metrics
from mapshaper_ray.pipelines.overlay import (clip_layer, dissolve_layer,
                                             erase_layer)
from mapshaper_ray.sources.geojson import read_geojson


def _grid_fc(grid=3, groups=("a", "b")):
    feats = []
    for i in range(grid * grid):
        r, c = divmod(i, grid)
        x0, y0 = float(c), float(r)
        feats.append({
            "type": "Feature",
            "properties": {"grp": groups[c % len(groups)], "v": 1},
            "geometry": {"type": "Polygon", "coordinates":
                         [[[x0, y0], [x0 + 1, y0], [x0 + 1, y0 + 1],
                           [x0, y0 + 1], [x0, y0]]]}})
    return {"type": "FeatureCollection", "features": feats}


def _rect_fc(x0, y0, x1, y1):
    return {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {},
         "geometry": {"type": "Polygon", "coordinates":
                      [[[x0, y0], [x1, y0], [x1, y1], [x0, y1],
                        [x0, y0]]]}}]}


def test_dissolve_layer(ray_session, tmp_path):
    src = tmp_path / "g.json"
    src.write_text(json.dumps(_grid_fc(3)))
    ds = read_geojson(str(src))
    out = dissolve_layer(ds, "grp", sum_fields=("v",))
    df = add_polygon_metrics(out).to_pandas().sort_values("grp")
    # column groups: 'a' = cols 0,2 (6 cells), 'b' = col 1 (3 cells)
    assert list(df["grp"]) == ["a", "b"]
    assert list(df["v"]) == [6, 3]
    assert np.allclose(sorted(df["area"]), [3.0, 6.0])
    # 'a' is two disjoint columns -> 2 rings; 'b' one ring
    assert len(df[df["grp"] == "a"].iloc[0]["rings_x"]) == 2
    assert len(df[df["grp"] == "b"].iloc[0]["rings_x"]) == 1


def test_clip_layer(ray_session, tmp_path):
    t = tmp_path / "t.json"
    t.write_text(json.dumps(_grid_fc(2, groups=("g",))))
    c = tmp_path / "c.json"
    c.write_text(json.dumps(_rect_fc(0.5, 0.5, 1.5, 1.5)))
    out = clip_layer(read_geojson(str(t)), read_geojson(str(c)))
    df = add_polygon_metrics(out).to_pandas()
    # each of the 4 unit cells keeps a 0.5x0.5 corner
    assert len(df) == 4
    assert np.allclose(df["area"], 0.25)


def test_erase_layer(ray_session, tmp_path):
    t = tmp_path / "t.json"
    t.write_text(json.dumps(_grid_fc(2, groups=("g",))))
    c = tmp_path / "c.json"
    c.write_text(json.dumps(_rect_fc(0.5, 0.5, 1.5, 1.5)))
    out = erase_layer(read_geojson(str(t)), read_geojson(str(c)))
    df = add_polygon_metrics(out).to_pandas()
    assert len(df) == 4
    assert np.allclose(df["area"], 0.75)
    # total: clip + erase partition each feature exactly
    assert np.isclose(df["area"].sum() + 4 * 0.25, 4.0)


def test_clip_disjoint(ray_session, tmp_path):
    t = tmp_path / "t.json"
    t.write_text(json.dumps(_grid_fc(1, groups=("g",))))
    c = tmp_path / "c.json"
    c.write_text(json.dumps(_rect_fc(10, 10, 11, 11)))
    out = clip_layer(read_geojson(str(t)), read_geojson(str(c)))
    assert out.count() == 0
    out2 = erase_layer(read_geojson(str(t)), read_geojson(str(c)))
    df = add_polygon_metrics(out2).to_pandas()
    assert len(df) == 1 and np.isclose(df["area"].iloc[0], 1.0)


@pytest.mark.parametrize("seed", [3, 19])
def test_clip_erase_partition_random(ray_session, tmp_path, seed):
    """Randomized property: clip + erase partition every target feature
    exactly (areas sum to the original), with a random clip polygon."""
    import ray.data as rd
    rng = np.random.RandomState(seed)
    feats = []
    for i in range(6):
        x0, y0 = rng.uniform(0, 5, 2)
        w, h = rng.uniform(1, 2.5, 2)
        feats.append({"feature_id": i,
                      "rings_x": [[x0, x0 + w, x0 + w, x0, x0]],
                      "rings_y": [[y0, y0, y0 + h, y0 + h, y0]],
                      "ring_poly": [0]})
    target = rd.from_items(feats)
    cx, cy = rng.uniform(1, 5, 2)
    r = rng.uniform(1.5, 3)
    clip = rd.from_items([{
        "feature_id": 0,
        "rings_x": [[cx - r, cx, cx + r, cx, cx - r]],
        "rings_y": [[cy, cy - r, cy, cy + r, cy]],
        "ring_poly": [0]}])
    orig = add_polygon_metrics(target).to_pandas().set_index("feature_id")
    c = add_polygon_metrics(clip_layer(target, clip)).to_pandas() \
        .set_index("feature_id")
    e = add_polygon_metrics(erase_layer(target, clip)).to_pandas() \
        .set_index("feature_id")
    for fid in orig.index:
        total = c["area"].get(fid, 0.0) + e["area"].get(fid, 0.0)
        assert np.isclose(total, orig.loc[fid, "area"], rtol=1e-6), fid


def _metrics(out, key=None):
    df = add_polygon_metrics(out, perimeter_col="perimeter").to_pandas()
    cols = [c for c in (key, "v") if c and c in df.columns]
    df = df.sort_values(cols or ["feature_id"]).reset_index(drop=True)
    return df


def test_dissolve_layer_distributed_matches_local(ray_session, tmp_path):
    """Cell-shuffle dissolve (pre-cut at cell lines + two-stage arc
    cancellation) must reproduce the single-pass kernel's area,
    perimeter, ring count and aggregates — cell size chosen so cut
    lines do NOT align with the mesh, forcing real mid-feature cuts."""
    src = tmp_path / "g.json"
    src.write_text(json.dumps(_grid_fc(4, groups=("a", "b", "c"))))
    ds = read_geojson(str(src))
    local = _metrics(dissolve_layer(ds, "grp", sum_fields=("v",)), "grp")
    dist = _metrics(dissolve_layer(ds, "grp", sum_fields=("v",),
                                   cell=1.7), "grp")
    assert list(local["grp"]) == list(dist["grp"])
    assert list(local["v"]) == list(dist["v"])
    assert np.allclose(local["area"], dist["area"])
    assert np.allclose(local["perimeter"], dist["perimeter"])
    assert [len(r) for r in local["rings_x"]] == \
        [len(r) for r in dist["rings_x"]]


@pytest.mark.parametrize("which", ["clip", "erase"])
def test_overlay_cell_path_matches_broadcast(ray_session, tmp_path, which):
    t = tmp_path / "t.json"
    t.write_text(json.dumps(_grid_fc(3, groups=("g",))))
    c = tmp_path / "c.json"
    c.write_text(json.dumps(_rect_fc(0.4, 0.4, 2.3, 2.6)))
    fn = clip_layer if which == "clip" else erase_layer
    base = _metrics(fn(read_geojson(str(t)), read_geojson(str(c))))
    cellp = _metrics(fn(read_geojson(str(t)), read_geojson(str(c)),
                        cell=1.3))
    a = base.sort_values("feature_id").reset_index(drop=True)
    b = cellp.sort_values("feature_id").reset_index(drop=True)
    assert list(a["feature_id"]) == list(b["feature_id"])
    assert np.allclose(a["area"], b["area"])
    assert np.allclose(a["perimeter"], b["perimeter"])


def test_dissolve2_layer_distributed_matches_local(ray_session):
    """General-input distributed dissolve2 (cell pre-cut enforced)
    reproduces the in-process kernel's per-key union areas on
    OVERLAPPING input whose overlaps span cell borders."""
    import ray.data as rd
    from mapshaper_ray.pipelines.overlay import dissolve2_layer
    rows = []
    for i in range(12):
        r, c = divmod(i, 4)
        w = 1.6 if c % 2 == 0 else 1.0  # overlaps right neighbor
        rows.append({"feature_id": i,
                     "grp": f"g{i % 2}",
                     "rings_x": [[c * 1.0, c + w, c + w, c * 1.0, c * 1.0]],
                     "rings_y": [[r * 1.0, r * 1.0, r + 1.0, r + 1.0,
                                  r * 1.0]],
                     "ring_poly": [0]})
    ds = rd.from_items(rows)
    local = _metrics(dissolve2_layer(ds, "grp"), "grp")
    # cell=1.3 cuts straight through the overlap regions
    dist = _metrics(dissolve2_layer(ds, "grp", cell=1.3), "grp")
    assert list(local["grp"]) == list(dist["grp"])
    assert np.allclose(local["area"], dist["area"])


def test_distributed_dissolve_partitioning_invariant(ray_session):
    """North-star determinism: the distributed dissolve produces
    identical output regardless of input block structure."""
    import ray.data as rd
    from mapshaper_ray.pipelines.overlay import dissolve_layer
    rows = []
    for i in range(64):
        r, c = divmod(i, 8)
        rows.append({"feature_id": i, "grp": f"g{(i * 7) % 3}", "v": 1,
                     "rings_x": [[c, c + 1.0, c + 1.0, c, c]],
                     "rings_y": [[r, r, r + 1.0, r + 1.0, r]],
                     "ring_poly": [0]})
    outs = []
    for nblocks in (1, 3, 13):
        ds = rd.from_items(rows).repartition(nblocks)
        out = dissolve_layer(ds, "grp", sum_fields=("v",), cell=2.7) \
            .to_pandas().sort_values("grp").reset_index(drop=True)
        outs.append(out)
    for o in outs[1:]:
        assert list(o["grp"]) == list(outs[0]["grp"])
        assert list(o["v"]) == list(outs[0]["v"])
        for a, b in zip(outs[0]["rings_x"], o["rings_x"]):
            assert [list(map(float, r)) for r in a] == \
                [list(map(float, r)) for r in b]


def test_distributed_dissolve_int_key_dtype(ray_session):
    """Non-string dissolve keys survive the distributed path (the
    kernel stringifies internally only) and aggregates merge."""
    import ray.data as rd
    from mapshaper_ray.pipelines.overlay import dissolve_layer
    rows = []
    for i in range(16):
        r, c = divmod(i, 4)
        rows.append({"feature_id": i, "grp": int(i % 3), "v": 1,
                     "rings_x": [[c, c + 1.0, c + 1.0, c, c]],
                     "rings_y": [[r, r, r + 1.0, r + 1.0, r]],
                     "ring_poly": [0]})
    ds = rd.from_items(rows)
    out = dissolve_layer(ds, "grp", sum_fields=("v",), cell=1.7) \
        .to_pandas().sort_values("grp").reset_index(drop=True)
    assert list(out["grp"]) == [0, 1, 2]
    assert out["grp"].dtype.kind == "i"
    assert list(out["v"]) == [6, 5, 5]
