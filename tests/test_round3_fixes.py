"""Round-3 regressions: ADVICE fixes (split-on-grid null geometry,
directory-export options) and the auto-distributed layer-op defaults
(VERDICT round 2 'next round' items 1/3)."""

import json

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from mapshaper_ray.ops.features import add_polygon_metrics
from mapshaper_ray.pipelines import overlay as ov
from mapshaper_ray.sources.geojson import read_geojson


def _grid_layer(n=5, groups=("a", "b", "c")):
    feats = []
    for i in range(n * n):
        r, c = divmod(i, n)
        x0, y0 = float(c), float(r)
        feats.append({"feature_id": i,
                      "grp": groups[c % len(groups)], "v": 1,
                      "rings_x": [[x0, x0 + 1, x0 + 1, x0, x0]],
                      "rings_y": [[y0, y0, y0 + 1, y0 + 1, y0]],
                      "ring_poly": [0]})
    return rd.from_items(feats)


# ---------------------------------------------------------------------------
# ADVICE: split_on_grid null-geometry crash

def test_split_on_grid_null_geometry(ray_session):
    """Features with empty geometry get the reference's '' cell id
    instead of IntCastingNaNError (mapshaper-split-on-grid.js
    hasBounds())."""
    from mapshaper_ray.ops.split import split_on_grid
    ds = rd.from_items([
        {"feature_id": 0, "rings_x": [[0.0, 1.0, 1.0, 0.0, 0.0]],
         "rings_y": [[0.0, 0.0, 1.0, 1.0, 0.0]], "ring_poly": [0]},
        {"feature_id": 1, "rings_x": [], "rings_y": [],
         "ring_poly": []},
    ])
    out = split_on_grid(ds, 2, 2, bbox=(0, 0, 2, 2)).to_pandas() \
        .sort_values("feature_id")
    assert list(out["cell"]) == ["r0c0", ""]


# ---------------------------------------------------------------------------
# auto-distributed defaults

def test_auto_cell_size_thresholds(ray_session):
    ds = _grid_layer(3)
    # below threshold -> local (None)
    cell, _ = ov.auto_cell_size(ds)
    assert cell is None
    # above threshold -> a positive cell derived from the bbox
    cell, bbox = ov.auto_cell_size(ds, n=10_000)
    assert cell is not None and cell > 0
    assert bbox == (0.0, 0.0, 3.0, 3.0)


def test_dissolve_layer_auto_routes_distributed(ray_session,
                                                monkeypatch):
    """Default call (no cell=) on a >threshold layer runs the cell
    substrate and matches the forced-local kernel's invariants."""
    monkeypatch.setattr(ov, "AUTO_DISTRIBUTE_ROWS", 10)
    ds = _grid_layer(5)
    assert ov.auto_cell_size(ds)[0] is not None  # distributed selected
    auto = add_polygon_metrics(
        ov.dissolve_layer(ds, "grp", sum_fields=("v",)),
        perimeter_col="perimeter").to_pandas().sort_values("grp")
    local = add_polygon_metrics(
        ov.dissolve_layer(ds, "grp", sum_fields=("v",), cell=None),
        perimeter_col="perimeter").to_pandas().sort_values("grp")
    assert list(auto["grp"]) == list(local["grp"])
    assert list(auto["v"]) == list(local["v"])
    assert np.allclose(auto["area"], local["area"])
    assert np.allclose(auto["perimeter"], local["perimeter"])


def test_clip_layer_auto_routes_distributed(ray_session, monkeypatch):
    monkeypatch.setattr(ov, "AUTO_DISTRIBUTE_ROWS", 3)
    target = _grid_layer(3, groups=("g",))
    clip = rd.from_items([{
        "feature_id": 0,
        "rings_x": [[0.5, 2.5, 2.5, 0.5, 0.5]],
        "rings_y": [[0.5, 0.5, 2.5, 2.5, 0.5]], "ring_poly": [0]},
        {"feature_id": 1,
         "rings_x": [[2.4, 3.2, 3.2, 2.4, 2.4]],
         "rings_y": [[2.4, 2.4, 3.2, 3.2, 2.4]], "ring_poly": [0]},
        {"feature_id": 2,
         "rings_x": [[-1.0, 0.2, 0.2, -1.0, -1.0]],
         "rings_y": [[-1.0, -1.0, 0.2, 0.2, -1.0]], "ring_poly": [0]},
    ])
    auto_c = add_polygon_metrics(
        ov.clip_layer(target, clip)).to_pandas() \
        .set_index("feature_id")["area"]
    bcast_c = add_polygon_metrics(
        ov.clip_layer(target, clip, cell=None)).to_pandas() \
        .set_index("feature_id")["area"]
    assert sorted(auto_c.index) == sorted(bcast_c.index)
    assert np.allclose(auto_c.sort_index(), bcast_c.sort_index())
    auto_e = add_polygon_metrics(
        ov.erase_layer(target, clip)).to_pandas() \
        .set_index("feature_id")["area"]
    bcast_e = add_polygon_metrics(
        ov.erase_layer(target, clip, cell=None)).to_pandas() \
        .set_index("feature_id")["area"]
    assert np.allclose(auto_e.sort_index(), bcast_e.sort_index())


def test_dissolve2_layer_auto_and_keyless(ray_session, monkeypatch):
    monkeypatch.setattr(ov, "AUTO_DISTRIBUTE_ROWS", 10)
    ds = _grid_layer(5)
    auto = add_polygon_metrics(
        ov.dissolve2_layer(ds, "grp")).to_pandas().sort_values("grp")
    local = add_polygon_metrics(
        ov.dissolve2_layer(ds, "grp", cell=None)).to_pandas() \
        .sort_values("grp")
    assert list(auto["grp"]) == list(local["grp"])
    assert np.allclose(auto["area"], local["area"])
    # keyless -dissolve2 merges everything into one feature
    one = add_polygon_metrics(ov.dissolve2_layer(ds, None)).to_pandas()
    assert len(one) == 1 and np.isclose(one["area"].iloc[0], 25.0)


def test_simplify_layer_auto_routes_distributed(ray_session,
                                                monkeypatch):
    from mapshaper_ray.pipelines import simplify_layer as sl
    monkeypatch.setattr(sl, "SIMPLIFY_AUTO_ROWS", 10)
    ds = _grid_layer(5)
    auto = sl.simplify_layer(ds, pct=0.5).to_pandas() \
        .sort_values("feature_id").reset_index(drop=True)
    monkeypatch.setattr(sl, "SIMPLIFY_AUTO_ROWS", 10 ** 9)
    local = sl.simplify_layer(ds, pct=0.5).to_pandas() \
        .sort_values("feature_id").reset_index(drop=True)
    assert len(auto) == len(local)
    for i in range(len(auto)):
        for col in ("rings_x", "rings_y"):
            a = [np.asarray(v, float) for v in auto.iloc[i][col]]
            b = [np.asarray(v, float) for v in local.iloc[i][col]]
            assert len(a) == len(b)
            for av, bv in zip(a, b):
                assert np.allclose(av, bv)


def _segments(df):
    """Canonical undirected segment multiset of a polyline layer."""
    segs = []
    for px, py in zip(df["part_x"], df["part_y"]):
        for x, y in zip(px, py):
            x = np.asarray(x, float)
            y = np.asarray(y, float)
            for i in range(len(x) - 1):
                a = (round(x[i], 9), round(y[i], 9))
                b = (round(x[i + 1], 9), round(y[i + 1], 9))
                segs.append((a, b) if a <= b else (b, a))
    return sorted(segs)


def test_innerlines_distributed_matches_local(ray_session):
    from mapshaper_ray.pipelines.geometry import (
        innerlines_layer, innerlines_layer_distributed)
    ds = _grid_layer(4)
    for inner_only in (True, False):
        local = innerlines_layer(ds, inner_only=inner_only,
                                 distributed=False).to_pandas()
        dist = innerlines_layer_distributed(
            ds, inner_only=inner_only).to_pandas()
        assert _segments(local) == _segments(dist)
        if not inner_only:
            assert sorted(local["TYPE"]) == sorted(dist["TYPE"])


def test_innerlines_auto_threshold(ray_session, monkeypatch):
    from mapshaper_ray.pipelines import geometry as g
    monkeypatch.setattr(ov, "AUTO_DISTRIBUTE_ROWS", 5)
    ds = _grid_layer(3)
    out = g.innerlines_layer(ds).to_pandas()   # routes distributed
    local = g.innerlines_layer(ds, distributed=False).to_pandas()
    assert _segments(out) == _segments(local)


# ---------------------------------------------------------------------------
# feature-proxy completion ($.bounds/$.width/$.height/$.innerX/$.isNull/$.x)

def test_proxy_accessors_reference_fixture(ray_session):
    """The reference's each-calc-test.js proxy fixture (two polygons +
    one null shape): partCount/isNull/width/height/bounds match the
    reference's expected records exactly."""
    from mapshaper_ray.ops.relational import each_expr
    ds = rd.from_items([
        {"feature_id": 0,
         "rings_x": [[1.0, 1.0, 2.0, 2.0, 1.0]],
         "rings_y": [[2.0, 3.0, 3.0, 2.0, 2.0]], "ring_poly": [0]},
        {"feature_id": 1,
         "rings_x": [[2.0, 3.0, 3.0, 2.0, 2.0],
                     [3.0, 3.0, 1.0, 1.0, 2.0, 2.0, 3.0]],
         "rings_y": [[3.0, 3.0, 2.0, 2.0, 3.0],
                     [2.0, 1.0, 1.0, 2.0, 2.0, 3.0, 2.0]],
         "ring_poly": [0, 1]},
        {"feature_id": 2, "rings_x": [], "rings_y": [],
         "ring_poly": []},
    ])
    out = each_expr(ds, {"parts": "part_count", "nul": "isNull",
                         "h": "height", "w": "width",
                         "bb": "bounds"}).to_pandas() \
        .sort_values("feature_id").reset_index(drop=True)
    assert list(out["parts"]) == [1, 2, 0]
    assert list(out["nul"]) == [False, False, True]
    assert list(out["w"]) == [1.0, 2.0, 0.0]
    assert list(out["h"]) == [1.0, 2.0, 0.0]
    assert list(out["bb"]) == [[1.0, 2.0, 2.0, 3.0],
                               [1.0, 1.0, 3.0, 3.0], []]


def test_proxy_inner_point_and_xy_setter(ray_session):
    from mapshaper_ray.ops.relational import each_expr
    # innerX/innerY on a unit square = anchor point inside the ring
    ds = rd.from_items([{
        "feature_id": 0,
        "rings_x": [[0.0, 0.0, 4.0, 4.0, 0.0]],
        "rings_y": [[0.0, 4.0, 4.0, 0.0, 0.0]], "ring_poly": [0]}])
    out = each_expr(ds, {"ix": "innerX", "iy": "innerY"}).to_pandas()
    assert 0.0 < out["ix"].iloc[0] < 4.0
    assert 0.0 < out["iy"].iloc[0] < 4.0
    # x/y getter + setter on a point layer moves the geometry
    pts = rd.from_items([
        {"feature_id": 0, "px": [1.0], "py": [2.0]},
        {"feature_id": 1, "px": [5.0], "py": [6.0]}])
    moved = each_expr(pts, {"x": "x + 10", "y": "y - 1"}).to_pandas() \
        .sort_values("feature_id")
    assert [list(v) for v in moved["px"]] == [[11.0], [15.0]]
    assert [list(v) for v in moved["py"]] == [[1.0], [5.0]]
    # getter without setter exposes a plain column
    got = each_expr(pts, {"east": "x > 3"}).to_pandas() \
        .sort_values("feature_id")
    assert list(got["east"]) == [False, True]


def test_js_shim_string_expressions(ray_session):
    """Documented JS→Python shims: pandas .str methods + where()."""
    from mapshaper_ray.ops.relational import each_expr
    ds = rd.from_items([{"feature_id": 0, "name": "ohio"},
                        {"feature_id": 1, "name": "utah"}])
    out = each_expr(ds, {
        "upper": "name.str.upper()",
        "flag": "where(name.str.contains('hi'), 'yes', 'no')",
    }).to_pandas().sort_values("feature_id")
    assert list(out["upper"]) == ["OHIO", "UTAH"]
    assert list(out["flag"]) == ["yes", "no"]


def test_minhash_distributed_verify_matches_driver(ray_session,
                                                   monkeypatch):
    """Forcing the candidate cap to 0 routes minhash_lsh through the
    fully distributed verify (no candidate-table driver collect); the
    verified pair set must equal the bounded driver path's."""
    from mapshaper_ray.ops import dedup
    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    fast = dedup.minhash_lsh(ds, threshold=0.4)
    monkeypatch.setattr(dedup, "MINHASH_DRIVER_PAIR_CAP", 0)
    dist = dedup.minhash_lsh(ds, threshold=0.4)
    assert set(zip(fast.id_a, fast.id_b)) == \
        set(zip(dist.id_a, dist.id_b))
    f = fast.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    d = dist.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert np.allclose(f["jaccard"], d["jaccard"])


def test_json_table_reader(ray_session, tmp_path):
    """JSON array of plain records -> data-only layer with feature ids
    (reference importJSONTable)."""
    from mapshaper_ray import api
    p = tmp_path / "t.json"
    p.write_text(json.dumps([{"name": "a", "v": 1},
                             {"name": "b", "v": 2}]))
    out = api.i(str(p)).to_pandas()
    assert list(out.columns) == ["feature_id", "name", "v"]
    assert list(out["feature_id"]) == [0, 1]
    assert list(out["v"]) == [1, 2]


def test_deterministic_sample_partition_independent(ray_session):
    """Sample membership is a pure function of (seed, id): identical
    across repartitionings; different seeds give different sets."""
    from mapshaper_ray.ops.relational import deterministic_sample
    ds = rd.range(2000).map_batches(
        lambda df: df.rename(columns={"id": "doc_id"}),
        batch_format="pandas")
    a = sorted(deterministic_sample(ds, 0.3).to_pandas()["doc_id"])
    b = sorted(deterministic_sample(ds.repartition(7), 0.3)
               .to_pandas()["doc_id"])
    c = sorted(deterministic_sample(ds, 0.3, seed=8)
               .to_pandas()["doc_id"])
    assert a == b
    assert a != c
    assert 0.25 < len(a) / 2000 < 0.35


def test_multi_file_import_divides_pipeline(ray_session, tmp_path):
    """-i a.json b.json <cmds> -o dir/ with no combine/merge runs the
    whole pipeline once per file from a replaced catalog (reference
    divideImportCommand)."""
    from mapshaper_ray.commands import run_commands
    for name, v in (("a", 1), ("b", 2)):
        (tmp_path / f"{name}.json").write_text(json.dumps({
            "type": "FeatureCollection", "features": [
                {"type": "Feature", "properties": {"v": v},
                 "geometry": {"type": "Point",
                              "coordinates": [v, v]}}]}))
    out = tmp_path / "out"
    run_commands(f"-i {tmp_path}/a.json {tmp_path}/b.json "
                 f"-each 'w = v * 10' -o {out}/")
    a = json.loads((out / "a.json").read_text())
    b = json.loads((out / "b.json").read_text())
    assert [f["properties"]["w"] for f in a["features"]] == [10]
    assert [f["properties"]["w"] for f in b["features"]] == [20]
    # each run starts from a REPLACED catalog: a.json's output must
    # not contain b's feature and vice versa
    assert len(a["features"]) == 1 and len(b["features"]) == 1


def test_all_pairs_jaccard_exact_vs_bruteforce(ray_session):
    """all_pairs_jaccard (PPJoin prefix filtering) finds EVERY pair
    with shingle Jaccard >= t — compared against an O(n^2) brute force
    over random small-vocab docs with planted near-dups, across
    thresholds and shingle sizes."""
    import re
    import pandas as pd
    import ray.data as rd
    from mapshaper_ray.ops.dedup import all_pairs_jaccard
    from mapshaper_ray.stages.text import window_hashes

    rng = np.random.RandomState(0)
    vocab = ["tok%d" % i for i in range(40)]
    docs = []
    for _ in range(100):
        docs.append(" ".join(rng.choice(vocab, rng.randint(5, 60))))
    for i in range(0, 16, 2):   # planted near-dups (one token swapped)
        toks = docs[i].split()
        toks[rng.randint(len(toks))] = "tokX"
        docs[i + 1] = " ".join(toks)
    docs[40] = ""               # degenerate: empty doc
    docs[41] = ""               # empty-empty pair must score 1.0
    ds = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(100),
                                      "text": docs}))
    ws = re.compile(r"\S+")
    for t, k in ((0.8, 3), (0.5, 3), (0.9, 5)):
        out = all_pairs_jaccard(ds, threshold=t, shingle_k=k)
        sets = [np.unique(window_hashes(ws.findall(s), k))
                for s in docs]
        exp = []
        for a in range(100):
            for b in range(a + 1, 100):
                inter = len(np.intersect1d(sets[a], sets[b],
                                           assume_unique=True))
                un = len(sets[a]) + len(sets[b]) - inter
                j = inter / un if un else 1.0
                if j >= t:
                    exp.append((a, b, round(j, 9)))
        got = [(int(r.id_a), int(r.id_b), round(r.jaccard, 9))
               for r in out.itertuples()]
        assert got == exp


def test_dissolve_points_reference_cases(ray_session):
    """Point-layer -dissolve (reference dissolve-points-test.js): all
    -> one planar centroid; latlong -> spherical (unit-3D-vector mean);
    field grouping ignores null points; weight= field; multipoint
    unsupported."""
    import pandas as pd
    from mapshaper_ray.pipelines.overlay import dissolve_layer

    # field grouping + nulls (the reference's exact fixture)
    df = pd.DataFrame({
        "feature_id": range(7),
        "px": [[], [1.0], [0.0], [2.0], [1.0], [2.0], [0.0]],
        "py": [[], [1.0], [0.0], [2.0], [0.0], [0.0], [2.0]],
        "foo": ["a", "a", "a", "a", "b", "c", "c"]})
    out = dissolve_layer(rd.from_pandas(df), "foo",
                         planar=True).to_pandas()
    assert out["px"].tolist() == [[1.0], [1.0], [1.0]]
    assert out["py"].tolist() == [[1.0], [0.0], [1.0]]
    assert out["foo"].tolist() == ["a", "b", "c"]

    # spherical centroid of (90,45) and (-90,45) is the north pole
    df = pd.DataFrame({"feature_id": [0, 1], "px": [[90.0], [-90.0]],
                       "py": [[45.0], [45.0]]})
    out = dissolve_layer(rd.from_pandas(df), None).to_pandas()
    assert abs(out["py"].iloc[0][0] - 90.0) < 1e-9

    # weighted: w=0 point is ignored entirely
    df = pd.DataFrame({"feature_id": [0, 1, 2],
                       "px": [[1.0], [0.0], [1.0]],
                       "py": [[13.0], [0.0], [2.0]],
                       "w": [0, 1, 3]})
    out = dissolve_layer(rd.from_pandas(df), None, weight="w",
                         planar=True).to_pandas()
    assert out["px"].iloc[0] == [0.75] and out["py"].iloc[0] == [1.5]

    # multipoints are not supported
    df = pd.DataFrame({"feature_id": [0], "px": [[1.0, 0.0]],
                       "py": [[1.0, 0.0]]})
    with pytest.raises(Exception):
        dissolve_layer(rd.from_pandas(df), None,
                       planar=True).to_pandas()


def test_dissolve_points_command(ray_session, tmp_path):
    """-dissolve field weight= planar on a point GeoJSON via the
    command pipeline."""
    import json as _json
    from mapshaper_ray.commands import run_commands
    src = tmp_path / "pts.json"
    src.write_text(_json.dumps({
        "type": "FeatureCollection", "features": [
            {"type": "Feature", "properties": {"g": g, "w": w},
             "geometry": {"type": "Point", "coordinates": c}}
            for g, w, c in [("a", 1, [0.0, 0.0]), ("a", 3, [4.0, 8.0]),
                            ("b", 2, [5.0, 5.0])]]}))
    run_commands(f"-i {src} -dissolve g weight=w planar "
                 f"-o {tmp_path}/out.json")
    doc = _json.loads((tmp_path / "out.json").read_text())
    got = [(f["properties"]["g"], f["geometry"]["coordinates"])
           for f in doc["features"]]
    assert got == [("a", [3.0, 6.0]), ("b", [5.0, 5.0])]


def test_cluster_max_caps(ray_session):
    """-cluster max-area / max-width / max-height veto merges whose
    combined area/bounds exceed the cap (reference
    getPolygonClusterCalculator score<0)."""
    import pandas as pd
    from mapshaper_ray.ops.neighbors import cluster_polygons

    # three unit squares in a row: (0..1), (1..2), (2..3)
    cent = pd.DataFrame({
        "fid": [0, 1, 2],
        "cx": [0.5, 1.5, 2.5], "cy": [0.5, 0.5, 0.5],
        "area": [1.0, 1.0, 1.0],
        "__xmin": [0.0, 1.0, 2.0], "__ymin": [0.0, 0.0, 0.0],
        "__xmax": [1.0, 2.0, 3.0], "__ymax": [1.0, 1.0, 1.0]})
    edges = pd.DataFrame({"fid_a": [0, 1], "fid_b": [1, 2]})

    # uncapped: everything merges into one cluster
    g = cluster_polygons(cent, edges, pct=1.0)
    assert len(set(g.values())) == 1
    # max_area=2: only one pairwise merge fits
    g = cluster_polygons(cent, edges, pct=1.0, max_area=2.0)
    assert len(set(g.values())) == 2
    # max_width=2: combined width 3 vetoed, width 2 allowed
    g = cluster_polygons(cent, edges, pct=1.0, max_width=2.0)
    assert len(set(g.values())) == 2
    # max_width=1: nothing can merge
    g = cluster_polygons(cent, edges, pct=1.0, max_width=1.0)
    assert len(set(g.values())) == 3


def test_explode_naive(ray_session):
    """-explode naive: each ring becomes its own polygon; hole rings
    flip to outer winding (explodePolygonNaive)."""
    import pandas as pd
    from mapshaper_ray.ops.features import explode
    from mapshaper_ray.geom.kernels import planar_ring_area

    outer_x = [0.0, 0.0, 4.0, 4.0, 0.0]   # CW (mapshaper-positive)
    outer_y = [0.0, 4.0, 4.0, 0.0, 0.0]
    hole_x = [1.0, 3.0, 3.0, 1.0, 1.0]    # CCW (hole winding)
    hole_y = [1.0, 1.0, 3.0, 3.0, 1.0]
    assert planar_ring_area(outer_x, outer_y) > 0
    assert planar_ring_area(hole_x, hole_y) < 0
    df = pd.DataFrame({"feature_id": [0],
                       "rings_x": [[outer_x, hole_x]],
                       "rings_y": [[outer_y, hole_y]],
                       "ring_poly": [[0, 0]]})
    out = explode(rd.from_pandas(df), naive=True).to_pandas()
    assert len(out) == 2                      # ring-per-feature
    for _, r in out.iterrows():
        assert len(r["rings_x"]) == 1
        assert planar_ring_area(r["rings_x"][0], r["rings_y"][0]) > 0
    # default explode keeps the hole attached
    out2 = explode(rd.from_pandas(df)).to_pandas()
    assert len(out2) == 1 and len(out2["rings_x"].iloc[0]) == 2


def test_proj_iteration_chunk_independent():
    """Iterative inverse solvers converge PER ELEMENT (the reference
    iterates each point's do/while independently): projecting an array
    whole vs. in chunks must be bit-identical — a whole-array np.all
    convergence test made results depend on batch/ring boundaries
    (regression: -proj densify projects per ring and drifted ~2e-6 m
    vs the reference on from=merc +proj=robin)."""
    import numpy as np
    from mapshaper_ray.stages.proj import (_phi2, merc_ell_inv,
                                           stere_inv, krovak_inv,
                                           aitoff_inv, nzmg_inv)

    rng = np.random.default_rng(7)
    x = rng.uniform(-1.8e6, 1.8e6, 64)
    y = rng.uniform(-1.5e6, 1.5e6, 64)

    def chunked(fn, x, y, k):
        outs = [fn(x[i:i + k], y[i:i + k]) for i in range(0, len(x), k)]
        return (np.concatenate([o[0] for o in outs]),
                np.concatenate([o[1] for o in outs]))

    for fn in (merc_ell_inv,
               lambda a, b: stere_inv(a, b, lat0=52.15, lon0=5.38,
                                      k0=0.9999079),
               aitoff_inv, nzmg_inv):
        whole = fn(x, y)
        for k in (1, 7, 64):
            cx, cy = chunked(fn, x, y, k)
            assert np.array_equal(whole[0], cx)
            assert np.array_equal(whole[1], cy)

    # scalar call path still works
    ts = np.exp(-np.linspace(0.1, 1.5, 5))
    whole = _phi2(ts)
    singles = np.array([_phi2(float(t)) for t in ts])
    assert np.array_equal(whole, singles)


# ---------------------------------------------------------------------------
# round-3 code-review fixes: empty/null-text split semantics, empty S2
# cover, oblique-aeqd parse-time rejection


def _docs_with_degenerates():
    return rd.from_items([
        {"doc_id": 0, "text": "window stream hash window"},
        {"doc_id": 1, "text": ""},
        {"doc_id": 2, "text": None},
        {"doc_id": 3, "text": "stream stream stream"},
    ])


def test_bm25_empty_text_dl_matches_sql(ray_session):
    """dl follows len(string_split(text,' ')): empty/null text counts
    as one (empty) token, so avgdl matches the q61 DuckDB oracle."""
    import duckdb
    from mapshaper_ray.stages.text import bm25_topk
    got = bm25_topk(_docs_with_degenerates(),
                    ["window", "stream", "hash"], k=10)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                "(0, 'window stream hash window'), (1, ''), "
                "(2, NULL), (3, 'stream stream stream')) "
                "t(doc_id, text)")
    want = con.execute("""
        WITH words AS (SELECT doc_id,
               string_split(coalesce(text, ''), ' ') AS w
               FROM documents),
        base AS (SELECT doc_id, len(w) AS dl,
               len(list_filter(w, x -> x = 'window')) AS tf0,
               len(list_filter(w, x -> x = 'stream')) AS tf1,
               len(list_filter(w, x -> x = 'hash')) AS tf2 FROM words),
        g AS (SELECT count(*) AS nd, sum(dl)/count(*) AS avgdl,
              sum(CASE WHEN tf0>0 THEN 1 ELSE 0 END) AS df0,
              sum(CASE WHEN tf1>0 THEN 1 ELSE 0 END) AS df1,
              sum(CASE WHEN tf2>0 THEN 1 ELSE 0 END) AS df2 FROM base)
        SELECT doc_id,
          ln(1+(nd-df0+0.5)/(df0+0.5))*((tf0*2.2)
            /(tf0+1.2*(0.25+0.75*(dl/avgdl))))
        + ln(1+(nd-df1+0.5)/(df1+0.5))*((tf1*2.2)
            /(tf1+1.2*(0.25+0.75*(dl/avgdl))))
        + ln(1+(nd-df2+0.5)/(df2+0.5))*((tf2*2.2)
            /(tf2+1.2*(0.25+0.75*(dl/avgdl)))) AS bm25
        FROM base, g ORDER BY bm25 DESC, doc_id
        """).df()
    got = got.sort_values(["bm25", "doc_id"],
                          ascending=[False, True]).reset_index(drop=True)
    assert list(got["doc_id"]) == list(want["doc_id"])
    np.testing.assert_allclose(np.round(got["bm25"], 6),
                               np.round(want["bm25"], 6), atol=1e-6)


def test_repetition_empty_text_one_token(ray_session):
    """'' and NULL text -> n_words=1 (split semantics), matching
    len(string_split(coalesce(text,''),' ')) in the q56 oracle."""
    from mapshaper_ray.stages.text import repetition_signals
    out = repetition_signals(_docs_with_degenerates()).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[1, "n_words"] == 1
    assert out.loc[2, "n_words"] == 1
    assert out.loc[1, "distinct_word_ratio"] == 1.0
    assert out.loc[1, "top_bigram_share"] == 0.0
    assert out.loc[0, "n_words"] == 4


def test_pii_redactor_preserves_null(ray_session):
    """Null text stays null (SQL regexp_replace(NULL,..) IS NULL);
    non-null rows are redacted."""
    from mapshaper_ray.stages.text import redact_pii
    ds = rd.from_items([
        {"doc_id": 0, "text": "mail a@b.example.com or 123-555-0000"},
        {"doc_id": 1, "text": None},
    ])
    out = redact_pii(ds).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "text"] == "mail <EMAIL> or <PHONE>"
    assert out.loc[1, "text"] is None


def test_cover_contains_empty_cover():
    """Empty cover -> all-False, not IndexError."""
    from mapshaper_ray.s2 import cover_contains, lonlat_to_cell_id
    pts = lonlat_to_cell_id(np.array([10.0, 20.0]),
                            np.array([1.0, 2.0]))
    got = cover_contains(np.empty(0, dtype=np.uint64), pts)
    assert got.dtype == bool and got.shape == (2,) and not got.any()
    assert cover_contains(np.empty(0, dtype=np.uint64),
                          np.empty(0, dtype=np.uint64)).shape == (0,)


def test_parse_prj_oblique_aeqd_rejected():
    """Oblique Azimuthal_Equidistant .prj is rejected at parse time
    (returns None -> clean 'unsupported' error), not deferred to a
    NotImplementedError inside a worker; polar stays supported."""
    from mapshaper_ray.stages.proj import parse_prj
    wkt = ('PROJCS["aeqd",GEOGCS["WGS84",DATUM["WGS_1984",'
           'SPHEROID["WGS 84",6378137,298.257223563]],'
           'PRIMEM["Greenwich",0],'
           'UNIT["degree",0.017453292519943295]],'
           'PROJECTION["Azimuthal_Equidistant"],'
           'PARAMETER["latitude_of_center",{lat}],'
           'PARAMETER["central_meridian",0],UNIT["metre",1]]')
    assert parse_prj(wkt.format(lat=20)) is None
    polar = parse_prj(wkt.format(lat=90))
    assert polar is not None
    fwd = polar[0] if isinstance(polar, tuple) else None
    if fwd is not None:
        x, y = fwd(np.array([10.0]), np.array([80.0]))
        assert np.isfinite(x).all() and np.isfinite(y).all()


def test_exact_substring_dedup_vs_duckdb(ray_session):
    """ExactSubstr dedup (Lee et al. 2022): engine output is
    byte-identical to the SQL oracle on a randomized corpus with
    planted cross-doc and within-doc duplicate spans plus degenerate
    docs (empty, null, <k tokens)."""
    import duckdb

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for d in range(40):
        n = int(rng.integers(0, 30))
        toks = [vocab[int(j)] for j in rng.integers(0, len(vocab), n)]
        rows.append({"doc_id": d, "text": " ".join(toks)})
    # planted duplicates: a shared 7-token passage in several docs,
    # and one doc repeating its own 5-token run
    passage = "p0 p1 p2 p3 p4 p5 p6"
    for d in (3, 11, 27):
        rows[d]["text"] = (rows[d]["text"] + " " + passage).strip()
    rows[33]["text"] = "r0 r1 r2 r3 r4 r0 r1 r2 r3 r4 tail"
    rows.append({"doc_id": 40, "text": ""})
    rows.append({"doc_id": 41, "text": None})
    rows.append({"doc_id": 42, "text": "a b c"})

    import ray.data as rd
    from mapshaper_ray.ops.dedup import exact_substring_dedup
    got = exact_substring_dedup(rd.from_items(rows), k=5) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    [(r["doc_id"], r["text"]) for r in rows])
    import __ray_entry__ as E
    want = con.execute(E.oracle_sql()["q68_exact_substring_dedup"]).df()
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["text"]) == list(want["text"])
    # the planted cross-doc passage survives exactly once
    surviving = sum(passage in t for t in got["text"])
    assert surviving == 1
    # the self-repeating doc keeps one copy of its run
    assert got.loc[got["doc_id"] == 33, "text"].iloc[0] \
        == "r0 r1 r2 r3 r4 tail"


def test_dsir_weights_vs_duckdb(ray_session):
    """DSIR importance weights are integer-exact vs the SQL oracle
    (quantized-log trick) and rank target-language docs higher."""
    import duckdb
    import ray.data as rd
    from mapshaper_ray.stages.text import dsir_weights
    rng = np.random.default_rng(3)
    en = ["the", "and", "of", "to", "fast", "key"]
    de = ["der", "die", "und", "das", "ist", "ein"]
    rows = []
    for d in range(30):
        lang = "en" if d % 2 == 0 else "de"
        vocab = en if lang == "en" else de
        toks = [vocab[int(j)]
                for j in rng.integers(0, len(vocab),
                                      int(rng.integers(2, 12)))]
        rows.append({"doc_id": d, "text": " ".join(toks),
                     "lang": lang})
    rows.append({"doc_id": 30, "text": "", "lang": "en"})
    rows.append({"doc_id": 31, "text": None, "lang": "de"})
    got = dsir_weights(rd.from_items(rows)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents "
                "(doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?,?)",
                    [(r["doc_id"], r["text"], r["lang"])
                     for r in rows])
    import __ray_entry__ as E
    want = con.execute(E.oracle_sql()["q69_dsir_weights"]).df()
    assert list(got["doc_id"]) == list(want["doc_id"])
    np.testing.assert_array_equal(got["dsir_logw"].to_numpy(),
                                  want["dsir_logw"].to_numpy())
    g = got.merge(pd.DataFrame(rows)[["doc_id", "lang"]], on="doc_id")
    nz = g[g["dsir_logw"] != 0]
    assert nz[nz["lang"] == "en"]["dsir_logw"].mean() \
        > nz[nz["lang"] == "de"]["dsir_logw"].mean()


def test_pq_topk_exact_recovery_and_codes(ray_session):
    """PQ+ADC+re-rank recovers the exact top-k at validated settings;
    the codes index is genuinely m bytes per vector."""
    from mapshaper_ray.ops.ann import (brute_topk, pq_encode,
                                       pq_topk, pq_train)
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(400, 64)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": vecs[i]} for i in range(400)]
    ds = rd.from_items(rows)
    q = vecs[:3].astype(np.float64)
    qids = np.arange(3)
    exact = brute_topk(ds, q, qids, k=8).to_pandas() \
        .sort_values(["query_id", "cosine", "vec_id"],
                     ascending=[True, False, True]) \
        .reset_index(drop=True)
    pq = pq_topk(ds, q, qids, k=8, m_subspaces=16, n_codes=16,
                 shortlist=16).to_pandas() \
        .sort_values(["query_id", "cosine", "vec_id"],
                     ascending=[True, False, True]) \
        .reset_index(drop=True)
    assert len(exact) == len(pq) == 24
    assert (exact[["query_id", "vec_id"]].values
            == pq[["query_id", "vec_id"]].values).all()
    np.testing.assert_allclose(exact["cosine"], pq["cosine"],
                               rtol=0, atol=1e-12)
    books = pq_train(vecs[:200], 16, 16)
    codes = pq_encode(ds, books).to_pandas()
    assert len(codes) == 400
    assert all(len(c) == 16 for c in codes["pq_code"])  # 16 B/vec


def test_bpe_train_vs_bruteforce(ray_session):
    """Distributed BPE trainer reproduces an independent plain-dict
    trainer exactly, incl. the (count desc, lexicographic pair)
    tie-break and early exhaustion on a tiny vocab."""
    from collections import Counter

    from mapshaper_ray.stages.text import bpe_train

    def brute(texts, n):
        wc = Counter(w for t in texts
                     for w in (t or "").split(" ") if w)
        vocab = {tuple(list(w) + ["</w>"]): f for w, f in wc.items()}
        merges = []
        for r in range(n):
            pc = Counter()
            for syms, f in vocab.items():
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] += f
            if not pc:
                break
            (a, b), c = min(pc.items(),
                            key=lambda kv: (-kv[1], kv[0]))
            merges.append((r, a, b, c))
            new = {}
            for syms, f in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a \
                            and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                new[tuple(out)] = new.get(tuple(out), 0) + f
            vocab = new
        return merges

    rng = np.random.default_rng(5)
    vocab = ["stream", "window", "hash", "sort", "merge", "a", "bb"]
    texts = [" ".join(vocab[int(j)] for j in
                      rng.integers(0, len(vocab),
                                   int(rng.integers(0, 15))))
             for _ in range(60)] + ["", None]
    got = bpe_train(rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]),
        n_merges=15)
    want = brute(texts, 15)
    assert [tuple(r) for r in got.to_records(index=False)] == want
    # tiny corpus exhausts: "a" alone has one pair then none
    tiny = bpe_train(rd.from_items([{"text": "a a a"}]), n_merges=5)
    assert [tuple(r)[1:] for r in tiny.to_records(index=False)] \
        == [("a", "</w>", 3)]


def test_bpe_encode_vs_bruteforce(ray_session):
    """Greedy BPE apply matches an independent scalar encoder on the
    trained merges (rank-order replay, distinct-word cache)."""
    from mapshaper_ray.stages.text import bpe_encode, bpe_train

    def brute(texts, merges):
        ranks = {(l, r): i for i, (_, l, r, _) in enumerate(merges)}

        def enc(w):
            syms = list(w) + ["</w>"]
            while len(syms) > 1:
                cand = [(ranks[(a, b)], i) for i, (a, b)
                        in enumerate(zip(syms, syms[1:]))
                        if (a, b) in ranks]
                if not cand:
                    break
                _, i = min(cand)
                syms[i:i + 2] = [syms[i] + syms[i + 1]]
            return len(syms)

        return [(d, len(ws), sum(enc(w) for w in ws))
                for d, t in enumerate(texts)
                for ws in [[w for w in (t or "").split(" ") if w]]]

    rng = np.random.default_rng(9)
    vocab = ["stream", "window", "hash", "sort", "merge", "joins"]
    texts = [" ".join(vocab[int(j)] for j in
                      rng.integers(0, len(vocab),
                                   int(rng.integers(0, 12))))
             for _ in range(50)] + ["", None]
    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(texts)])
    merges = bpe_train(ds, n_merges=12)
    mlist = [tuple(r) for r in merges.to_records(index=False)]
    got = bpe_encode(ds, merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert [tuple(r) for r in got.to_records(index=False)] \
        == brute(texts, mlist)


def test_window_hopping_vs_tumbling_and_brute(ray_session):
    """Hopping windows: each event lands in length/hop windows; with
    hop == length it degenerates to the tumbling window."""
    import pandas as pd
    from mapshaper_ray.ops.relational import (window_hopping,
                                              window_tumbling)
    ts = pd.to_datetime([0, 1800, 3600, 5400, 7200, 10900],
                        unit="s")
    ds = rd.from_pandas(pd.DataFrame({
        "k": ["a", "a", "b", "a", "b", "b"],
        "ts": ts, "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]}))
    hop = window_hopping(ds, "k", "ts", 7200, 3600,
                         {"n": ("value", "count"),
                          "s": ("value", "sum")}).to_pandas() \
        .sort_values(["k", "window_start"]).reset_index(drop=True)
    # brute force: event t in windows w*3600 for w in
    # [floor((t-7200)/3600)+1 .. floor(t/3600)]
    rows = {}
    for k, t, v in zip(["a", "a", "b", "a", "b", "b"],
                       [0, 1800, 3600, 5400, 7200, 10900],
                       [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]):
        for w in range((t - 7200) // 3600 + 1, t // 3600 + 1):
            key = (k, w * 3600)
            n, s = rows.get(key, (0, 0.0))
            rows[key] = (n + 1, s + v)
    want = pd.DataFrame(
        [{"k": k, "window_start": w, "n": n, "s": s}
         for (k, w), (n, s) in sorted(rows.items())])
    pd.testing.assert_frame_equal(hop, want, check_dtype=False)
    # hop == length reduces to tumbling
    degen = window_hopping(ds, "k", "ts", 3600, 3600,
                           {"n": ("value", "count")}).to_pandas() \
        .sort_values(["k", "window_start"]).reset_index(drop=True)
    tum = window_tumbling(ds, "k", "ts", 3600,
                          {"n": ("value", "count")}).to_pandas() \
        .sort_values(["k", "window_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(degen, tum, check_dtype=False)


def test_mix_sample_budget_and_determinism(ray_session):
    """Mix sampling: per-source token budgets overshoot by at most
    one doc, results are partition-independent, and a dict budget
    restricts to listed sources."""
    from mapshaper_ray.stages.text import mix_sample
    rng = np.random.default_rng(13)
    rows = [{"doc_id": i, "source": f"s{i % 3}",
             "text": " ".join("w%d" % j for j in
                              rng.integers(0, 50,
                                           int(rng.integers(1, 30))))}
            for i in range(90)]
    ds1 = rd.from_items(rows)
    ds2 = rd.from_items(rows).repartition(7)
    a = mix_sample(ds1, 100).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    b = mix_sample(ds2, 100).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    tot = a.groupby("source")["n_tokens"].sum()
    last = a.groupby("source")["n_tokens"].max()
    assert (tot >= 100).all()            # budget reached
    assert (tot - last < 100).all()      # overshoot <= one doc
    only = mix_sample(ds1, {"s1": 50}).to_pandas()
    assert set(only["source"]) == {"s1"}


def test_decontaminate_planted_overlap(ray_session):
    """Docs sharing a k-window with the benchmark are flagged with
    exact hit counts; benchmark docs themselves are excluded."""
    from mapshaper_ray.stages.text import decontaminate
    passage = "a b c d e"
    rows = [
        {"doc_id": 0, "text": passage + " tail words here"},  # bench
        {"doc_id": 1, "text": "unrelated benchmark text row"},  # bench
        {"doc_id": 10, "text": "x y " + passage},        # 1 hit
        {"doc_id": 11, "text": passage + " " + passage},  # several
        {"doc_id": 12, "text": "no overlap at all q r s t u v"},
        {"doc_id": 13, "text": ""},
    ]
    ds = rd.from_items(rows)
    bench = rd.from_items(rows[:2])
    out = decontaminate(ds, bench, k=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    got = dict(zip(out["doc_id"], out["n_hits"]))
    assert 0 not in got and 1 not in got    # bench excluded
    assert got[10] == 1
    # doc 11 = 'a b c d e a b c d e': windows at pos 0 and 5 match
    # the passage; cross-boundary windows match bench doc 0's
    # 'a b c d e tail...' windows only where they exist
    assert got[11] >= 2
    assert 12 not in got and 13 not in got


def test_triangle_count_vs_bruteforce(ray_session):
    """Wedge-join triangle counting matches a brute-force adjacency
    intersection on a random multigraph with self-loops and
    duplicate/reversed edges."""
    from mapshaper_ray.ops.graph import triangle_count
    rng = np.random.default_rng(21)
    n = 120
    src = rng.integers(0, n, 800)
    dst = rng.integers(0, n, 800)
    ds = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    got = triangle_count(ds, num_buckets=16)
    es = {(min(a, b), max(a, b))
          for a, b in zip(src, dst) if a != b}
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = sum(1 for a, b in es for c in adj[a] & adj[b] if c > b)
    assert got == want
    assert triangle_count(
        rd.from_items([{"src": 0, "dst": 1}])) == 0


def test_hash_join_semi_anti(ray_session):
    """Bucketed semi/anti joins match pandas isin on a random key set
    with duplicates on both sides."""
    from mapshaper_ray.ops.relational import hash_join
    rng = np.random.default_rng(17)
    l = pd.DataFrame({"k": rng.integers(0, 40, 200),
                      "a": np.arange(200)})
    r = pd.DataFrame({"k": rng.integers(20, 60, 150),
                      "b": np.arange(150)})
    lds, rds = rd.from_pandas(l), rd.from_pandas(r)
    semi = hash_join(lds, rds, on="k", how="semi").to_pandas() \
        .sort_values("a").reset_index(drop=True)
    anti = hash_join(lds, rds, on="k", how="anti").to_pandas() \
        .sort_values("a").reset_index(drop=True)
    keys = set(r["k"])
    want_semi = l[l["k"].isin(keys)].reset_index(drop=True)
    want_anti = l[~l["k"].isin(keys)].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        semi[["k", "a"]], want_semi[["k", "a"]], check_dtype=False)
    pd.testing.assert_frame_equal(
        anti[["k", "a"]], want_anti[["k", "a"]], check_dtype=False)
    # semi never duplicates left rows on multi-match
    assert len(semi) == len(want_semi)


def test_percent_rank_ties_and_partition_independence(ray_session):
    """Distributed percent_rank matches pandas rank on data with
    heavy ties, regardless of input partitioning."""
    from mapshaper_ray.ops.rank import percent_rank
    rng = np.random.default_rng(23)
    vals = rng.integers(0, 25, 300).astype(float)  # many ties
    df = pd.DataFrame({"doc_id": np.arange(300), "v": vals})
    want = ((df["v"].rank(method="min") - 1) / (len(df) - 1)) \
        .round(6).to_numpy()
    for parts in (1, 9):
        got = percent_rank(rd.from_pandas(df).repartition(parts),
                           "v", "doc_id", n_bins=16).to_pandas() \
            .sort_values("doc_id")
        np.testing.assert_array_equal(got["pct_rank"].to_numpy(),
                                      want)


def test_grouped_topk_vs_pandas(ray_session):
    """Per-group top-k matches pandas nlargest semantics with ties,
    independent of partitioning; ascending mode = bottom-k."""
    from mapshaper_ray.ops.relational import grouped_topk
    rng = np.random.default_rng(29)
    df = pd.DataFrame({"g": rng.integers(0, 5, 120),
                       "v": rng.integers(0, 10, 120),
                       "id": np.arange(120)})
    want = df.sort_values(["g", "v", "id"],
                          ascending=[True, False, True]) \
        .groupby("g").head(4).sort_values(["g", "id"]) \
        .reset_index(drop=True)
    got = grouped_topk(rd.from_pandas(df).repartition(6),
                       "g", "v", 4, tie_col="id").to_pandas() \
        .sort_values(["g", "id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["g", "v", "id"]],
                                  want[["g", "v", "id"]],
                                  check_dtype=False)
    bot = grouped_topk(rd.from_pandas(df), "g", "v", 2,
                       ascending=True, tie_col="id").to_pandas()
    wb = df.sort_values(["g", "v", "id"]).groupby("g").head(2)
    assert sorted(bot["id"]) == sorted(wb["id"])


def test_pagerank_checkpoint_resume(ray_session, tmp_path):
    """Interrupt-and-resume reproduces the uninterrupted ranks
    bit-for-bit; completed iterations are skipped on resume."""
    import json

    from mapshaper_ray.ops.graph import (pagerank,
                                         pagerank_checkpointed)
    n = 300
    ids = np.arange(n)
    edges = rd.from_pandas(pd.DataFrame({
        "src": np.concatenate([ids, ids]),
        "dst": np.concatenate([(ids * 7 + 1) % n,
                               (ids * 13 + 5) % n])}))
    nodes = rd.from_pandas(pd.DataFrame({"node": ids}))
    want = pagerank(edges, nodes, iters=4).to_pandas() \
        .sort_values("node").reset_index(drop=True)

    ck = str(tmp_path / "pr")
    # "crash" after 2 iterations...
    _, man2 = pagerank_checkpointed(edges, nodes, iters=2,
                                    checkpoint_dir=ck)
    assert list(man2["iteration"]) == [1, 2]
    # ...then resume to 4: iterations 1-2 must come from checkpoints
    got, man4 = pagerank_checkpointed(edges, nodes, iters=4,
                                      checkpoint_dir=ck)
    got = got.to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    with open(f"{ck}/manifest.json") as f:
        man = json.load(f)
    assert [m["iteration"] for m in man] == [1, 2, 3, 4]
    assert all(abs(m["rank_sum"] - 1.0) < 1e-9 for m in man)


def test_pagerank_tol_early_exit(ray_session, tmp_path):
    """tol= records L1 deltas in the manifest and stops once the
    delta falls under tolerance."""
    from mapshaper_ray.ops.graph import pagerank_checkpointed
    n = 200
    ids = np.arange(n)
    edges = rd.from_pandas(pd.DataFrame({
        "src": ids, "dst": (ids * 7 + 1) % n}))
    nodes = rd.from_pandas(pd.DataFrame({"node": ids}))
    _, man = pagerank_checkpointed(
        edges, nodes, iters=50, tol=1e-3,
        checkpoint_dir=str(tmp_path / "pr"))
    assert len(man) < 50                       # early exit happened
    d = man["l1_delta"].to_numpy()
    assert (d[:-1] >= d[1:] * 0.5).all()       # broadly decreasing
    assert d[-1] < 1e-3


def test_percent_rank_equidepth_skew(ray_session):
    """Equi-depth binning stays exact on a heavy-tailed distribution
    where linear bins would put ~everything in one bucket."""
    from mapshaper_ray.ops.rank import percent_rank
    rng = np.random.default_rng(31)
    vals = np.exp(rng.normal(0, 3, 400))   # lognormal, huge range
    vals[::50] = vals[0]                   # planted ties
    df = pd.DataFrame({"doc_id": np.arange(400), "v": vals})
    want = ((df["v"].rank(method="min") - 1) / (len(df) - 1)) \
        .round(6).to_numpy()
    for mode in ("equidepth", "linear"):
        got = percent_rank(rd.from_pandas(df), "v", "doc_id",
                           n_bins=16, bins=mode).to_pandas() \
            .sort_values("doc_id")
        np.testing.assert_array_equal(got["pct_rank"].to_numpy(),
                                      want)


def test_triangle_count_degree_pivot(ray_session):
    """Degree-pivot orientation counts the same triangles as id-pivot
    on random graphs and on a hub (star+clique) graph where degree
    ordering matters."""
    from mapshaper_ray.ops.graph import triangle_count
    rng = np.random.default_rng(37)
    src = rng.integers(0, 80, 500)
    dst = rng.integers(0, 80, 500)
    ds = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    assert triangle_count(ds, num_buckets=8, pivot="degree") \
        == triangle_count(ds, num_buckets=8, pivot="id")
    # hub graph: node 0 connects to all of a 6-clique + 40 leaves
    rows = [{"src": 0, "dst": i} for i in range(1, 47)]
    rows += [{"src": a, "dst": b} for a in range(1, 7)
             for b in range(a + 1, 7)]
    hub = rd.from_items(rows)
    # triangles: C(6,2) hub triangles + C(6,3) clique triangles
    want = 15 + 20
    assert triangle_count(hub, pivot="degree") == want
    assert triangle_count(hub, pivot="id") == want


def test_pagerank_checkpoint_crash_durability(ray_session, tmp_path):
    """A stale partial iteration dir is overwritten (not appended to)
    on resume; a truncated manifest is impossible by construction
    (atomic replace) — simulate the partial-dir crash."""
    import json

    from mapshaper_ray.ops.graph import pagerank_checkpointed
    n = 100
    ids = np.arange(n)
    edges = rd.from_pandas(pd.DataFrame({
        "src": ids, "dst": (ids * 7 + 1) % n}))
    nodes = rd.from_pandas(pd.DataFrame({"node": ids}))
    ck = str(tmp_path / "pr")
    _, _ = pagerank_checkpointed(edges, nodes, iters=1,
                                 checkpoint_dir=ck)
    # simulate a crash DURING iteration 2's write: partial files
    # exist but no manifest row
    import os
    os.makedirs(f"{ck}/iter_0002", exist_ok=True)
    with open(f"{ck}/iter_0002/stale.parquet", "wb") as f:
        f.write(b"partial garbage")
    got, man = pagerank_checkpointed(edges, nodes, iters=3,
                                     checkpoint_dir=ck)
    got = got.to_pandas()
    # the stale file was cleared, ranks stay a probability vector
    assert not os.path.exists(f"{ck}/iter_0002/stale.parquet")
    assert abs(got["rank"].sum() - 1.0) < 1e-9
    assert len(got) == n
    with open(f"{ck}/manifest.json") as f:
        assert [m["iteration"] for m in json.load(f)] == [1, 2, 3]
