"""Second command-surface batch: shape, filter-geom, colorizer,
svg-style, cluster, data-fill, subdivide, inspect and the keyless
geometry -join dispatch (reference mapshaper-join.js:24-31)."""

import json

import numpy as np
import pandas as pd
import pytest

from mapshaper_ray.commands import Catalog, run_commands


def _grid_fc(grid=3, null_every=None):
    feats = []
    for i in range(grid * grid):
        r, c = divmod(i, grid)
        x0, y0 = float(c), float(r)
        val = None if (null_every and i % null_every == 1) else \
            ("L" if c == 0 else "R")
        feats.append({
            "type": "Feature",
            "properties": {"name": f"f{i}", "val": val, "v": i},
            "geometry": {"type": "Polygon", "coordinates":
                         [[[x0, y0], [x0 + 1, y0], [x0 + 1, y0 + 1],
                           [x0, y0 + 1], [x0, y0]]]}})
    return {"type": "FeatureCollection", "features": feats}


def _points_fc(pts):
    return {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": dict(p.get("props", {})),
         "geometry": {"type": "Point",
                      "coordinates": [p["x"], p["y"]]}}
        for p in pts]}


def test_shape_polygon_and_polyline(ray_session):
    cat = run_commands("-shape coordinates=0,0,2,0,2,2,0,2,0,0 "
                       "name=box")
    df = cat.layers["box"].to_pandas()
    assert list(df["rings_x"][0][0]) == [0, 2, 2, 0, 0]
    cat = run_commands("-shape coordinates=0,0 offsets=1,0,0,1 "
                       "closed name=tri")
    df = cat.layers["tri"].to_pandas()
    assert len(df["rings_x"][0][0]) == 4      # closed triangle
    cat = run_commands("-shape coordinates=0,0,5,5 name=seg")
    assert "part_x" in cat.layers["seg"].schema().names


def test_filter_geom_bbox(ray_session, tmp_path):
    p = tmp_path / "g.json"
    p.write_text(json.dumps(_grid_fc(3)))
    cat = run_commands(f"-i {p} -filter-geom bbox=0,0,1.5,1.5")
    # keeps cells whose bbox intersects: columns 0-1 x rows 0-1
    assert cat.get().count() == 4


def test_colorizer_into_each(ray_session, tmp_path):
    p = tmp_path / "g.json"
    p.write_text(json.dumps(_grid_fc(3)))
    cat = run_commands(
        f"-i {p} -colorizer name=ramp colors=lo,mid,hi breaks=3,6 "
        "-each 'fill = ramp(v)'")
    df = cat.get().to_pandas().sort_values("v")
    assert df["fill"].tolist() == ["lo"] * 3 + ["mid"] * 3 + ["hi"] * 3


def test_svg_style_with_where(ray_session, tmp_path):
    p = tmp_path / "g.json"
    p.write_text(json.dumps(_grid_fc(2)))
    cat = run_commands(f"-i {p} -svg-style fill=red")
    assert (cat.get().to_pandas()["fill"] == "red").all()
    cat = run_commands(f"-i {p} -svg-style fill=blue where='v > 1'")
    df = cat.get().to_pandas().sort_values("v")
    assert df["fill"].tolist() == [None, None, "blue", "blue"]


def test_cluster_command(ray_session, tmp_path):
    p = tmp_path / "g.json"
    p.write_text(json.dumps(_grid_fc(4)))
    cat = run_commands(f"-i {p} -cluster pct=50% id-field=cid")
    df = cat.get().to_pandas()
    assert "cid" in df.columns
    assert df["cid"].nunique() == 8           # 16 shapes, 8 merges


def test_data_fill_command(ray_session, tmp_path):
    p = tmp_path / "g.json"
    p.write_text(json.dumps(_grid_fc(3, null_every=3)))
    cat = run_commands(f"-i {p} -data-fill field=val")
    df = cat.get().to_pandas()
    assert df["val"].notna().all()


def test_subdivide_command(ray_session, tmp_path):
    p = tmp_path / "g.json"
    p.write_text(json.dumps(_grid_fc(4)))
    cat = run_commands(f"-i {p} name=g -subdivide 'count() > 4'")
    parts = [k for k in cat.layers if k.startswith("g_")]
    assert len(parts) >= 4
    assert sum(cat.layers[k].count() for k in parts) == 16
    assert all(cat.layers[k].count() <= 4 for k in parts)


def test_inspect_command(ray_session, tmp_path):
    p = tmp_path / "g.json"
    p.write_text(json.dumps(_grid_fc(2)))
    cat = run_commands(f"-i {p} -inspect 'v == 2'")
    assert cat.last_inspect["name"] == "f2"
    cat = run_commands(f"-i {p} -inspect 'v >= 0'")
    assert "matched 4" in cat.last_inspect


def test_geom_join_polygons_to_points(ray_session, tmp_path):
    poly = tmp_path / "poly.json"
    poly.write_text(json.dumps(_grid_fc(2)))
    pts = tmp_path / "pts.json"
    pts.write_text(json.dumps(_points_fc([
        {"x": 0.5, "y": 0.5, "props": {"pid": 1}},
        {"x": 1.5, "y": 1.5, "props": {"pid": 2}},
        {"x": 9.0, "y": 9.0, "props": {"pid": 3}}])))
    cat = run_commands(f"-i {pts} -join {poly} fields=name")
    df = cat.get().to_pandas().sort_values("pid")
    assert df["name"].tolist()[:2] == ["f0", "f3"]
    assert pd.isna(df["name"].tolist()[2])    # outside: left join null


def test_geom_join_points_to_polygons_calc(ray_session, tmp_path):
    poly = tmp_path / "poly.json"
    poly.write_text(json.dumps(_grid_fc(2)))
    pts = tmp_path / "pts.json"
    pts.write_text(json.dumps(_points_fc(
        [{"x": 0.25 + 0.1 * k, "y": 0.5, "props": {"w": k}}
         for k in range(4)] +
        [{"x": 1.5, "y": 1.5, "props": {"w": 10}}])))
    cat = run_commands(f"-i {poly} -join {pts} "
                       "calc='n = count(), wsum = sum(w)'")
    df = cat.get().to_pandas().sort_values("v")
    assert df["n"].tolist()[0] == 4 and df["wsum"].tolist()[0] == 6
    assert df["n"].tolist()[3] == 1 and df["wsum"].tolist()[3] == 10
    assert pd.isna(df["n"].tolist()[1])       # no points: left join


def test_geom_join_point_to_point(ray_session, tmp_path):
    a = tmp_path / "a.json"
    a.write_text(json.dumps(_points_fc([
        {"x": 0.0, "y": 0.0, "props": {"aid": 1}},
        {"x": 5.0, "y": 5.0, "props": {"aid": 2}}])))
    b = tmp_path / "b.json"
    b.write_text(json.dumps(_points_fc([
        {"x": 0.2, "y": 0.0, "props": {"tag": "near"}},
        {"x": 50.0, "y": 50.0, "props": {"tag": "far"}}])))
    cat = run_commands(f"-i {a} -join {b} max-distance=1.0 fields=tag")
    df = cat.get().to_pandas().sort_values("aid")
    assert df["tag"].tolist()[0] == "near"
    assert pd.isna(df["tag"].tolist()[1])


def test_shape_closed_false_stays_polyline(ray_session):
    # closed=false must parse as a BOOLEAN false (reference option
    # parser), not a truthy non-empty string
    cat = run_commands("-shape coordinates=0,0,2,0,2,2 closed=false "
                       "name=open")
    assert "part_x" in cat.layers["open"].schema().names
    cat = run_commands("-shape coordinates=0,0,2,0,2,2 closed=true "
                       "name=ring")
    assert "rings_x" in cat.layers["ring"].schema().names


def test_inspect_expression_with_equals(ray_session, tmp_path):
    # 'v==2' is the DEFAULT expression option, not an option token
    p = tmp_path / "g.json"
    p.write_text(json.dumps(_grid_fc()))
    cat = run_commands(f"-i {p} -inspect 'v==2'")
    assert cat.last_inspect["v"] == 2


def test_data_fill_postprocess_flag_parses(ray_session):
    from mapshaper_ray.commands import parse_commands
    cmds = parse_commands("-data-fill field=val postprocess")
    assert cmds[0]["options"].get("postprocess") is True
    assert cmds[0]["args"] == []


def test_geom_join_preserves_existing_dist_column(ray_session, tmp_path):
    a = tmp_path / "a.json"
    a.write_text(json.dumps(_points_fc([
        {"x": 0.0, "y": 0.0, "props": {"aid": 1, "dist": 99.5}}])))
    b = tmp_path / "b.json"
    b.write_text(json.dumps(_points_fc([
        {"x": 0.2, "y": 0.0, "props": {"tag": "near"}}])))
    cat = run_commands(f"-i {a} -join {b} max-distance=1.0 fields=tag")
    df = cat.get().to_pandas()
    assert df["dist"].tolist() == [99.5]      # user column untouched
    assert df["tag"].tolist() == ["near"]


def test_join_miss_writes_null_not_nan(ray_session, tmp_path):
    # unmatched polygon rows carry NaN after the pandas join stage;
    # the GeoJSON sink must emit JSON null, never a bare NaN token
    g = tmp_path / "g.json"
    g.write_text(json.dumps(_grid_fc(grid=2)))
    pts = tmp_path / "p.json"
    pts.write_text(json.dumps(_points_fc([
        {"x": 0.5, "y": 0.5, "props": {"w": 2}}])))
    out = tmp_path / "out.json"
    cat = run_commands(f"-i {g} -join {pts} calc='n = count()' "
                       f"-o {out}")
    parsed = json.loads(out.read_text())      # raises on bare NaN
    ns = [f["properties"]["n"] for f in parsed["features"]]
    assert sorted([n for n in ns if n is not None]) == [1]
    assert ns.count(None) == 3


def test_calc_aggregate_expressions(ray_session, tmp_path):
    """-calc 'a = sum(v), n = count(), md = median(v)' (reference
    mapshaper-calc.js aggregate forms) and the bare-column stats
    block."""
    src = tmp_path / "t.csv"
    src.write_text("k,v\na,1\nb,2\na,3\n")
    from mapshaper_ray.commands import run_commands
    cat = run_commands(f"-i {src} -calc 's = sum(v), n = count(), "
                       f"md = median(v)'")
    rec = cat.get().to_pandas().to_dict("records")[0]
    assert rec == {"s": 6, "n": 3, "md": 2.0}


def test_each_delete_field(ray_session, tmp_path):
    """-each 'delete foo' drops the column (reference each-calc-test
    'delete a field'); mixes with assignments."""
    from mapshaper_ray.commands import run_commands
    src = tmp_path / "e.csv"
    src.write_text("a,b\n1,2\n3,4\n")
    run_commands(f"-i {src} -each 'c = a + 1; del b' "
                 f"-o {tmp_path}/o.csv")
    assert (tmp_path / "o.csv").read_text() == "a,c\n1,2\n3,4"


def test_no_replace_plus_shorthand(ray_session):
    """-innerlines + adds a NEW layer (reference '+' = no-replace);
    name= names it."""
    from mapshaper_ray.commands import run_commands
    shp = "/root/reference/test/test_data/two_states.shp"
    cat = run_commands(f"-i {shp} -innerlines +")
    assert len(cat.layers) == 2 and "two_states" in cat.layers
    cat = run_commands(f"-i {shp} -innerlines + name=innerlines")
    assert set(cat.layers) == {"two_states", "innerlines"}
    assert cat.target == "innerlines"


def test_apply_commands_in_memory(ray_session):
    """Reference api.applyCommands parity: in-memory inputs/outputs,
    no caller-filesystem writes (src/cli/mapshaper-commands.js:25)."""
    import json

    from mapshaper_ray.commands import apply_commands
    gj = json.dumps({"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"g": "a", "v": 1},
         "geometry": {"type": "Polygon",
                      "coordinates": [[[0, 0], [0, 1], [1, 1],
                                       [1, 0], [0, 0]]]}},
        {"type": "Feature", "properties": {"g": "a", "v": 2},
         "geometry": {"type": "Polygon",
                      "coordinates": [[[1, 0], [1, 1], [2, 1],
                                       [2, 0], [1, 0]]]}}]})
    out = apply_commands("-i a.json -dissolve g sum-fields=v "
                         "-o out.json", {"a.json": gj})
    assert set(out) == {"out.json"}
    fc = json.loads(out["out.json"])
    assert len(fc["features"]) == 1
    assert fc["features"][0]["properties"] == {"g": "a", "v": 3}
    # csv in, csv out; multiple outputs collected
    out2 = apply_commands(
        "-i t.csv -dissolve g sum-fields=v -o d.csv "
        "-o copy.csv", {"t.csv": "g,v\na,1\na,2\nb,5\n"})
    assert set(out2) == {"d.csv", "copy.csv"}
    assert out2["d.csv"].decode().splitlines()[0] == "g,v"
    assert sorted(out2["d.csv"].decode().splitlines()[1:]) == \
        ["a,3", "b,5"]


def test_calc_expression_arithmetic_and_capture(ray_session):
    """-calc v2: arithmetic around aggregates, expression arguments,
    and the reference's capture-class functions (mode first-encounter
    tie rule, collect, first, last)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import calc_exprs
    df = pd.DataFrame({
        "v": [3.0, 1.0, 4.0, 1.0, 5.0],
        "w": [2.0, 2.0, 2.0, 2.0, 2.0],
        "tag": ["b", "a", "b", "a", "c"],
    })
    ds = rd.from_pandas(df).repartition(3)
    out = calc_exprs(
        ds,
        "pct = sum(v) / count() * 100, "
        "sw = sum(v * w), "
        "m = mode(tag), "
        "c = collect(v), "
        "f = first(tag), "
        "l = last(tag), "
        "rng = max(v) - min(v)")
    row = out.iloc[0]
    assert row["pct"] == pytest.approx(14.0 / 5 * 100)
    assert row["sw"] == pytest.approx(28.0)
    assert row["m"] == "b"          # b and a both count 2; b seen first
    assert list(row["c"]) == [3.0, 1.0, 4.0, 1.0, 5.0]
    assert row["f"] == "b" and row["l"] == "c"
    assert row["rng"] == pytest.approx(4.0)


def test_calc_js_syntax_and_cli(ray_session, tmp_path):
    """-calc via the CLI with a JS-syntax expression."""
    src = tmp_path / "t.csv"
    src.write_text("v\n1\n2\n30\n")
    cat = run_commands(
        f"-i {src} -calc 'big = sum(v) > 10 ? \"yes\" : \"no\", "
        f"n = count()'")
    out = cat.get("calc").to_pandas()
    assert out.iloc[0]["big"] == "yes"
    assert out.iloc[0]["n"] == 3


def test_subdivide_general_expression(ray_session, tmp_path):
    """-subdivide with a general calc expression (sum(v) > T):
    reference divideLayer semantics — count-halving split along the
    long bbox side, recursion while the expression holds."""
    p = tmp_path / "g.json"
    p.write_text(json.dumps(_grid_fc(4)))   # 16 cells, v = 0..15
    cat = run_commands(f"-i {p} name=g -subdivide 'sum(v) > 30'")
    parts = [k for k in cat.layers if k.startswith("g_")]
    assert sum(cat.layers[k].count() for k in parts) == 16
    for k in parts:
        s = cat.layers[k].to_pandas()["v"].sum()
        n = cat.layers[k].count()
        assert s <= 30 or n == 1, (k, s, n)


def test_join_calc_capture_functions(ray_session):
    """-join calc= with the capture-class functions (mode tie rule,
    collect, median)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import broadcast_join_calc
    big = rd.from_pandas(pd.DataFrame({"k": [1, 2]}))
    src = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 2, 2],
        "v": [5.0, 1.0, 3.0, 2.0, 2.0, 9.0, 9.0],
        "t": ["x", "y", "x", "b", "a", "b", "a"]})
    out = broadcast_join_calc(
        big, src, on="k",
        calc={"md": ("v", "median"), "mo": ("t", "mode"),
              "all_v": ("v", "collect")}).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert out["md"].tolist() == [3.0, pytest.approx(5.5)]
    assert out["mo"].tolist() == ["x", "b"]   # first-encounter ties
    assert out["all_v"].tolist() == [[5.0, 1.0, 3.0],
                                     [2.0, 2.0, 9.0, 9.0]]


def test_dissolve_calc_exact_functions(ray_session, tmp_path):
    """-dissolve calc= with median/mode/collect (exact bucket-shuffle
    path) alongside distributive fns."""
    p = tmp_path / "g.json"
    p.write_text(json.dumps(_grid_fc(4)))   # 16 cells, v=0..15; val L/R
    cat = run_commands(
        f"-i {p} name=g -dissolve val "
        "calc='s = sum(v), md = median(v), mo = mode(v), "
        "vs = collect(v)'")
    out = cat.get().to_pandas().sort_values("val").reset_index(drop=True)
    df = pd.DataFrame(_grid_fc(4)["features"]) if False else None
    # val 'L' = first column cells (v = 0,4,8,12); 'R' = the rest
    row_l = out[out["val"] == "L"].iloc[0]
    assert row_l["s"] == 24 and row_l["md"] == 6.0
    assert sorted(row_l["vs"]) == [0, 4, 8, 12]
    row_r = out[out["val"] == "R"].iloc[0]
    assert row_r["s"] == sum(range(16)) - 24
    assert row_r["mo"] == row_r["vs"][0]  # all unique: first wins
