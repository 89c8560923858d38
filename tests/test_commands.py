"""Command-string surface (run_commands) — the reference's
runCommands/applyCommands entry point re-expressed over Ray pipelines."""

import json

import numpy as np
import pytest

from mapshaper_ray.commands import parse_commands, run_commands


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


def test_parse_commands():
    cmds = parse_commands(
        "-i a.json name=foo -simplify 50% keep-shapes -o out.json")
    assert [c["name"] for c in cmds] == ["i", "simplify", "o"]
    assert cmds[0]["args"] == ["a.json"]
    assert cmds[0]["options"] == {"name": "foo"}
    assert cmds[1]["args"] == ["50%"]
    assert cmds[1]["options"] == {"keep_shapes": True}


def test_parse_quoted_expression():
    cmds = parse_commands("-filter 'v > 2 and grp == \"a\"'")
    assert cmds[0]["args"] == ['v > 2 and grp == "a"']


def test_run_pipeline_dissolve_export(ray_session, tmp_path):
    src = tmp_path / "g.json"
    src.write_text(json.dumps(_grid_fc(3)))
    out = tmp_path / "out.json"
    cat = run_commands(
        f"-i {src} -dissolve grp sum-fields=v -o {out}")
    assert out.exists()
    fc = json.loads(out.read_text())
    assert len(fc["features"]) == 2
    vs = sorted(f["properties"]["v"] for f in fc["features"])
    assert vs == [3, 6]


def test_run_filter_each_sort(ray_session, tmp_path):
    src = tmp_path / "g.json"
    src.write_text(json.dumps(_grid_fc(3)))
    cat = run_commands(
        f"-i {src} -each 'w = v * 10' -filter 'grp == \"a\"' "
        f"-sort 'feature_id' descending")
    df = cat.get().to_pandas()
    assert len(df) == 6
    assert list(df["w"].unique()) == [10]
    assert list(df["feature_id"]) == sorted(df["feature_id"],
                                            reverse=True)


def test_run_clip_and_points(ray_session, tmp_path):
    src = tmp_path / "g.json"
    src.write_text(json.dumps(_grid_fc(2, groups=("g",))))
    clip = tmp_path / "c.json"
    clip.write_text(json.dumps({
        "type": "FeatureCollection", "features": [{
            "type": "Feature", "properties": {},
            "geometry": {"type": "Polygon", "coordinates":
                         [[[0.5, 0.5], [1.5, 0.5], [1.5, 1.5],
                           [0.5, 1.5], [0.5, 0.5]]]}}]}))
    cat = run_commands(f"-i {src} -clip {clip}")
    from mapshaper_ray.ops.features import add_polygon_metrics
    df = add_polygon_metrics(cat.get()).to_pandas()
    assert len(df) == 4 and np.allclose(df["area"], 0.25)

    cat2 = run_commands(f"-i {src} -points vertices")
    pts = cat2.get().to_pandas()
    assert len(pts) == 4
    assert all(len(p) == 4 for p in pts["px"])


def test_run_innerlines(ray_session, tmp_path):
    src = tmp_path / "g.json"
    src.write_text(json.dumps(_grid_fc(2, groups=("g",))))
    cat = run_commands(f"-i {src} -innerlines")
    df = cat.get().to_pandas()
    # 2x2 grid: 4 adjacent pairs -> 4 inner-line features (reference
    # extractLines emits one feature per shape pair; no data table)
    assert len(df) == 4
    assert "kind" not in df.columns and "TYPE" not in df.columns


def test_run_proj_and_rename(ray_session, tmp_path):
    src = tmp_path / "g.json"
    src.write_text(json.dumps(_grid_fc(2, groups=("g",))))
    cat = run_commands(
        f"-i {src} -proj webmercator -rename-fields group=grp")
    df = cat.get().to_pandas()
    assert "group" in df.columns and "grp" not in df.columns
    # projected coords are metres now
    assert max(v for ring in df["rings_x"].iloc[0] for v in ring) > 1e4


def test_unknown_command_raises(ray_session):
    with pytest.raises(ValueError, match="unsupported command"):
        run_commands("-frobnicate x")


def test_reference_simplify_0pct_fixture(ray_session, tmp_path):
    """Reference e2e fixture (test/simplify-test.js:55-67): '-simplify
    planar 0%' removes ALL removable vertices — the polyline collapses
    to its endpoints exactly."""
    src = tmp_path / "line.json"
    src.write_text(json.dumps({
        "type": "FeatureCollection", "features": [{
            "type": "Feature", "properties": {},
            "geometry": {"type": "LineString", "coordinates":
                         [[0, 0], [0, 1], [0.1, 1.1], [0, 1.2],
                          [0, 2]]}}]}))
    out = tmp_path / "out.json"
    run_commands(f"-i {src} -simplify 0% -o {out}")
    fc = json.loads(out.read_text())
    geom = fc["geometries"][0]  # field-less -> GeometryCollection
    assert geom["coordinates"] == [[0, 0], [0, 2]]


def test_run_dissolve2_overlapping(ray_session, tmp_path):
    """-dissolve2 repairs overlaps: two overlapping squares in one
    group dissolve to the union area (plain -dissolve would keep the
    doubly-covered region twice)."""
    src = tmp_path / "o.json"
    src.write_text(json.dumps({
        "type": "FeatureCollection", "features": [
            {"type": "Feature", "properties": {"g": "a"},
             "geometry": {"type": "Polygon", "coordinates":
                          [[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]]}},
            {"type": "Feature", "properties": {"g": "a"},
             "geometry": {"type": "Polygon", "coordinates":
                          [[[1, 0], [3, 0], [3, 2], [1, 2], [1, 0]]]}},
        ]}))
    cat = run_commands(f"-i {src} -dissolve2 g")
    from mapshaper_ray.ops.features import add_polygon_metrics
    df = add_polygon_metrics(cat.get()).to_pandas()
    assert len(df) == 1
    assert abs(df.iloc[0]["area"] - 6.0) < 1e-9  # union, not 8.0


def test_run_mosaic_and_polygons(ray_session, tmp_path):
    src = tmp_path / "o.json"
    src.write_text(json.dumps({
        "type": "FeatureCollection", "features": [
            {"type": "Feature", "properties": {},
             "geometry": {"type": "Polygon", "coordinates":
                          [[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]]}},
            {"type": "Feature", "properties": {},
             "geometry": {"type": "Polygon", "coordinates":
                          [[[1, 0], [3, 0], [3, 2], [1, 2], [1, 0]]]}},
        ]}))
    cat = run_commands(f"-i {src} -mosaic")
    from mapshaper_ray.ops.features import add_polygon_metrics
    df = add_polygon_metrics(cat.get()).to_pandas()
    # arrangement of two overlapping squares: 3 tiles of area 2 each
    assert len(df) == 3
    assert np.allclose(sorted(df["area"]), [2.0, 2.0, 2.0])


def test_reference_simplify_resolution_fixture(ray_session, tmp_path):
    """Reference fixture (test/simplify-test.js:40-53): a coarse
    resolution (100x100 cells over the content bbox) retains every
    vertex — output identical to input."""
    coords = [[0, 0], [0, 1], [1, 1], [1, 2]]
    src = tmp_path / "line.json"
    src.write_text(json.dumps({
        "type": "FeatureCollection", "features": [{
            "type": "Feature", "properties": {},
            "geometry": {"type": "LineString", "coordinates": coords}}]}))
    out = tmp_path / "out.json"
    run_commands(f"-i {src} -simplify resolution=100x100 -o {out}")
    fc = json.loads(out.read_text())
    assert fc["geometries"][0]["coordinates"] == coords


def test_i_merge_files(ray_session, tmp_path):
    for k in range(2):
        (tmp_path / f"p{k}.json").write_text(json.dumps({
            "type": "FeatureCollection", "features": [{
                "type": "Feature", "properties": {"src": k},
                "geometry": {"type": "Polygon", "coordinates":
                             [[[k, 0], [k + 1, 0], [k + 1, 1], [k, 1],
                               [k, 0]]]}}]}))
    cat = run_commands(
        f"-i {tmp_path}/p0.json {tmp_path}/p1.json merge-files")
    assert list(cat.layers) == ["merged"]
    assert cat.get().count() == 2


def test_filter_geometry_accessor(ray_session, tmp_path):
    """$.area-style accessors inside expressions: referencing `area`
    in -filter computes the metric column automatically."""
    src = tmp_path / "g.json"
    feats = []
    for i, w in enumerate([1.0, 3.0]):
        feats.append({
            "type": "Feature", "properties": {"i": i},
            "geometry": {"type": "Polygon", "coordinates":
                         [[[0, 10 * i], [w, 10 * i], [w, 10 * i + w],
                           [0, 10 * i + w], [0, 10 * i]]]}})
    src.write_text(json.dumps({"type": "FeatureCollection",
                               "features": feats}))
    cat = run_commands(f"-i {src} -filter 'area > 2' "
                       f"-each 'density = 1.0 / area'")
    df = cat.get().to_pandas()
    assert list(df["i"]) == [1]
    assert abs(df.iloc[0]["density"] - 1 / 9.0) < 1e-12


def test_each_where_guard(ray_session, tmp_path):
    src = tmp_path / "g.json"
    src.write_text(json.dumps(_grid_fc(2, groups=("a", "b"))))
    cat = run_commands(
        f"-i {src} -each 'flag = v * 100' where='grp == \"a\"'")
    df = cat.get().to_pandas().sort_values("feature_id")
    a = df[df["grp"] == "a"]["flag"]
    b = df[df["grp"] == "b"]["flag"]
    assert all(v == 100 for v in a)
    assert all(v is None or (isinstance(v, float) and np.isnan(v))
               for v in b)


def test_dissolve_calc_option(ray_session, tmp_path):
    src = tmp_path / "g.json"
    src.write_text(json.dumps(_grid_fc(3)))
    cat = run_commands(
        f"-i {src} -dissolve grp calc='n = count(), vmax = max(v)'")
    df = cat.get().to_pandas().sort_values("grp").reset_index(drop=True)
    assert list(df["n"]) == [6, 3]
    assert list(df["vmax"]) == [1, 1]


def test_join_calc_and_where(ray_session, tmp_path):
    src = tmp_path / "g.json"
    src.write_text(json.dumps(_grid_fc(2, groups=("g",))))
    tbl = tmp_path / "tbl.json"
    tbl.write_text(json.dumps([
        {"g2": "g", "val": 10}, {"g2": "g", "val": 30},
        {"g2": "g", "val": 999}, {"g2": "x", "val": 5}]))
    cat = run_commands(
        f"-i {src} -join {tbl} keys=grp,g2 where='val < 100' "
        f"calc='vsum = sum(val), vn = count()'")
    df = cat.get().to_pandas()
    assert all(df["vsum"] == 40)
    assert all(df["vn"] == 2)


def test_review_fixes(ray_session, tmp_path):
    """Round-2 review findings: option-before-expression parsing,
    -o format= writes the given path, scalar where=-assignments,
    point-target clip, bare Feature-array input, multi-token -proj."""
    from mapshaper_ray.commands import parse_commands

    # where= BEFORE the expression parses as an option
    cmds = parse_commands("-each where='v > 1' 'flag = v*2'")
    assert cmds[0]["options"] == {"where": "v > 1"}
    assert cmds[0]["args"] == ["flag = v*2"]
    # declared flag before the expression
    cmds = parse_commands("-filter remove-empty 'v > 0'")
    assert cmds[0]["options"] == {"remove_empty": True}

    # bare array of Features imports as GeoJSON, not a record table
    src = tmp_path / "arr.json"
    src.write_text(json.dumps([
        {"type": "Feature", "properties": {"v": 3},
         "geometry": {"type": "Polygon", "coordinates":
                      [[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]]}}]))
    cat = run_commands(f"-i {src}")
    df = cat.get().to_pandas()
    assert "rings_x" in df.columns and df.iloc[0]["v"] == 3

    # scalar assignment under where=
    cat = run_commands(f"-i {src} -each 'flag = 7' where='v > 1'")
    assert cat.get().to_pandas().iloc[0]["flag"] == 7

    # -o format= writes the exact requested filename
    out = tmp_path / "plain_name"
    run_commands(f"-i {src} -o {out} format=geojson")
    assert out.exists()
    assert "FeatureCollection" in out.read_text()

    # multi-token proj4 string keeps its parameters
    cat = run_commands(
        f"-i {src} -proj +proj=lcc +lat_1=20 +lat_2=60 +lon_0=-96")
    from mapshaper_ray.stages.proj import lcc_fwd
    got = cat.get().to_pandas().iloc[0]["rings_x"][0][0]
    ex, _ = lcc_fwd(np.array([0.0]), np.array([0.0]),
                    lat1=20.0, lat2=60.0, lon0=-96.0)
    assert got == ex[0]


def test_clip_point_target(ray_session, tmp_path):
    clip = tmp_path / "c.json"
    clip.write_text(json.dumps({
        "type": "FeatureCollection", "features": [{
            "type": "Feature", "properties": {},
            "geometry": {"type": "Polygon", "coordinates":
                         [[[0.5, 0.5], [1.5, 0.5], [1.5, 1.5],
                           [0.5, 1.5], [0.5, 0.5]]]}}]}))
    import ray.data as rd
    from mapshaper_ray.commands import Catalog, run_commands as rc
    cat = Catalog()
    cat.add(rd.from_items([
        {"feature_id": 0, "id": 1, "px": [1.0], "py": [1.0]},
        {"feature_id": 1, "id": 2, "px": [3.0], "py": [3.0]}]), "pts")
    rc(f"-clip {clip}", catalog=cat)
    df = cat.get().to_pandas()
    assert list(df["id"]) == [1]
