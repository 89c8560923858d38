"""E2e parity against the reference's OWN test fixtures
(test/dissolve-test.js, test/simplify-test.js) run through the
command-string surface.  Chains compare up to direction (the merge
orientation is the one reference-vs-engine freedom documented in
topo/dissolve.py)."""

import json

import numpy as np
import pytest

from mapshaper_ray.commands import run_commands


def _chain_eq(got, want):
    got = [list(map(float, p)) for p in got]
    return got == want or got[::-1] == want


def test_dissolve_polyline_multiple_segments(ray_session, tmp_path):
    """dissolve-test.js 'polyline test 1': bar [1,1]-[0,0] + foo's two
    chains merge into ONE line covering (0,0)..(4,4)."""
    src = tmp_path / "a.json"
    src.write_text(json.dumps({
        "type": "FeatureCollection", "features": [
            {"type": "Feature", "properties": {"name": "bar"},
             "geometry": {"type": "LineString",
                          "coordinates": [[1, 1], [0, 0]]}},
            {"type": "Feature", "properties": {"name": "foo"},
             "geometry": {"type": "MultiLineString",
                          "coordinates": [[[1, 1], [2, 2], [3, 3]],
                                          [[4, 4], [3, 3]]]}}]}))
    cat = run_commands(f"-i {src} -dissolve")
    df = cat.get().to_pandas()
    assert len(df) == 1
    parts = list(zip(df.iloc[0]["part_x"], df.iloc[0]["part_y"]))
    assert len(parts) == 1
    coords = [[x, y] for x, y in zip(*parts[0])]
    assert _chain_eq(coords,
                     [[0, 0], [1, 1], [2, 2], [3, 3], [4, 4]])


def test_dissolve_polyline_simple_ring(ray_session, tmp_path):
    """dissolve-test.js 'polyline test 2': a closed line ring passes
    through unchanged."""
    src = tmp_path / "a.json"
    src.write_text(json.dumps({
        "type": "FeatureCollection", "features": [
            {"type": "Feature", "properties": {"name": "bar"},
             "geometry": {"type": "LineString",
                          "coordinates": [[1, 1], [1, 0], [0, 1],
                                          [1, 1]]}}]}))
    cat = run_commands(f"-i {src} -dissolve")
    df = cat.get().to_pandas()
    assert len(df) == 1
    coords = [[x, y] for x, y in zip(df.iloc[0]["part_x"][0],
                                     df.iloc[0]["part_y"][0])]
    assert _chain_eq(coords, [[1, 1], [1, 0], [0, 1], [1, 1]])


def test_dissolve_polyline_split_ring(ray_session, tmp_path):
    """dissolve-test.js 'polyline test 3': two open lines sharing both
    endpoints merge into one closed ring."""
    src = tmp_path / "a.json"
    src.write_text(json.dumps({
        "type": "FeatureCollection", "features": [
            {"type": "Feature", "properties": {"name": "foo"},
             "geometry": {"type": "LineString",
                          "coordinates": [[1, 1], [1, 0], [0, 0]]}},
            {"type": "Feature", "properties": {"name": "bar"},
             "geometry": {"type": "LineString",
                          "coordinates": [[0, 0], [0, 1], [1, 1]]}}]}))
    cat = run_commands(f"-i {src} -dissolve")
    df = cat.get().to_pandas()
    assert len(df) == 1
    parts = df.iloc[0]["part_x"]
    assert len(parts) == 1
    coords = [[x, y] for x, y in zip(df.iloc[0]["part_x"][0],
                                     df.iloc[0]["part_y"][0])]
    assert coords[0] == coords[-1]  # closed
    assert len(coords) == 5
    assert _chain_eq(
        coords, [[1, 1], [1, 0], [0, 0], [0, 1], [1, 1]]) or \
        sorted(map(tuple, coords[:-1])) == sorted(
            [(0, 0), (0, 1), (1, 0), (1, 1)])


def test_dissolve_six_counties_reference_shapefile(ray_session):
    """dissolve-test.js 'polygon test 1' on the reference's OWN
    shapefile: six counties dissolve to one feature with the exact
    copy-field / sum-field values the reference asserts."""
    import os
    shp = "/root/reference/test/test_data/six_counties.shp"
    if not os.path.exists(shp):
        pytest.skip("reference fixture not present")
    cat = run_commands(
        f"-i {shp} -dissolve "
        f"copy-fields=NAME,STATE_FIPS sum-fields=POP2000,MULT_RACE")
    df = cat.get().to_pandas()
    assert len(df) == 1
    r = df.iloc[0]
    assert r["NAME"] == "District of Columbia"
    assert r["STATE_FIPS"] == "11"
    assert int(r["POP2000"]) == 1916238
    assert int(r["MULT_RACE"]) == 76770


def test_clip_bbox_point_and_polyline_fixtures(ray_session, tmp_path):
    """clip-erase-test.js bbox fixtures: point layer keeps only the
    strictly-contained point (+its record); the polyline clips to the
    exact [1,1]-[2,1] segment."""
    import ray.data as rd
    from mapshaper_ray.ops.clip import clip_bbox
    pts = rd.from_items([
        {"feature_id": 0, "id": 1, "px": [0.0], "py": [0.0]},
        {"feature_id": 1, "id": 2, "px": [], "py": []},
        {"feature_id": 2, "id": 3, "px": [0.0], "py": [2.0]},
        {"feature_id": 3, "id": 4, "px": [2.0], "py": [2.0]},
        {"feature_id": 4, "id": 5, "px": [1.0], "py": [1.0]},
        {"feature_id": 5, "id": 6, "px": [2.0], "py": [0.0]}])
    out = clip_bbox(pts, (0.5, 0.5, 1.5, 1.5)).to_pandas()
    assert list(out["id"]) == [5]
    assert list(out.iloc[0]["px"]) == [1.0]

    lines = rd.from_items([{"feature_id": 0,
                            "part_x": [[0.0, 5.0]],
                            "part_y": [[1.0, 1.0]]}])
    out = clip_bbox(lines, (1.0, 0.0, 2.0, 2.0)).to_pandas()
    assert len(out) == 1
    coords = [[x, y] for x, y in zip(out.iloc[0]["part_x"][0],
                                     out.iloc[0]["part_y"][0])]
    assert coords == [[1.0, 1.0], [2.0, 1.0]]


def test_innerlines_two_states_reference_shapefile(ray_session):
    """-innerlines over the reference's two_states.shp: exactly one
    shared border between the two states (innerlines-test.js uses the
    same fixture family)."""
    import os
    shp = "/root/reference/test/test_data/two_states.shp"
    if not os.path.exists(shp):
        pytest.skip("reference fixture not present")
    cat = run_commands(f"-i {shp} -innerlines")
    df = cat.get().to_pandas()
    # the shared border survives as inner arc(s) only — and dissolving
    # the two states must melt exactly those arcs away (area additive)
    assert len(df) >= 1   # -innerlines features carry no TYPE column
    assert "TYPE" not in df.columns
    from mapshaper_ray.commands import run_commands as rc
    from mapshaper_ray.ops.features import add_polygon_metrics
    cat2 = rc(f"-i {shp}")
    src_df = add_polygon_metrics(cat2.get()).to_pandas()
    cat3 = rc(f"-i {shp} -dissolve")
    dis_df = add_polygon_metrics(cat3.get()).to_pandas()
    assert len(dis_df) == 1
    assert abs(dis_df["area"].sum() - src_df["area"].sum()) < 1e-6


def test_ne_simplify_100pct_identity(ray_session):
    """Reference invariant ('simplify() can be re-applied',
    simplify-test.js:70-84): at 100% every vertex is retained — output
    geometry identical to the input up to ring rotation (our topology
    build canonicalizes ring start points; the reference keeps arcs in
    original cut order) on the reference's own Natural Earth
    states/provinces shapefile."""
    import os
    shp = ("/root/reference/test/test_data/ne/"
           "ne_110m_admin_1_states_provinces_shp.shp")
    if not os.path.exists(shp):
        pytest.skip("reference fixture not present")
    from mapshaper_ray import api

    def rot_eq(a, b):
        ax, ay = a
        bx, by = b
        if len(ax) != len(bx):
            return False
        ar = np.stack([ax[:-1], ay[:-1]], axis=1)
        br = np.stack([bx[:-1], by[:-1]], axis=1)
        for rev in (False, True):
            c = br[::-1] if rev else br
            for k in np.nonzero((c[:, 0] == ar[0, 0]) &
                                (c[:, 1] == ar[0, 1]))[0]:
                if np.array_equal(np.roll(c, -int(k), axis=0), ar):
                    return True
        return False

    ds = api.i(shp)
    df = ds.to_pandas().sort_values("feature_id").reset_index(drop=True)
    out = api.simplify_layer(ds, pct=1.0, keep_shapes=False) \
        .to_pandas().sort_values("feature_id").reset_index(drop=True)
    assert len(df) == len(out)
    for i in range(len(df)):
        assert len(df.iloc[i]["rings_x"]) == len(out.iloc[i]["rings_x"])
        for ax, ay, bx, by in zip(df.iloc[i]["rings_x"],
                                  df.iloc[i]["rings_y"],
                                  out.iloc[i]["rings_x"],
                                  out.iloc[i]["rings_y"]):
            assert rot_eq((np.asarray(ax), np.asarray(ay)),
                          (np.asarray(bx), np.asarray(by)))


def test_cross_format_reader_consistency(ray_session):
    """The reference ships two_states/three_points in BOTH Shapefile
    and GeoJSON form: our two independent readers must produce the
    same geometry (exact coordinates) and attribute values."""
    import os
    base = "/root/reference/test/test_data"
    if not os.path.exists(f"{base}/two_states.shp"):
        pytest.skip("reference fixtures not present")
    from mapshaper_ray import api

    shp = api.i(f"{base}/two_states.shp").to_pandas() \
        .sort_values("feature_id").reset_index(drop=True)
    gj = api.i(f"{base}/two_states.json").to_pandas() \
        .sort_values("feature_id").reset_index(drop=True)
    assert len(shp) == len(gj) == 2
    for i in range(2):
        a = [np.asarray(r) for r in shp.iloc[i]["rings_x"]]
        b = [np.asarray(r) for r in gj.iloc[i]["rings_x"]]
        assert len(a) == len(b)
        for ra, rb in zip(a, b):
            assert np.array_equal(ra, rb)
    # DBF vs GeoJSON properties
    assert list(shp["STATE_NAME"]) == list(gj["STATE_NAME"])

    sp = api.i(f"{base}/three_points.shp").to_pandas() \
        .sort_values("feature_id").reset_index(drop=True)
    gp = api.i(f"{base}/three_points.geojson").to_pandas() \
        .sort_values("feature_id").reset_index(drop=True)
    assert len(sp) == len(gp) == 3
    for i in range(3):
        assert list(sp.iloc[i]["px"]) == list(gp.iloc[i]["px"])
        assert list(sp.iloc[i]["py"]) == list(gp.iloc[i]["py"])
