"""Reference regression-issue parity, run through apply_commands —
each case reproduces a reference test's applyCommands invocation and
asserts its exact expected output (test/issue-*-test.js)."""

import json

import pytest

from mapshaper_ray.commands import apply_commands


def test_issue_171_dollar_amp_in_attributes(ray_session):
    """Issue #171: '$&' in attribute data must not corrupt GeoJSON
    output (the reference hit JS String.replace $-pattern expansion)."""
    gj = json.dumps({"type": "Feature", "properties": {"foo": " $& "},
                     "geometry": {"type": "Point",
                                  "coordinates": [0, 0]}})
    out = apply_commands("-i input.json -o output.json",
                         {"input.json": gj})
    doc = json.loads(out["output.json"])      # throws if invalid
    assert doc["features"][0]["properties"]["foo"] == " $& "


def test_issue_174_merge_layers_single_no_attributes(ray_session):
    """Issue #174: -merge-layers on a bare-geometry layer exports a
    GeometryCollection."""
    a = {"type": "Point", "coordinates": [0, 0]}
    out = apply_commands("-i 1.json -merge-layers -o",
                         {"1.json": json.dumps(a)})
    assert json.loads(out["1.json"]) == {
        "type": "GeometryCollection", "geometries": [a]}


def test_issue_174_merge_two_attribute_free_layers(ray_session):
    a = {"type": "Feature", "properties": None,
         "geometry": {"type": "Point", "coordinates": [0, 0]}}
    b = {"type": "Point", "coordinates": [1, 1]}
    out = apply_commands(
        "-i 1.json 2.json combine-files -merge-layers -o out.json",
        {"1.json": json.dumps(a), "2.json": json.dumps(b)})
    assert json.loads(out["out.json"]) == {
        "type": "GeometryCollection",
        "geometries": [a["geometry"], b]}


def test_issue_192_clip_polyline_with_null_geometry(ray_session):
    """Issue #192: clipping a polyline layer containing a null
    geometry must not crash and must clip the real line."""
    a = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {},
         "geometry": {"type": "LineString",
                      "coordinates": [[0, 1], [10, 1]]}},
        {"type": "Feature", "properties": {}, "geometry": None}]}
    b = {"type": "Polygon",
         "coordinates": [[[1, 0], [1, 2], [2, 2], [2, 0], [1, 0]]]}
    out = apply_commands("-i b.json -i a.json -clip b -o",
                         {"a.json": json.dumps(a),
                          "b.json": json.dumps(b)})
    geom = json.loads(out["a.json"])
    assert geom == {"type": "GeometryCollection", "geometries": [
        {"type": "LineString", "coordinates": [[1, 1], [2, 1]]}]}


def test_issue_192_clip_points_with_null_geometry(ray_session):
    a = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {},
         "geometry": {"type": "Point", "coordinates": [1, 1]}},
        {"type": "Feature", "properties": {}, "geometry": None}]}
    b = {"type": "Polygon",
         "coordinates": [[[0, 0], [0, 2], [2, 2], [2, 0], [0, 0]]]}
    out = apply_commands("-i b.json -i a.json -clip b -o",
                         {"a.json": json.dumps(a),
                          "b.json": json.dumps(b)})
    geom = json.loads(out["a.json"])
    assert geom == {"type": "GeometryCollection", "geometries": [
        {"type": "Point", "coordinates": [1, 1]}]}


def test_issue_161_simplify_shrinks_svg(ray_session):
    """Issue #161: simplification is applied to SVG output — the
    post-simplify SVG must be smaller than the pre-simplify one."""
    out = apply_commands(
        "-i /root/reference/test/test_data/two_states.shp "
        "-o a.svg -simplify 10% -o b.svg", {})
    assert len(out["a.svg"]) > len(out["b.svg"])


def test_issue_247_svg_layer_ids(ray_session):
    """Issue #247: multi-target SVG export wraps each layer in a <g>
    with the layer's name as id, sharing one pixel transform."""
    import re
    inp = {"type": "LineString", "coordinates": [[0, 0], [2, 1]]}
    out = apply_commands(
        '-i line.json -points vertices + name="vertices" '
        "-o target=vertices,line graphic.svg",
        {"line.json": json.dumps(inp)})
    svg = out["graphic.svg"].decode("utf8")
    assert re.search(r'<g[^>]* id="vertices"', svg)
    assert re.search(r'<g[^>]* id="line"', svg)


def test_bare_o_format_topojson_derives_json_name(ray_session):
    """Reference getOutputFileName: topojson's default extension is
    .json (src/topojson/topojson-export.js:14)."""
    gj = json.dumps({"type": "Point", "coordinates": [0, 0]})
    out = apply_commands("-i a.json -o format=topojson",
                         {"a.json": gj})
    assert "a.json" in out
    doc = json.loads(out["a.json"])
    assert doc["type"] == "Topology"


def test_apply_commands_does_not_mutate_command_list(ray_session):
    from mapshaper_ray.commands import parse_commands
    gj = json.dumps({"type": "Point", "coordinates": [0, 0]})
    cmds = parse_commands("-i a.json -o out.json")
    import copy
    snapshot = copy.deepcopy(cmds)
    apply_commands(cmds, {"a.json": gj})
    assert cmds == snapshot


def test_o_comma_target_single_survivor(ray_session):
    """target=a,gone with one surviving layer still exports THAT
    layer, not the current target."""
    a = {"type": "Feature", "properties": {"which": "A"},
         "geometry": {"type": "Point", "coordinates": [0, 0]}}
    b = {"type": "Feature", "properties": {"which": "B"},
         "geometry": {"type": "Point", "coordinates": [1, 1]}}
    out = apply_commands(
        "-i a.json -i b.json -o target=a,missing out.json",
        {"a.json": json.dumps(a), "b.json": json.dumps(b)})
    doc = json.loads(out["out.json"])
    assert doc["features"][0]["properties"]["which"] == "A"


def test_float_bucket_part_distributes_grid_coords():
    """Integer-grid coordinates have zero low-mantissa bits; the
    float bucket hash must still spread them (regression: every grid
    vertex hashed to partition 0)."""
    import numpy as np

    from mapshaper_ray.ops.partition import float2_bucket_part
    gx, gy = np.meshgrid(np.arange(20.0), np.arange(20.0))
    parts = float2_bucket_part(gx.ravel(), gy.ravel(), 64)
    counts = np.bincount(parts, minlength=64)
    assert counts.max() <= 4 * 400 / 64          # no dominant bucket
    assert (counts > 0).sum() >= 32              # spread widely
