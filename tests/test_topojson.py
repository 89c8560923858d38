"""TopoJSON export/import: shared-border arc dedup, reference-exact
quantization (floor(x*mx+bx+0.5)), delta encoding, round-trip decode."""

import json

import numpy as np

from mapshaper_ray.sources.topojson import (export_topojson,
                                            import_topojson, js_round,
                                            read_topojson, write_topojson)

# two adjacent unit squares sharing the x=1 edge
SQ_A = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
SQ_B = np.array([[1, 0], [2, 0], [2, 1], [1, 1], [1, 0]], dtype=float)


def test_shared_border_stored_once():
    topo = export_topojson([[SQ_A], [SQ_B]], quantization=10001)
    # shared edge splits each square outline: 3 arcs total, not 2 rings
    assert len(topo["arcs"]) == 3
    geoms = topo["objects"]["layer1"]["geometries"]
    assert len(geoms) == 2
    ids_a = {(~i if i < 0 else i) for ring in geoms[0]["arcs"] for i in ring}
    ids_b = {(~i if i < 0 else i) for ring in geoms[1]["arcs"] for i in ring}
    assert ids_a & ids_b, "adjacent polygons must share an arc id"


def test_quantization_and_delta_roundtrip(tmp_path):
    attrs = [{"name": "a"}, {"name": "b"}]
    p = tmp_path / "t.topojson"
    write_topojson([[SQ_A], [SQ_B]], str(p), attrs=attrs,
                   quantization=10001)
    topo = json.loads(p.read_text())
    assert topo["type"] == "Topology"
    # delta encoding: second vertex of each arc is a delta, not absolute
    for arc in topo["arcs"]:
        assert all(isinstance(v, int) for pt in arc for v in pt)
    arcs, layers = import_topojson(str(p))
    cls, feats, back_attrs = layers["layer1"]
    assert cls == "polygon"
    assert back_attrs == attrs
    # decoded coords match the original within one quantization unit,
    # modulo ring rotation/direction (topology build rotates rings to
    # start at a junction, like the reference)
    for feat, orig in zip(feats, [SQ_A, SQ_B]):
        x, y = feat[0]
        assert len(x) == len(orig)
        assert _same_ring(np.stack([x, y], axis=1), orig, atol=2.0 / 10000)


def _same_ring(a, b, atol):
    """Ring equality modulo rotation and direction (closed rings: drop
    the duplicated closing vertex before rotating)."""
    a, b = np.asarray(a)[:-1], np.asarray(b)[:-1]
    if len(a) != len(b):
        return False
    for cand in (a, a[::-1]):
        for s in range(len(cand)):
            if np.allclose(np.roll(cand, -s, axis=0), b, atol=atol):
                return True
    return False


def test_js_round_half_up():
    assert js_round(np.array([0.5, 1.5, -0.5, -1.5])).tolist() == \
        [1.0, 2.0, 0.0, -1.0]  # JS Math.round semantics, not banker's


def test_read_topojson_dataset(ray_session, tmp_path):
    p = tmp_path / "t.topojson"
    write_topojson([[SQ_A], [SQ_B]], str(p),
                   attrs=[{"name": "a"}, {"name": "b"}],
                   quantization=100001)
    ds = read_topojson(str(p))
    df = ds.to_pandas().sort_values("feature_id")
    assert len(df) == 2
    assert list(df["name"]) == ["a", "b"]
    x0 = np.asarray(df.iloc[0]["rings_x"][0])
    assert np.allclose(sorted(set(np.round(x0, 3))), [0.0, 1.0], atol=1e-3)


def test_polyline_topology():
    # a Y: three lines meeting at (1,1) -> junction cuts, 3 arcs
    l1 = np.array([[0, 0], [1, 1]], dtype=float)
    l2 = np.array([[2, 0], [1, 1]], dtype=float)
    l3 = np.array([[1, 2], [1, 1]], dtype=float)
    topo = export_topojson([[l1], [l2], [l3]], quantization=10001,
                           geometry_type="polyline")
    assert len(topo["arcs"]) == 3
    _, layers = import_topojson(topo)
    cls, feats, _ = layers["layer1"]
    assert cls == "polyline"
    assert len(feats) == 3
