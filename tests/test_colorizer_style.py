"""-colorizer / -svg-style + weighted/spherical simplify options."""

import numpy as np
import pytest

from mapshaper_ray.ops.colorizer import colorize, make_colorizer, svg_style


def test_sequential_breaks():
    fn = make_colorizer(colors=["a", "b", "c"], breaks=[10, 20])
    assert fn([5, 10, 15, 20, 25]).tolist() == ["a", "b", "b", "c", "c"]
    assert fn([np.nan])[0] == "white"


def test_categorical():
    fn = make_colorizer(colors=["red", "blue"], categories=["x", "y"],
                        other="grey")
    assert fn(["x", "y", "z", None]).tolist() == \
        ["red", "blue", "grey", "white"]


def test_bad_params():
    with pytest.raises(ValueError):
        make_colorizer(colors=["a"], breaks=[1, 2])
    with pytest.raises(ValueError):
        make_colorizer(colors=["a"])


def test_colorize_and_style_ds(ray_session):
    import ray.data as rd
    ds = rd.from_items([{"v": 5}, {"v": 15}, {"v": 25}])
    out = colorize(ds, "fill", "v", colors=["a", "b", "c"],
                   breaks=[10, 20])
    styled = svg_style(out, stroke="black", opacity=0.5).to_pandas()
    assert styled["fill"].tolist() == ["a", "b", "c"]
    assert (styled["stroke"] == "black").all()
    assert (styled["opacity"] == 0.5).all()


def test_weighted_and_spherical_simplify(ray_session, tmp_path):
    import json
    from mapshaper_ray.pipelines.simplify_layer import simplify_layer
    from mapshaper_ray.sources.geojson import read_geojson
    t = np.linspace(0, 2 * np.pi, 30)
    ring = [[10 + 3 * np.cos(v) + 0.2 * np.sin(5 * v),
             45 + 2 * np.sin(v)] for v in t]
    ring.append(ring[0])
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {},
         "geometry": {"type": "Polygon", "coordinates": [ring]}}]}
    src = tmp_path / "w.json"
    src.write_text(json.dumps(fc))
    for kw in ({"weighting": 0.7}, {"spherical": True},
               {"spherical": True, "weighting": 0.7}):
        out = simplify_layer(read_geojson(str(src)), pct=0.3,
                             **kw).to_pandas()
        n = len(out.iloc[0]["rings_x"][0])
        assert 4 <= n < 31, kw
