"""SVG sink: path/circle elements, y-flip, style columns."""

import json
import re

from mapshaper_ray.sources.geojson import read_geojson
from mapshaper_ray.sources.svg import write_svg


def test_write_svg_polygons(ray_session, tmp_path):
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"fill": "red"},
         "geometry": {"type": "Polygon", "coordinates":
                      [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]]}},
        {"type": "Feature", "properties": {"fill": "blue"},
         "geometry": {"type": "Polygon", "coordinates":
                      [[[10, 0], [20, 0], [20, 10], [10, 10], [10, 0]]]}},
    ]}
    src = tmp_path / "s.json"
    src.write_text(json.dumps(fc))
    out = tmp_path / "o.svg"
    write_svg(read_geojson(str(src)), str(out), width=200)
    svg = out.read_text()
    # reference template: XML prolog + svg attrs + <g id=...> wrapper
    assert svg.startswith('<?xml version="1.0"?>\n<svg ')
    assert svg.count("<path") == 2
    assert 'fill="red"' in svg and 'fill="blue"' in svg
    # reference sizing: width 200, margins 1px -> k=20/198,
    # height = 2 + 10/k = 101
    assert 'height="101"' in svg
    # y-flip: geo y=0 (bottom) renders at pixel 100 (101 - 1px
    # margin), geo y=10 (top) at pixel 1
    d = re.search(r'<path d="([^"]+)"', svg).group(1)
    ys = [float(v) for v in d.replace(" Z", "").split()[1:][1::2]]
    assert max(ys) == 100.0 and min(ys) == 1.0


def test_write_svg_points_and_lines(ray_session, tmp_path):
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"r": 5},
         "geometry": {"type": "Point", "coordinates": [5, 5]}},
    ]}
    src = tmp_path / "p.json"
    src.write_text(json.dumps(fc))
    out = tmp_path / "p.svg"
    write_svg(read_geojson(str(src)), str(out))
    svg = out.read_text()
    assert "<circle" in svg
    assert 'r="5"' in svg
