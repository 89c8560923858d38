"""SVG sink (SURVEY.md §2.1 SVG writer row; reference
src/svg/mapshaper-svg.js:12 + geojson-to-svg.js:1-237).

Renders a layer Dataset to an SVG document: polygons/lines become
``<path>`` elements (M/L/Z commands), points become ``<circle>``;
presentation columns (stroke, stroke-width, fill, opacity, r, class —
the reference's reserved style fields) map to attributes when present.
Coordinates scale into a width×height viewport with the y-axis flipped
(screen convention, reference mapshaper-pixel-transform.js).
Per-feature rendering runs in map_batches; document assembly is the
single-writer step, ordered by feature_id.
"""

from __future__ import annotations
from .layers import nz as _nz

import numpy as np
import pandas as pd

STYLE_FIELDS = ("stroke", "stroke-width", "fill", "opacity", "r", "class")


_STYLE_ALIASES = {"stroke_width": "stroke-width"}


def _fmt(v):
    v = float(v)
    return str(int(v)) if v == int(v) else f"{v:.2f}"


def _style_attrs(row, defaults):
    attrs = dict(defaults)
    for col in row.index:
        name = _STYLE_ALIASES.get(col, col)
        if name in STYLE_FIELDS and row[col] is not None \
                and not (isinstance(row[col], float) and np.isnan(row[col])):
            attrs[name] = row[col]
    return "".join(f' {k}="{v}"' for k, v in attrs.items())


def render_svg_elements(ds, bbox, width=800, height=None, defaults=None):
    """Dataset → Dataset of {'feature_id','svg'} element strings."""
    from .layers import geom_type_of
    xmin, ymin, xmax, ymax = bbox
    w = (xmax - xmin) or 1.0
    h = (ymax - ymin) or 1.0
    height = height or max(1, int(round(width * h / w)))
    sx = width / w
    sy = height / h

    def tx(x):
        return (np.asarray(x, dtype=np.float64) - xmin) * sx

    def ty(y):
        return height - (np.asarray(y, dtype=np.float64) - ymin) * sy

    defaults = defaults or {}

    def render(df: pd.DataFrame) -> pd.DataFrame:
        gt = geom_type_of(list(df.columns))
        out = []
        for _, row in df.iterrows():
            style = _style_attrs(
                row.drop([c for c in ("rings_x", "rings_y", "ring_poly",
                                      "part_x", "part_y", "px", "py",
                                      "feature_id") if c in row.index]),
                defaults)
            if gt == "point":
                xs = _nz(row["px"])
                ys = _nz(row["py"])
                el = "".join(
                    f'<circle cx="{_fmt(a)}" cy="{_fmt(b)}"{style}/>'
                    for a, b in zip(tx(xs), ty(ys)))
            else:
                if gt == "polygon":
                    parts = zip(_nz(row["rings_x"]), _nz(row["rings_y"]))
                    close = "Z"
                else:
                    parts = zip(_nz(row["part_x"]), _nz(row["part_y"]))
                    close = ""
                d = []
                for x, y in parts:
                    px = tx(x)
                    py = ty(y)
                    d.append("M" + " L".join(
                        f"{_fmt(a)} {_fmt(b)}" for a, b in zip(px, py))
                        + close)
                el = f'<path d="{" ".join(d)}"{style}/>' if d else ""
            out.append({"feature_id": row["feature_id"], "svg": el})
        return pd.DataFrame(out)
    return ds.map_batches(render, batch_format="pandas")


def write_svg(ds, path: str, width=800, defaults=None):
    """Layer Dataset → one SVG file (small-output single-writer sink)."""
    from ..ops.features import layer_info
    info = layer_info(ds)
    bbox = info["bbox"]
    xmin, ymin, xmax, ymax = bbox
    w = (xmax - xmin) or 1.0
    h = (ymax - ymin) or 1.0
    height = max(1, int(round(width * h / w)))
    defaults = defaults or {"fill": "none", "stroke": "black"}
    els = render_svg_elements(ds, bbox, width, height, defaults) \
        .to_pandas().sort_values("feature_id")
    with open(path, "w") as f:
        f.write(f'<svg xmlns="http://www.w3.org/2000/svg" '
                f'width="{width}" height="{height}" '
                f'viewBox="0 0 {width} {height}">')
        f.write("".join(els["svg"]))
        f.write("</svg>")
    return path
