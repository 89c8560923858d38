"""SVG sink — faithful port of the reference's SVG export
(src/svg/mapshaper-svg.js:12-46, svg/geojson-to-svg.js,
svg/svg-common.js, geom/mapshaper-pixel-transform.js:3-80,
geom/mapshaper-rounding.js:10-46), byte-identical output.

Pipeline: dataset bounds → pixel transform (margins, y-flip) →
coordinate precision rounding (0.0001 px) → per-feature GeoJSON-style
geometry (same export-time ring cleanup as the GeoJSON writer) → SVG
object tree (<path>/<circle>/<text> with filtered style attributes) →
stringify into the reference's fixed template.

Per-feature rendering could shard via map_batches; the document is a
single-writer fixture-scale sink (like the reference, which renders in
one process), so it assembles driver-side ordered by feature_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .jsnum import js_number_str
from .layers import nz as _nz

# reference SVG.propertiesBySymbolType (svg-common.js)
_COMMON = ("class", "opacity", "stroke", "stroke-width")
_PROPS_BY_TYPE = {
    "polygon": _COMMON + ("fill",),
    "polyline": _COMMON,
    "point": _COMMON + ("fill", "r"),
    "label": _COMMON + ("fill", "r", "font-family", "font-size",
                        "text-anchor", "font-weight", "font-style",
                        "letter-spacing"),
}
_STYLE_ALIASES = {"stroke_width": "stroke-width",
                  "label_text": "label-text"}


def _esc(s) -> str:
    return (str(s).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;")
            .replace("'", "&apos;"))


def _attr_str(v) -> str:
    if isinstance(v, str):
        return v
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return js_number_str(v)
    return str(v)


def _stringify(obj) -> str:
    """SVG.stringify (geojson-to-svg.js:29-49)."""
    svg = "<" + obj["tag"]
    join = "" if obj["tag"] in ("text", "tspan") else "\n"
    for k, v in (obj.get("properties") or {}).items():
        if (v is None or v == "" or (isinstance(v, float) and v != v)) \
                and v != 0:
            continue  # omit undefined/empty values (0 kept)
        svg += f' {k}="{_esc(_attr_str(v))}"'
    children = obj.get("children")
    value = obj.get("value")
    if children or value:
        svg += ">" + join
        if value:
            svg += str(value)
        if children:
            svg += join.join(_stringify(c) for c in children)
        svg += join + "</" + obj["tag"] + ">"
    else:
        svg += "/>"
    return svg


def _num(v) -> str:
    return js_number_str(float(v))


def _import_linestring(coords):
    d = "M " + " ".join(_num(p[0]) + " " + _num(p[1]) for p in coords)
    return {"tag": "path", "properties": {"d": d}}


def _import_polygon(coords):
    o = None
    for ring in coords:
        d = (o["properties"]["d"] + " ") if o else ""
        o = _import_linestring(ring)
        o["properties"]["d"] = d + o["properties"]["d"] + " Z"
    return o


def _import_multipath(coords, importer):
    o = None
    for c in coords:
        if o is None:
            o = importer(c)
        else:
            o["properties"]["d"] += " " + importer(c)["properties"]["d"]
    return o


def _import_label(p, rec):
    import re as _re
    line = rec.get("label-text") or ""
    props = {"x": p[0], "y": p[1]}
    if rec.get("dx"):
        props["dx"] = rec["dx"]
    if rec.get("dy"):
        props["dy"] = rec["dy"]
    lines = _re.split(r"\n|\\n|<br>", str(line), flags=_re.I)
    obj = {"tag": "text", "value": lines[0], "properties": props}
    if len(lines) > 1:
        obj["children"] = []
        for extra in lines[1:]:
            tspan = {"tag": "tspan", "value": extra,
                     "properties": {"x": p[0],
                                    "dy": rec.get("line-height",
                                                  "1.1em")}}
            if rec.get("dx"):
                tspan["properties"]["dx"] = rec["dx"]
            obj["children"].append(tspan)
    return obj


def _import_point(coords, rec, point_symbol=None):
    rec = rec or {}
    is_label = "label-text" in rec
    half = rec.get("r") or 0
    children = []
    if (isinstance(half, (int, float)) and half > 0) or not is_label:
        if point_symbol == "square":
            p = {"tag": "rect",
                 "properties": {"x": coords[0] - half,
                                "y": coords[1] - half,
                                "width": half * 2, "height": half * 2}}
        else:
            p = {"tag": "circle",
                 "properties": {"cx": coords[0], "cy": coords[1]}}
            if isinstance(half, (int, float)) and half > 0:
                p["properties"]["r"] = half
        children.append(p)
    if is_label:
        children.append(_import_label(coords, rec))
    if not children:
        return None
    return children[0] if len(children) == 1 else \
        {"tag": "g", "children": children}


def _import_multipoint(coords, rec, point_symbol=None):
    children = []
    for c in coords:
        p = _import_point(c, rec, point_symbol)
        if p is None:
            continue
        if p["tag"] == "g" and p.get("children"):
            children.extend(p["children"])
        else:
            children.append(p)
    return {"tag": "g", "children": children} if children else None


def _feature_svg(geom_type, coords, rec, point_symbol=None):
    if geom_type == "Polygon":
        o = _import_polygon(coords)
    elif geom_type == "MultiPolygon":
        o = _import_multipath(coords, _import_polygon)
    elif geom_type == "LineString":
        o = _import_linestring(coords)
    elif geom_type == "MultiLineString":
        o = _import_multipath(coords, _import_linestring)
    elif geom_type == "Point":
        o = _import_point(coords, rec, point_symbol)
    elif geom_type == "MultiPoint":
        o = _import_multipoint(coords, rec, point_symbol)
    else:
        o = None
    return o


def _apply_style(obj, symbol_type, rec):
    """applyStyleAttributes: copy the symbol type's allowed fields in
    record order; 'r' is consumed by the point importer."""
    if symbol_type == "point" and "label-text" in rec:
        symbol_type = "label"
    allowed = _PROPS_BY_TYPE.get(symbol_type, ())
    for k, v in rec.items():
        if k in allowed and k != "r":
            obj.setdefault("properties", {})[k] = v


def _parse_margin(opt) -> list[float]:
    s = str(opt) if opt is not None else ""
    m = s.strip().replace(",", " ").split()
    if len(m) == 0:
        m = [""]
    if len(m) == 1:
        m = m * 2
    if len(m) == 2:
        m = m + m
    if len(m) == 3:
        m = m + [m[2]]
    out = []
    for v in m[:4]:
        try:
            out.append(float(v))
        except ValueError:
            out.append(1.0)
    return out


def _js_round(x):
    # Math.round: half toward +infinity
    return np.floor(np.asarray(x, dtype=np.float64) + 0.5)


def write_svg(ds, path: str, width=None, height=None, margin=None,
              name=None, point_symbol=None, precision=0.0001,
              rotate=True, defaults=None):
    """Layer Dataset → one SVG file, byte-identical to the reference's
    -o format=svg.  ``name`` becomes the layer <g id=...>."""
    return write_svg_layers([(name or "layer1", ds)], path,
                            width=width, height=height, margin=margin,
                            point_symbol=point_symbol,
                            precision=precision, rotate=rotate,
                            defaults=defaults)


def write_svg_layers(layers, path: str, width=None, height=None,
                     margin=None, point_symbol=None, precision=0.0001,
                     rotate=True, defaults=None):
    """Multiple (name, Dataset) layers → ONE SVG: a shared pixel
    transform over the combined bounds and one <g id=name> group per
    layer (the reference's -o target=a,b SVG export,
    test/issue-247-test.js)."""
    from .layers import geom_type_of, ordered_pandas

    prepared = []
    for name, ds in layers:
        names = ds.schema().names
        gt = geom_type_of(names)
        if rotate and "rings_x" in names:
            from ..ops.features import _topology_rotated
            ds = _topology_rotated(ds)
        prepared.append((name, gt, ordered_pandas(ds)))

    # ---- combined bounds over every layer
    xs, ys = [], []
    for name, gt, df in prepared:
        gcols = (("rings_x", "rings_y") if gt == "polygon" else
                 ("part_x", "part_y") if gt == "polyline"
                 else ("px", "py"))
        for row in df.to_dict("records"):
            for x in _nz(row.get(gcols[0])):
                xs.append(np.asarray(x if np.ndim(x) else [x], float))
            for y in _nz(row.get(gcols[1])):
                ys.append(np.asarray(y if np.ndim(y) else [y], float))
    if not xs:
        raise ValueError("empty layer")
    ax = np.concatenate(xs)
    ay = np.concatenate(ys)
    xmin, xmax = float(ax.min()), float(ax.max())
    ymin, ymax = float(ay.min()), float(ay.max())

    # ---- transformDatasetToPixels (mapshaper-pixel-transform.js)
    margins = _parse_margin(margin)
    height_px = float(height or 0)
    width_px = float(width or (0 if height_px > 0 else 800))
    w = xmax - xmin
    h = ymax - ymin
    mx_pad = margins[0] + margins[2]
    my_pad = margins[1] + margins[3]
    kx = ky = 0.0
    if height_px > 0:
        ky = (h or w or 1) / (height_px - my_pad)
    if width_px > 0:
        kx = (w or h or 1) / (width_px - mx_pad)
    pad_x = pad_y = 0.0
    if not kx:
        k = ky
        width_px = mx_pad + w / k if w > 0 else height_px
    elif not ky:
        k = kx
        height_px = my_pad + h / k if h > 0 else width_px
    elif kx > ky:
        k = kx
        pad_y = k * (height_px - my_pad) - h
    elif ky > kx:
        k = ky
        pad_x = k * (width_px - mx_pad) - w
    else:
        k = kx
    # padBounds(margin*k + pad*0.5 each side)
    xmin -= margins[0] * k + pad_x * 0.5
    ymin -= margins[1] * k + pad_y * 0.5
    xmax += margins[2] * k + pad_x * 0.5
    ymax += margins[3] * k + pad_y * 0.5
    # fwd transform with flipY onto Bounds(0, 0, width_px, height_px)
    tmx = width_px / (xmax - xmin) if xmax > xmin else 1.0
    tbx = 0.0 - tmx * xmin
    tmy = -height_px / (ymax - ymin) if ymax > ymin else 1.0
    tby = height_px - tmy * ymin
    size = (int(_js_round(width_px)), int(_js_round(height_px)) or 1)

    inv = _js_round(1.0 / precision) if 1.0 / precision > 1 else \
        1.0 / precision

    def txy(x, y):
        px = np.asarray(x, float) * tmx + tbx
        py = np.asarray(y, float) * tmy + tby
        return (_js_round(px * inv) / inv, _js_round(py * inv) / inv)

    # ---- per-feature geometry (GeoJSON export rules) → SVG objects
    from .geojson import clean_export_part, clean_export_ring

    def build_layer(name, gt, df):
     attr_cols = [c for c in df.columns
                  if c not in ("feature_id", "rings_x", "rings_y",
                               "ring_poly", "part_x", "part_y",
                               "px", "py", "__fields")]
     children = []
     for row in df.to_dict("records"):
         rec = {_STYLE_ALIASES.get(c, c): row[c] for c in attr_cols}
         if gt == "polygon":
             polys: list[list] = []
             dropped: set[int] = set()
             rp = _nz(row.get("ring_poly"))
             for j, (x, y) in enumerate(zip(_nz(row["rings_x"]),
                                            _nz(row["rings_y"]))):
                 p = int(rp[j]) if len(rp) > j else 0
                 while len(polys) <= p:
                     polys.append([])
                 qx, qy = txy(x, y)
                 cleaned = clean_export_ring(qx.tolist(), qy.tolist())
                 if cleaned is None:
                     if not polys[p]:
                         dropped.add(p)
                     continue
                 if p in dropped:
                     continue
                 polys[p].append(list(zip(cleaned[0].tolist(),
                                          cleaned[1].tolist())))
             polys = [pl for pl in polys if pl]
             if not polys:
                 geom_type, coords = None, None
             elif len(polys) == 1:
                 geom_type, coords = "Polygon", polys[0]
             else:
                 geom_type, coords = "MultiPolygon", polys
         elif gt == "polyline":
             parts = []
             for x, y in zip(_nz(row["part_x"]), _nz(row["part_y"])):
                 qx, qy = txy(x, y)
                 cleaned = clean_export_part(qx.tolist(), qy.tolist())
                 if cleaned is not None:
                     parts.append(list(zip(cleaned[0].tolist(),
                                           cleaned[1].tolist())))
             if not parts:
                 geom_type, coords = None, None
             elif len(parts) == 1:
                 geom_type, coords = "LineString", parts[0]
             else:
                 geom_type, coords = "MultiLineString", parts
         else:
             qxs = _nz(row["px"])
             qys = _nz(row["py"])
             pts = []
             for a, b in zip(qxs, qys):
                 qx, qy = txy([a], [b])
                 pts.append((float(qx[0]), float(qy[0])))
             if not pts:
                 geom_type, coords = None, None
             elif len(pts) == 1:
                 geom_type, coords = "Point", pts[0]
             else:
                 geom_type, coords = "MultiPoint", pts

         obj = _feature_svg(geom_type, coords, rec, point_symbol) \
             if geom_type else None
         if obj is None:
             children.append({"tag": "g"})
             continue
         sym = {"Polygon": "polygon", "MultiPolygon": "polygon",
                "LineString": "polyline", "MultiLineString": "polyline",
                "Point": "point", "MultiPoint": "point"}[geom_type]
         _apply_style(obj, sym, rec)
         children.append(obj)

     # ---- layer <g> wrapper (getEmptyLayerForSVG)
     layer = {"tag": "g", "properties": {"id": name or "layer1"},
              "children": children}
     if gt == "polyline":
         layer["properties"]["fill"] = "none"
         layer["properties"]["stroke"] = "black"
         layer["properties"]["stroke-width"] = 1
     if "label-text" in (set(_STYLE_ALIASES.get(c, c)
                             for c in attr_cols)):
         layer["properties"]["font-family"] = "sans-serif"
         layer["properties"]["font-size"] = "12"
         layer["properties"]["text-anchor"] = "middle"
     if defaults:
         for k, v in defaults.items():
             layer["properties"].setdefault(k, v)
     return layer

    body = "\n".join(_stringify(build_layer(n, g, d))
                      for n, g, d in prepared)
    tpl = ('<?xml version="1.0"?>\n<svg xmlns="http://www.w3.org/'
           '2000/svg" version="1.2" baseProfile="tiny" width="%d" '
           'height="%d" viewBox="%s %s %s %s" stroke-linecap="round" '
           'stroke-linejoin="round">\n%s\n</svg>')
    with open(path, "w") as f:
        f.write(tpl % (size[0], size[1], 0, 0, size[0], size[1], body))
    return path
