"""TopoJSON source/sink with reference-exact quantization.

Math ported from the reference spec (what to compute, not how):
- quantized bounds:  unit = [w/(q-1), h/(q-1)]; bounds2 = (0,0,
  ceil(w/unitX), ceil(h/unitY))               (topojson-export.js:166-181)
- forward transform: mx = W2/W, bx = -mx*xmin (mbloch-utils Bounds.
  getTransform); quantized = floor(fw(x)+0.5) (JS Math.round half-up,
  topojson-export.js:94-96)
- emitted transform: scale = 1/mx, translate = -bx/mx   (Transform.invert)
- arcs delta-encoded after quantization       (topojson-export.js:70-73)
- decode: cumulative sum, then x*scale+translate
  (topojson-import.js:64-84)

The writer is the single-writer sink of SURVEY.md §2.1 (TopoJSON needs
the global arc table → one group per output file); topology build uses
topo/build.py.  The reader reconstructs per-feature coordinates from the
shared arcs and emits the Arrow layer tables (sources/layers.py), plus
the decoded arcs for topology-aware consumers.
"""

from __future__ import annotations

import json

import numpy as np

from ..topo.arcs import ArcTable
from ..topo.build import build_topology
from .layers import polygon_table, polyline_table


def js_round(v: np.ndarray) -> np.ndarray:
    """JS Math.round: half-up (floor(x+0.5)), not banker's rounding."""
    return np.floor(np.asarray(v, dtype=np.float64) + 0.5)


# ---------------------------------------------------------------------------
# export

def _quantize_params(arcs, xmin, ymin, xmax, ymax, quantization):
    """calcExportBounds + Bounds.getTransform (reference
    src/topojson/topojson-export.js:155-180): ``quantization=None``
    selects the reference DEFAULT — auto resolution at 0.02 of the
    average |dx|, |dy| segment extents; an explicit N uses
    width/(N-1)."""
    w = xmax - xmin
    h = ymax - ymin
    if quantization:
        ux = (w / (quantization - 1)) if w else 1.0
        uy = (h / (quantization - 1)) if h else 1.0
    else:
        dx = np.abs(np.diff(arcs.xx))
        dy = np.abs(np.diff(arcs.yy))
        # exclude inter-arc jumps from the segment stats
        brk = np.cumsum(arcs.nn)[:-1] - 1
        keep = np.ones(len(dx), dtype=bool)
        keep[brk] = False
        ux = float(np.mean(dx[keep])) * 0.02 if keep.any() else 1.0
        uy = float(np.mean(dy[keep])) * 0.02 if keep.any() else 1.0
    x2 = np.ceil(w / ux) if w and ux else 0.0
    y2 = np.ceil(h / uy) if h and uy else 0.0
    mx = (x2 / w) if w else 1.0
    my = (y2 / h) if h else 1.0
    bx = 0.0 - mx * xmin
    by = 0.0 - my * ymin
    return mx, my, bx, by


def export_topojson(features, attrs=None, quantization=None,
                    geometry_type="polygon", object_name="layer1",
                    ring_poly=None):
    """features: list of shapes, each a list of rings/parts (Nx2 float
    arrays, first ring of a polygon = outer) → TopoJSON dict.
    Shared borders are stored once (arc-based topology).
    ``ring_poly``: per feature, the polygon index of each ring —
    features spanning >1 polygon emit type MultiPolygon (without it a
    second outer ring would read as a hole of the first)."""
    return export_topojson_layers(
        [(object_name, geometry_type, features, attrs, ring_poly)],
        quantization=quantization)


def export_topojson_layers(layers, quantization=None):
    """Multiple layers → ONE Topology whose objects share a single arc
    table (the reference exports every target layer into one topology,
    src/topojson/topojson-export.js exportTopology).  ``layers``:
    [(object_name, geometry_type, features, attrs, ring_poly)]; point
    layers quantize their coordinates with the shared transform and
    contribute no arcs."""
    all_feats = []
    closed_flags = []   # per-feature: polygon rings rotate/canonicalize
    spans = {}
    for li, (name, gt, feats, attrs, rp) in enumerate(layers):
        if gt in ("polygon", "polyline"):
            spans[li] = (len(all_feats), len(feats))
            all_feats.extend(
                [[np.asarray(p, dtype=np.float64) for p in parts]
                 for parts in feats])
            closed_flags.extend([gt == "polygon"] * len(feats))
    arcs, shapes = build_topology(all_feats, closed=closed_flags)

    if len(arcs.xx):
        xmin, ymin = float(arcs.xx.min()), float(arcs.yy.min())
        xmax, ymax = float(arcs.xx.max()), float(arcs.yy.max())
    else:  # point-only topology: bounds from the point layers
        ax = np.concatenate([np.asarray(f[0], float)
                             for _, gt, feats, _, _ in layers
                             if gt == "point" for f in feats if f]
                            or [np.array([0.0])])
        ay = np.concatenate([np.asarray(f[1], float)
                             for _, gt, feats, _, _ in layers
                             if gt == "point" for f in feats if f]
                            or [np.array([0.0])])
        xmin, ymin = float(ax.min()), float(ay.min())
        xmax, ymax = float(ax.max()), float(ay.max())
    mx, my, bx, by = _quantize_params(arcs, xmin, ymin, xmax,
                                      ymax, quantization)

    out_arcs = []
    q_abs = []          # absolute quantized coords per arc
    arc_len = []        # arc has any nonzero segment post-quantization
    for a in range(len(arcs.nn)):
        i0 = arcs.ii[a]
        n = arcs.nn[a]
        qx = js_round(arcs.xx[i0:i0 + n] * mx + bx).astype(np.int64)
        qy = js_round(arcs.yy[i0:i0 + n] * my + by).astype(np.int64)
        q_abs.append((qx, qy))
        arc_len.append(bool(np.any(np.diff(qx) != 0) or
                            np.any(np.diff(qy) != 0)))
        dx = np.diff(qx, prepend=0)
        dy = np.diff(qy, prepend=0)
        dx[0] = qx[0]
        dy[0] = qy[0]
        out_arcs.append(np.stack([dx, dy], axis=1).tolist())

    def _ring_coords(ids):
        pts = []
        for sid in ids:
            qx, qy = q_abs[sid if sid >= 0 else ~sid]
            if sid < 0:
                qx, qy = qx[::-1], qy[::-1]
            pts.append(np.stack([qx, qy], axis=1))
        return np.concatenate(pts)

    def _filter_empty(shape):
        # reference filterEmptyArcs: drop arcs that collapse to a
        # point after quantization; drop emptied rings
        out = []
        for ids in shape:
            kept = [sid for sid in ids
                    if arc_len[sid if sid >= 0 else ~sid]]
            if kept:
                out.append(kept)
        return out

    def _group_rings(shape):
        """Reference explodePolygon on the QUANTIZED coords
        (groupPolygonRings, src/utils/mapshaper-path-utils.js:261-330):
        rings with positive reference-sign area (CW) start groups,
        holes attach to the smallest bbox-containing bigger ring,
        zero-area rings drop."""
        metas = []
        for ids in shape:
            P = _ring_coords(ids).astype(np.float64)
            # reference getPlanarPathArea: CW rings positive
            area = -0.5 * float(np.sum(P[:-1, 0] * P[1:, 1] -
                                       P[1:, 0] * P[:-1, 1]))
            bb = (P[:, 0].min(), P[:, 1].min(),
                  P[:, 0].max(), P[:, 1].max())
            metas.append((ids, area, bb))
        groups = [[m] for m in metas if m[1] > 0]
        holes = [m for m in metas if m[1] < 0]
        for hole in holes:
            hb = hole[2]
            ha = -hole[1]
            cid, carea = -1, 0.0
            for gi, grp in enumerate(groups):
                _, ra, rb = grp[0]
                contained = (rb[0] <= hb[0] and rb[1] <= hb[1] and
                             rb[2] >= hb[2] and rb[3] >= hb[3] and
                             ra > ha)
                if contained and (carea == 0.0 or ra < carea):
                    carea, cid = ra, gi
            if cid >= 0:
                groups[cid].append(hole)
        return [[list(m[0]) for m in grp] for grp in groups]

    def _layer_geoms(shapes_slice, geometry_type, attrs, feats):
      geoms = []
      for i, shape in enumerate(shapes_slice):
        if geometry_type == "point":
            xs, ys = feats[i] if feats[i] else ([], [])
            pts = [[int(a), int(b)] for a, b in
                   zip(js_round(np.asarray(xs, float) * mx + bx)
                       .astype(np.int64).tolist(),
                       js_round(np.asarray(ys, float) * my + by)
                       .astype(np.int64).tolist())]
            if not pts:
                geom = {"type": None}
            elif len(pts) == 1:
                geom = {"type": "Point", "coordinates": pts[0]}
            else:
                geom = {"type": "MultiPoint", "coordinates": pts}
            if attrs is not None:
                geom["properties"] = attrs[i]
            geoms.append(geom)
            continue
        if shape:
            shape = _filter_empty(shape)
        if not shape:
            geom = {"type": None}
        elif geometry_type == "polygon":
            # reference exportPolygonGeom: 'arcs' set BEFORE 'type'
            # (key order matters for byte-identical stringify); rings
            # regrouped on the quantized coords via explodePolygon —
            # shape.length 1 skips the regroup entirely
            if len(shape) > 1:
                polys = _group_rings(shape)
                if len(polys) == 1:
                    geom = {"arcs": polys[0], "type": "Polygon"}
                else:  # incl. empty: reference emits MultiPolygon []
                    geom = {"arcs": polys, "type": "MultiPolygon"}
            else:
                geom = {"arcs": [list(p) for p in shape],
                        "type": "Polygon"}
        else:
            parts = [list(p) for p in shape]
            geom = ({"type": "LineString", "arcs": parts[0]}
                    if len(parts) == 1 else
                    {"type": "MultiLineString", "arcs": parts})
        if attrs is not None:
            geom["properties"] = attrs[i]
        geoms.append(geom)
      return geoms

    objects = {}
    for li, (name, gt, feats, attrs, rp) in enumerate(layers):
        if gt in ("polygon", "polyline"):
            s0, n = spans[li]
            geoms = _layer_geoms(shapes[s0:s0 + n], gt, attrs, feats)
        else:
            geoms = _layer_geoms([None] * len(feats), "point", attrs,
                                 feats)
        objects[name] = {"type": "GeometryCollection",
                         "geometries": geoms}

    # key insertion order mirrors the reference's exportTopology
    # ({type, arcs} literal, then transform, then objects) so
    # JSON.stringify-equivalent serialization is byte-identical
    return {
        "type": "Topology",
        "arcs": out_arcs,
        "transform": {"scale": [1.0 / mx, 1.0 / my],
                      "translate": [-bx / mx, -by / my]},
        "objects": objects,
    }


def write_topojson(features, path, **kw):
    from .jsnum import js_json
    topo = export_topojson(features, **kw)
    with open(path, "w") as f:
        f.write(js_json(topo))
    return path


def _layer_tuple(ds, name):
    """Layer Dataset → (name, geom_type, features, attrs, ring_poly)
    for export_topojson_layers."""
    from .layers import GEOM_COLS, geom_type_of, nz
    df = ds.to_pandas().sort_values("feature_id").reset_index(drop=True)
    gt = geom_type_of(list(df.columns))
    if gt == "polygon":
        xcol, ycol = "rings_x", "rings_y"
    elif gt == "polyline":
        xcol, ycol = "part_x", "part_y"
    else:
        xcol, ycol = "px", "py"
    feats = []
    for row in df.to_dict("records"):
        if gt == "point":
            feats.append((list(nz(row[xcol])), list(nz(row[ycol]))))
            continue
        feats.append([np.stack([np.asarray(x, float),
                                np.asarray(y, float)], axis=1)
                      for x, y in zip(nz(row[xcol]), nz(row[ycol]))])
    geom_cols = set(GEOM_COLS[gt]) | {"feature_id", "__fields"}
    attr_cols = [c for c in df.columns if c not in geom_cols]
    attrs = (df[attr_cols].to_dict("records") if attr_cols
             else [{} for _ in feats])
    rp = ([list(v) if v is not None else None
           for v in df["ring_poly"]] if gt == "polygon" else None)
    return (name, gt, feats, attrs, rp)


def write_topojson_layer(ds, path, object_name="layer1",
                         quantization=None):
    """Layer Dataset → TopoJSON file (single-writer sink: TopoJSON needs
    the global shared-arc table, SURVEY.md §2.1 TopoJSON-writer row —
    reference inferOutputFormat maps .topojson here,
    src/io/mapshaper-file-types.js:42-56)."""
    return write_topojson_layers([_layer_tuple(ds, object_name)], path,
                                 quantization=quantization)


def write_topojson_layers(named_layers, path, quantization=None):
    """[(name, Dataset) or layer tuple] → ONE Topology file whose
    objects share an arc table (reference multi-layer -o topojson)."""
    from .jsnum import js_json
    tuples = [(t if isinstance(t, tuple) and len(t) == 5
               else _layer_tuple(t[1], t[0])) for t in named_layers]
    topo = export_topojson_layers(tuples, quantization=quantization)
    with open(path, "w") as f:
        f.write(js_json(topo))
    return path


# ---------------------------------------------------------------------------
# import

def decode_arcs(topo) -> ArcTable:
    tr = topo.get("transform")
    xs, ys, nn = [], [], []
    for arc in topo["arcs"]:
        a = np.asarray(arc, dtype=np.float64)
        if tr is not None:
            a = np.cumsum(a, axis=0)
            x = a[:, 0] * tr["scale"][0] + tr["translate"][0]
            y = a[:, 1] * tr["scale"][1] + tr["translate"][1]
        else:
            x, y = a[:, 0], a[:, 1]
        xs.append(x)
        ys.append(y)
        nn.append(len(x))
    return ArcTable(np.concatenate(xs) if xs else np.empty(0),
                    np.concatenate(ys) if ys else np.empty(0),
                    np.asarray(nn, dtype=np.int64))


def _path_coords(arcs: ArcTable, ids):
    """Signed arc-id path → x, y arrays (reverse for ~id; joined arcs
    share their junction vertex once)."""
    px, py = [], []
    for k, sid in enumerate(ids):
        aid = ~sid if sid < 0 else sid
        i0 = arcs.ii[aid]
        n = arcs.nn[aid]
        x = arcs.xx[i0:i0 + n]
        y = arcs.yy[i0:i0 + n]
        if sid < 0:
            x, y = x[::-1], y[::-1]
        if k:
            x, y = x[1:], y[1:]
        px.append(x)
        py.append(y)
    return np.concatenate(px), np.concatenate(py)


class _Layer(tuple):
    """(geom_class, feature_list, attrs) 3-tuple with a ``polys``
    attribute carrying per-feature ring→polygon nesting (MultiPolygon
    membership preserved from the source object, reference
    topojson-import.js per-poly arcs)."""

    def __new__(cls, geom_class, feats, attrs, polys):
        self = super().__new__(cls, (geom_class, feats, attrs))
        return self

    def __init__(self, geom_class, feats, attrs, polys):
        self.polys = polys


def _parse_topo_geom(g, arcs, topo):
    """One TopoJSON geometry → (geom_class_or_None, feature, polys)."""
    t = g.get("type")
    if t == "Polygon":
        return ("polygon", [_path_coords(arcs, ring)
                            for ring in g["arcs"]],
                [0] * len(g["arcs"]))
    if t == "MultiPolygon":
        return ("polygon", [_path_coords(arcs, ring)
                            for poly in g["arcs"] for ring in poly],
                [pi for pi, poly in enumerate(g["arcs"]) for _ in poly])
    if t == "LineString":
        return ("polyline", [_path_coords(arcs, g["arcs"])], [0])
    if t == "MultiLineString":
        return ("polyline", [_path_coords(arcs, part)
                             for part in g["arcs"]],
                [0] * len(g["arcs"]))
    if t in ("Point", "MultiPoint"):
        coords = (g.get("coordinates") or [])
        if t == "Point":
            coords = [coords]
        tr = topo.get("transform")
        pts = []
        for c in coords:
            if tr is not None:
                pts.append((c[0] * tr["scale"][0] + tr["translate"][0],
                            c[1] * tr["scale"][1] + tr["translate"][1]))
            else:
                pts.append((float(c[0]), float(c[1])))
        return ("point", [(np.array([p[0] for p in pts]),
                           np.array([p[1] for p in pts]))],
                [0] * len(pts))
    return (None, [], [])


def import_topojson(path_or_obj, object_name=None, split_types=False,
                    id_field=None):
    """TopoJSON → (ArcTable, {name: (geom_class, feature_list, attrs)})
    where feature_list rows are ring/part coordinate lists.  The layer
    tuple also carries ``.polys``: per feature, the polygon index of
    each ring (MultiPolygon nesting preserved).  With
    ``split_types=True``, each object maps to a LIST of per-class
    layers in encounter order (reference divideFeaturesByType,
    src/topojson/topojson-import.js:180)."""
    topo = path_or_obj
    if isinstance(topo, (str, bytes)):
        with open(topo) as f:
            topo = json.load(f)
    arcs = decode_arcs(topo)
    layers = {}
    objects = topo["objects"]
    names = [object_name] if object_name else list(objects)
    for name in names:
        obj = objects[name]
        geoms = (obj["geometries"] if obj["type"] == "GeometryCollection"
                 else [obj])
        parsed = [_parse_topo_geom(g, arcs, topo) for g in geoms]
        recs = [{**(g.get("properties") or {}),
                 **({id_field: g["id"]} if id_field and "id" in g
                    else {})} for g in geoms]
        if split_types:
            order = []
            for c, _, _ in parsed:
                if c is not None and c not in order:
                    order.append(c)
            if not order:
                order = ["polygon"]
            parts = []
            for j, cls in enumerate(order):
                f, a, p = [], [], []
                for (c, feat, poly), rec in zip(parsed, recs):
                    if c == cls or (c is None and j == 0):
                        f.append(feat)
                        a.append(rec)
                        p.append(poly)
                parts.append(_Layer(cls, f, a, p))
            layers[name] = parts
        else:
            cls = next((c for c, _, _ in parsed if c is not None),
                       "polygon")
            layers[name] = _Layer(cls, [f for _, f, _ in parsed], recs,
                                  [p for _, _, p in parsed])
    return arcs, layers


def _layer_to_dataset(layer: _Layer, shard_size=512):
    import ray.data as rd
    cls, feats, attrs = layer
    fields: list[str] = []
    for p in attrs:
        for k in p:
            if k not in fields:
                fields.append(k)
    acols = {k: [p.get(k) for p in attrs] for k in fields}
    fids = list(range(len(feats)))
    if cls == "polygon":
        rx = [[xy[0].tolist() for xy in f] for f in feats]
        ry = [[xy[1].tolist() for xy in f] for f in feats]
        rp = layer.polys  # MultiPolygon nesting from source
        tbl = polygon_table(fids, rx, ry, rp, acols)
    elif cls == "point":
        from .layers import point_table
        px = [f[0][0].tolist() if f else [] for f in feats]
        py = [f[0][1].tolist() if f else [] for f in feats]
        tbl = point_table(fids, px, py, acols)
    else:
        px = [[xy[0].tolist() for xy in f] for f in feats]
        py = [[xy[1].tolist() for xy in f] for f in feats]
        tbl = polyline_table(fids, px, py, acols)
    ds = rd.from_arrow(tbl)
    if len(feats) > shard_size:
        ds = ds.repartition(max(1, len(feats) // shard_size))
    return ds


def read_topojson(path, object_name=None, shard_size=512,
                  id_field=None):
    """TopoJSON file → Ray Dataset in the Arrow layer model (first /
    selected object)."""
    arcs, layers = import_topojson(path, object_name,
                                   id_field=id_field)
    name = object_name or next(iter(layers))
    return _layer_to_dataset(layers[name], shard_size)


def read_topojson_layers(path, shard_size=512, id_field=None):
    """TopoJSON file → [(object_name, n_classes_in_object, Dataset)] —
    one layer per object (reference: every object imports as a layer
    named by its key) and, within a mixed-type object, one layer per
    geometry class in encounter order."""
    arcs, layers = import_topojson(path, split_types=True,
                                   id_field=id_field)
    out = []
    for name, parts in layers.items():
        for part in parts:
            out.append((name, len(parts), _layer_to_dataset(
                part, shard_size)))
    return out
