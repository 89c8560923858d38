"""GeoJSON source/sink.

Reader mirrors the reference's importers
(src/geojson/geojson-import.js:34-107 per-type importers;
src/io/mapshaper-json-import.js:58 incremental "features" splitter):
bytes → feature-string shards (brace-depth scanner, no full JSON.parse
of the whole file) → ``from_items`` shards → ``map_batches`` parse into
the Arrow layer tables of sources/layers.py.  Mixed-geometry input is
split into one layer per geometry class, like
src/dataset/mapshaper-dataset-utils.js:7-28 (divideFeaturesByType).

Writer mirrors src/geojson/geojson-export.js:9 (precision option,
per-feature stringify): each batch renders its features to GeoJSON
feature strings; ``write_geojson`` assembles one FeatureCollection
(small outputs / fixtures), ``write_geojson_shards`` writes NDJSON
shards for scale (one file per block, resumable).
"""

from __future__ import annotations
from .layers import nz as _nz

import json

import numpy as np
import pyarrow as pa

from .layers import (GEOM_POINT, GEOM_POLYGON, GEOM_POLYLINE,
                     clean_export_part, clean_export_ring, point_table,
                     polygon_table, polyline_table)

# ---------------------------------------------------------------------------
# incremental splitter


def split_features(buf: bytes | str) -> list[str]:
    """FeatureCollection bytes → list of per-feature JSON strings.
    Single brace/bracket-depth scan; strings/escapes handled; does not
    materialize a parsed tree for the whole file."""
    s = buf.decode("utf-8") if isinstance(buf, bytes) else buf
    key = '"features"'
    # only a FeatureCollection has a top-level features array — a bare
    # Feature may legitimately contain a PROPERTY named "features"
    if '"FeatureCollection"' in s[:4096]:
        k = s.find(key)
    elif '"GeometryCollection"' in s[:4096] and \
            '"coordinates"' not in s[:s.find('"GeometryCollection"')]:
        # top-level GeometryCollection: split its geometries array
        # (importGeoJSON handles both container types)
        key = '"geometries"'
        k = s.find(key)
    else:
        k = -1
    if k < 0:
        if s.lstrip().startswith("["):
            # bare ARRAY of Features/Geometries (valid reference input)
            i = s.index("[")
        else:  # bare Feature / Geometry
            return [s.strip()]
    else:
        i = s.index("[", k + len(key))
    out = []
    depth = 0
    start = None
    in_str = False
    esc = False
    for j in range(i, len(s)):
        c = s[j]
        if in_str:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
            continue
        if c == '"':
            in_str = True
        elif c == "{":
            if depth == 0:
                start = j
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0 and start is not None:
                out.append(s[start:j + 1])
                start = None
        elif c == "]" and depth == 0:
            break
    return out


# ---------------------------------------------------------------------------
# per-feature geometry normalization (→ layer rows)

def _poly_rows(geom):
    """Polygon/MultiPolygon coordinates → (rings_x, rings_y, ring_poly).

    Rings are REWOUND to the reference convention on import (importRing,
    src/paths/mapshaper-path-import.js:105-113): outer rings positive
    area, holes negative — downstream boolean ops (clip/erase flags,
    hole division) depend on it."""
    from ..geom.kernels import planar_ring_area
    coords = geom.get("coordinates") or []
    if geom["type"] == "Polygon":
        coords = [coords]
    rx, ry, rp = [], [], []
    for pi, poly in enumerate(coords):
        for ri, ring in enumerate(poly):
            arr = np.asarray(ring, dtype=np.float64)
            is_hole = ri > 0
            area = planar_ring_area(arr[:, 0], arr[:, 1])
            if (is_hole and area > 0) or (not is_hole and area < 0):
                arr = arr[::-1]
            rx.append(arr[:, 0])
            ry.append(arr[:, 1])
            rp.append(pi)
    return rx, ry, rp


def _line_rows(geom):
    coords = geom.get("coordinates") or []
    if geom["type"] == "LineString":
        coords = [coords]
    px, py = [], []
    for part in coords:
        arr = np.asarray(part, dtype=np.float64)
        px.append(arr[:, 0])
        py.append(arr[:, 1])
    return px, py


def _point_rows(geom):
    coords = geom.get("coordinates") or []
    if geom["type"] == "Point":
        coords = [coords]
    arr = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
    return arr[:, 0], arr[:, 1]


_GEOM_CLASS = {
    "Polygon": GEOM_POLYGON, "MultiPolygon": GEOM_POLYGON,
    "LineString": GEOM_POLYLINE, "MultiLineString": GEOM_POLYLINE,
    "Point": GEOM_POINT, "MultiPoint": GEOM_POINT,
}


def parse_feature_batch(batch: pa.Table, geom_class: str,
                        id_field: str | None = None,
                        keep_mismatch: bool = False) -> pa.Table:
    """Batch of {'feature_id', 'json'} rows → one layer table (features
    whose geometry class doesn't match are emitted as null geometry only
    if they have no class at all; mismatches are skipped — the caller
    routes classes to layers — unless ``keep_mismatch`` nulls them
    instead, the -i geometry-type= semantics)."""
    fids, geoms, props_list = [], [], []
    for fid, txt in zip(batch["feature_id"].to_pylist(),
                        batch["json"].to_pylist()):
        f = json.loads(txt)
        if f.get("type") == "Feature":
            geom, props = f.get("geometry"), f.get("properties") or {}
            if id_field and "id" in f:
                props = {**props, id_field: f["id"]}
        else:  # bare geometry
            geom, props = f, {}
        cls = _GEOM_CLASS.get((geom or {}).get("type"))
        if cls is not None and cls != geom_class:
            if not keep_mismatch:
                continue
            geom = None
        fids.append(fid)
        geoms.append(geom)
        props_list.append(props)

    # uniform property field set (fixInconsistentFields,
    # src/topojson/topojson-import.js:44-46)
    fields: list[str] = []
    for p in props_list:
        for k in p:
            if k not in fields:
                fields.append(k)
    attrs = {k: [p.get(k) for p in props_list] for k in fields}

    if geom_class == GEOM_POLYGON:
        rx, ry, rp = [], [], []
        for g in geoms:
            if g is None:
                rx.append([]); ry.append([]); rp.append([])
            else:
                a, b, c = _poly_rows(g)
                rx.append([r.tolist() for r in a])
                ry.append([r.tolist() for r in b])
                rp.append(c)
        return polygon_table(fids, rx, ry, rp, attrs)
    if geom_class == GEOM_POLYLINE:
        px, py = [], []
        for g in geoms:
            if g is None:
                px.append([]); py.append([])
            else:
                a, b = _line_rows(g)
                px.append([r.tolist() for r in a])
                py.append([r.tolist() for r in b])
        return polyline_table(fids, px, py, attrs)
    xs, ys = [], []
    for g in geoms:
        if g is None:
            xs.append([]); ys.append([])
        else:
            a, b = _point_rows(g)
            xs.append(a.tolist()); ys.append(b.tolist())
    return point_table(fids, xs, ys, attrs)


def read_geojson(path: str, geom_class: str | None = None,
                 shard_size: int = 512, id_field: str | None = None,
                 keep_mismatch: bool = False):
    """GeoJSON file → Ray Dataset of one layer.  ``geom_class`` selects
    the layer for mixed input (default: majority class).  File-level
    parallelism at scale comes from many files (one read task per file);
    within a file the splitter shards the feature strings."""
    import ray.data as rd
    with open(path, "rb") as f:
        feats = split_features(f.read())
    if geom_class is None:
        # majority vote on a cheap type sniff
        counts: dict[str, int] = {}
        for t in feats:
            for g, cls in _GEOM_CLASS.items():
                if f'"{g}"' in t:
                    counts[cls] = counts.get(cls, 0) + 1
                    break
        geom_class = max(counts, key=counts.get) if counts else GEOM_POINT
    items = [{"feature_id": i, "json": t} for i, t in enumerate(feats)]
    ds = rd.from_items(items)
    if len(items) > shard_size:
        ds = ds.repartition(max(1, len(items) // shard_size))
    gc = geom_class
    return ds.map_batches(
        lambda b: parse_feature_batch(b, gc, id_field, keep_mismatch),
        batch_format="pyarrow")


_TYPE_RE = None


def _feature_class(t: str):
    """Geometry class of one feature string (the first geometry-type
    token AT/AFTER the "geometry" member — a property value named like
    a geometry type must not misroute the feature; None = null
    geometry)."""
    global _TYPE_RE
    if _TYPE_RE is None:
        import re
        _TYPE_RE = re.compile(
            r'"type"\s*:\s*"(Point|MultiPoint|LineString|'
            r'MultiLineString|Polygon|MultiPolygon|GeometryCollection)"')
    k = t.find('"geometry"')
    m = _TYPE_RE.search(t, k + 10 if k >= 0 else 0)
    return _GEOM_CLASS.get(m.group(1)) if m else None


def read_geojson_split(path: str, shard_size: int = 512,
                       id_field: str | None = None):
    """GeoJSON file → [(geom_class, Dataset)] — one layer per geometry
    class in ENCOUNTER order, like the reference's
    divideFeaturesByType (src/dataset/mapshaper-dataset-utils.js:7;
    path import src/paths/mapshaper-path-import.js:154).  Null-geometry
    features ride with the first class."""
    import ray.data as rd
    with open(path, "rb") as f:
        feats = split_features(f.read())
    classes = [_feature_class(t) for t in feats]
    order: list[str] = []
    for c in classes:
        if c is not None and c not in order:
            order.append(c)
    if not order:
        order = [GEOM_POINT]
    out = []
    for j, cls in enumerate(order):
        idx = [i for i, c in enumerate(classes)
               if c == cls or (c is None and j == 0)]
        items = [{"feature_id": k, "json": feats[i]}
                 for k, i in enumerate(idx)]
        ds = rd.from_items(items)
        if len(items) > shard_size:
            ds = ds.repartition(max(1, len(items) // shard_size))
        out.append((cls, ds.map_batches(
            lambda b, gc=cls: parse_feature_batch(b, gc, id_field),
            batch_format="pyarrow")))
    return out


# ---------------------------------------------------------------------------
# writer

def _fmt_coord(v: float, decimals: int | None):
    import math
    v = float(v)  # numpy scalars break json.dumps
    if not math.isfinite(v):
        return None  # GeoJSON has no NaN/inf; null marks the defect
    if decimals is not None:
        v = round(v, decimals)
    if v == int(v) and abs(v) < 1e15:
        return int(v)
    return v



def _render_rows(batch: pa.Table, decimals=None,
                 as_features=True, props_cols=None,
                 id_col=None, prettify=False,
                 reverse_rings=False) -> list[tuple[int, str]]:
    from .jsnum import js_json, js_json_pretty
    ser = js_json_pretty if prettify else js_json
    from .layers import geom_type_of
    gt = geom_type_of(batch)
    names = batch.column_names
    attr_cols = props_cols if props_cols is not None else \
        [c for c in names
         if c not in ("feature_id", "rings_x", "rings_y", "ring_poly",
                      "part_x", "part_y", "px", "py", "__fields")]
    has_native = "__fields" in names  # merge-layers force marker
    d = batch.to_pydict()
    out = []
    for i in range(len(batch)):
        cols_i = attr_cols
        if has_native:
            # rows merged from another layer lack the other layer's
            # keys entirely (undefined in the reference -> omitted);
            # field ORDER is the row's own layer order
            avail = set(attr_cols)
            cols_i = [c for c in (d["__fields"][i] or "").split(",")
                      if c in avail]
        props = {c: d[c][i] for c in cols_i}
        for k, v in list(props.items()):
            if isinstance(v, np.floating):
                props[k] = float(v)
            elif isinstance(v, np.integer):
                props[k] = int(v)
        if gt == GEOM_POLYGON:
            rx, ry, rp = d["rings_x"][i], d["rings_y"][i], d["ring_poly"][i]
            polys: list[list] = []
            dropped_outer: set[int] = set()
            for x, y, p in zip(_nz(rx), _nz(ry), _nz(rp)):
                while len(polys) <= p:
                    polys.append([])
                xf = [_fmt_coord(a, decimals) for a in x]
                yf = [_fmt_coord(b, decimals) for b in y]
                # export-time collapse rule (reference exportPathData):
                # dedup + drop rings with <4 points or zero area; a
                # dropped OUTER ring takes its holes with it
                cleaned = clean_export_ring(xf, yf)
                if cleaned is None:
                    if not polys[p]:
                        dropped_outer.add(p)
                    continue
                if p in dropped_outer:
                    continue
                ring = [[a, b] for a, b in zip(cleaned[0].tolist(),
                                               cleaned[1].tolist())]
                if reverse_rings:  # -o rfc7946: CCW outers, CW holes
                    ring.reverse()
                polys[p].append(ring)
            polys = [pl for pl in polys if pl]
            if not polys:
                geom = None
            elif len(polys) == 1:
                geom = {"type": "Polygon", "coordinates": polys[0]}
            else:
                geom = {"type": "MultiPolygon", "coordinates": polys}
        elif gt == GEOM_POLYLINE:
            px_, py_ = d["part_x"][i], d["part_y"][i]
            parts = []
            for x, y in zip(_nz(px_), _nz(py_)):
                cleaned = clean_export_part(
                    [_fmt_coord(a, decimals) for a in x],
                    [_fmt_coord(b, decimals) for b in y])
                if cleaned is not None:
                    parts.append([[a, b] for a, b in
                                  zip(cleaned[0].tolist(),
                                      cleaned[1].tolist())])
            if not parts:
                geom = None
            elif len(parts) == 1:
                geom = {"type": "LineString", "coordinates": parts[0]}
            else:
                geom = {"type": "MultiLineString", "coordinates": parts}
        else:
            xs, ys = d["px"][i], d["py"][i]
            pts = [[_fmt_coord(a, decimals), _fmt_coord(b, decimals)]
                   for a, b in zip(_nz(xs), _nz(ys))]
            if not pts:
                geom = None
            elif len(pts) == 1:
                geom = {"type": "Point", "coordinates": pts[0]}
            else:
                geom = {"type": "MultiPoint", "coordinates": pts}
        if as_features:
            feat = {"type": "Feature", "geometry": geom,
                    "properties": props if attr_cols else None}
            if id_col is not None:
                # reference exportIds: id appended AFTER properties
                feat["id"] = d[id_col][i]
            out.append((d["feature_id"][i], ser(feat)))
        elif geom is not None:
            # bare-geometry mode skips null shapes (exportLayerAsGeoJSON
            # "don't add null objects to GeometryCollection")
            out.append((d["feature_id"][i], ser(geom)))
    return out


def render_features(ds, decimals=None, as_features=True,
                    props_cols=None, id_col=None, prettify=False,
                    reverse_rings=False):
    """Dataset → Dataset of {'feature_id', 'json'} rendered features."""
    def render(batch) -> pa.Table:
        # native block format: Arrow stays zero-copy; pandas blocks
        # (post-pandas-stage ragged object arrays) re-type via
        # to_arrow_safe — asking Ray for pyarrow here would crash on
        # them (ArrowNotImplementedError in the tensor extension)
        from .layers import to_arrow_safe
        rows = _render_rows(to_arrow_safe(batch), decimals, as_features,
                            props_cols, id_col, prettify,
                            reverse_rings)
        return pa.table({
            "feature_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "json": pa.array([r[1] for r in rows], type=pa.string())})
    return ds.map_batches(render, batch_format=None)


def write_geojson(ds, path: str, decimals=None, rotate=True,
                  id_field=None, bbox=False, drop_table=False,
                  cut_table=False, crs_null=False, geojson_type=None,
                  prettify=False, rfc7946=False):
    """Assemble one collection, ordered by feature_id (the reference
    preserves input order through every command — SURVEY.md §2.8).
    Byte-identical to the reference's exportDatasetAsGeoJSON: a layer
    WITH attribute fields becomes a FeatureCollection, one without
    becomes a GeometryCollection of bare geometries (null shapes
    skipped); formatGeoJSON framing (features joined with ',\\n' inside
    '[\\n...\\n]').  Small-output path; use write_geojson_shards at
    scale."""
    from .jsnum import js_json
    schema = ds.schema()
    if schema is None:
        # fully-emptied layer (e.g. erased by itself): the reference
        # writes an empty bare GeometryCollection
        with open(path, "w") as f:
            f.write('{"type":"GeometryCollection", "geometries": '
                    '[\n\n]}')
        return path
    names = schema.names
    attr_cols = [c for c in names
                 if c not in ("feature_id", "rings_x", "rings_y",
                              "ring_poly", "part_x", "part_y",
                              "px", "py", "__fields")]
    # reference getIdField: id-field= candidates + the default 'FID'
    idf_opts = ([id_field] if isinstance(id_field, str) else
                list(id_field or [])) + ["FID"]
    idf = next((f for f in idf_opts if f in attr_cols), None)
    # reference useFeatureProperties / useFeatureCollection
    use_props = not (drop_table or cut_table or not attr_cols or
                     attr_cols == ["FID"])
    as_features = use_props or bool(idf)
    if geojson_type:  # -o geojson-type= forces the collection kind
        as_features = geojson_type == "FeatureCollection"
        if not as_features:
            use_props = False
    props_cols = None
    if not use_props:
        props_cols = []
    elif idf == "FID" and not (isinstance(id_field, str) and
                               id_field == "FID"):
        # default id field is dropped from properties, user-set kept
        props_cols = [c for c in attr_cols if c != "FID"]
    if rotate and "rings_x" in names:
        # the reference exports AFTER buildTopology, where every ring
        # is rotated to its first junction vertex — rebuild through
        # topology so ring starts match the reference byte-for-byte.
        # Kernel outputs whose rings are ALREADY in reference arc order
        # (the refclip ports) pass rotate=False to keep their starts.
        from ..ops.features import _topology_rotated
        ds = _topology_rotated(ds)
    if rfc7946:
        crs_null = False  # RFC 7946 eliminated the crs member
    rendered = render_features(ds, decimals, as_features=as_features,
                               props_cols=props_cols,
                               id_col=idf, prettify=prettify,
                               reverse_rings=rfc7946).sort("feature_id")
    # preserve_order: without it iter_rows may yield the sorted blocks
    # in completion order under load (see layers.ordered_pandas)
    rendered.context.execution_options.preserve_order = True
    parts = [r["json"] for r in rendered.iter_rows()]
    coll = ("FeatureCollection", "features") if as_features else \
        ("GeometryCollection", "geometries")
    head = '{"type":"%s"' % coll[0]
    if crs_null:
        # reference exportCRS: projected coords -> explicit null crs
        head += ',"crs":null'
    if bbox:
        bb = _dataset_bbox(ds)
        if bb is not None:
            head += ',"bbox":' + js_json(bb)
    with open(path, "w") as f:
        f.write(head + ', "%s": [\n' % coll[1])
        f.write(",\n".join(parts))
        f.write("\n]}")
    return path


def _dataset_bbox(ds):
    """Merged dataset bounds (getDatasetBbox without the rfc7946
    antimeridian split)."""
    from .layers import geom_type_of
    df = ds.to_pandas()
    gt = geom_type_of(list(df.columns))
    cols = {"polygon": ("rings_x", "rings_y"),
            "polyline": ("part_x", "part_y"),
            "point": ("px", "py")}.get(gt)
    if cols is None:
        return None
    xs, ys = [], []
    for row in df.to_dict("records"):
        for x in _nz(row.get(cols[0])):
            xs.append(np.asarray(x if np.ndim(x) else [x], float))
        for y in _nz(row.get(cols[1])):
            ys.append(np.asarray(y if np.ndim(y) else [y], float))
    if not xs:
        return None
    ax, ay = np.concatenate(xs), np.concatenate(ys)
    return [float(ax.min()), float(ay.min()),
            float(ax.max()), float(ay.max())]


def write_geojson_shards(ds, out_dir: str, decimals=None):
    """NDJSON feature shards (one file per block) — the scale sink."""
    import os
    os.makedirs(out_dir, exist_ok=True)
    rendered = render_features(ds, decimals)

    def dump(batch: pa.Table) -> pa.Table:
        import uuid
        fn = os.path.join(out_dir, f"part-{uuid.uuid4().hex[:12]}.ndjson")
        with open(fn, "w") as f:
            for s in batch["json"].to_pylist():
                f.write(s + "\n")
        return pa.table({"file": pa.array([fn]),
                         "rows": pa.array([len(batch)], type=pa.int64())})

    return rendered.map_batches(dump, batch_format="pyarrow").to_pandas()


def write_geojson_combined(dss, path: str, decimals=None,
                           crs_null=False, prettify=False,
                           rfc7946=False):
    """-o combine-layers: all target layers into ONE FeatureCollection,
    features in layer order (reference geojson-export.js:30)."""
    parts = []
    for ds in dss:
        names = ds.schema().names
        attr_cols = [c for c in names
                     if c not in ("feature_id", "rings_x", "rings_y",
                                  "ring_poly", "part_x", "part_y",
                                  "px", "py", "__fields")]
        rendered = render_features(
            ds, decimals, as_features=True,
            props_cols=None if attr_cols else [],
            prettify=prettify,
            reverse_rings=rfc7946).sort("feature_id")
        rendered.context.execution_options.preserve_order = True
        parts.extend(r["json"] for r in rendered.iter_rows())
    head = '{"type":"FeatureCollection"'
    if crs_null and not rfc7946:
        head += ',"crs":null'
    with open(path, "w") as f:
        f.write(head + ', "features": [\n')
        f.write(",\n".join(parts))
        f.write("\n]}")
    return path
