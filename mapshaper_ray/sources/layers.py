"""Arrow-native layer model — the distributed equivalent of the
reference's Layer {geometry_type, shapes, data}
(src/io/mapshaper-export.js:163-178: 'polygon' | 'polyline' | 'point').

One Ray Dataset per layer; geometry is nested Arrow list columns so the
flat coordinate buffers are zero-copy numpy views (the list offsets play
the role of the reference ArcCollection's nn/ii pair,
src/paths/mapshaper-arcs.js:39-56):

polygon layer   rings_x:list<list<f64>>  rings_y:list<list<f64>>
                ring_poly:list<i32>   (polygon index of each ring within
                                       the feature; rings of one polygon
                                       are contiguous, first = outer —
                                       GeoJSON MultiPolygon nesting)
polyline layer  part_x:list<list<f64>>  part_y:list<list<f64>>
point layer     px:list<f64>  py:list<f64>        (MultiPoint-capable)

plus ``feature_id:int64`` and arbitrary attribute columns (the
reference's DataTable, src/data/mapshaper-data-table.js:3-30 — here a
declared Arrow schema instead of inferred-per-scan).  Null geometry =
empty lists (kept to preserve record alignment, like
src/commands/mapshaper-dissolve.js:36-41).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

GEOM_POLYGON = "polygon"
GEOM_POLYLINE = "polyline"
GEOM_POINT = "point"

RINGS_SCHEMA = {
    "rings_x": pa.list_(pa.list_(pa.float64())),
    "rings_y": pa.list_(pa.list_(pa.float64())),
    "ring_poly": pa.list_(pa.int32()),
}
PARTS_SCHEMA = {
    "part_x": pa.list_(pa.list_(pa.float64())),
    "part_y": pa.list_(pa.list_(pa.float64())),
}
POINTS_SCHEMA = {
    "px": pa.list_(pa.float64()),
    "py": pa.list_(pa.float64()),
}

GEOM_COLS = {
    GEOM_POLYGON: list(RINGS_SCHEMA),
    GEOM_POLYLINE: list(PARTS_SCHEMA),
    GEOM_POINT: list(POINTS_SCHEMA),
}


def clean_export_ring(x, y):
    """Reference export-time path cleanup for one polygon ring
    (internal.exportPathData + exportPathCoords,
    src/paths/mapshaper-path-export.js:24-81): drop consecutive
    duplicate vertices, then drop the ring entirely unless it still has
    >3 points and nonzero planar area.  Returns (x, y) arrays or None
    if the ring collapsed."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if len(x):
        keep = np.ones(len(x), dtype=bool)
        np.logical_or(x[1:] != x[:-1], y[1:] != y[:-1], out=keep[1:])
        x, y = x[keep], y[keep]
    if len(x) < 4:
        return None
    area = 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
    return None if area == 0 else (x, y)


def clean_export_part(x, y):
    """Polyline variant of the export cleanup: dedup consecutive
    vertices; paths with fewer than 2 points are dropped (returns
    None)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if len(x):
        keep = np.ones(len(x), dtype=bool)
        np.logical_or(x[1:] != x[:-1], y[1:] != y[:-1], out=keep[1:])
        x, y = x[keep], y[keep]
    return None if len(x) < 2 else (x, y)


def ordered_pandas(ds):
    """Collect a Dataset to pandas with PLAN-order rows guaranteed.

    Ray's streaming executor runs with ``preserve_order=False`` by
    default, so ``to_pandas()`` may concatenate blocks in COMPLETION
    order — observed ~1/150 on a 2-block CSV read under load.  The
    reference preserves input feature order through every command, so
    single-file sinks (and anything else whose output order is part of
    its contract) must collect through here."""
    ds.context.execution_options.preserve_order = True
    return ds.to_pandas()


def geom_type_of(table_or_names) -> str | None:
    names = (table_or_names if isinstance(table_or_names, (list, set))
             else table_or_names.column_names)
    for gt, cols in GEOM_COLS.items():
        if all(c in names for c in cols):
            return gt
    return None


def iter_ring_lists(batch: pa.Table):
    """Yield (list_of_x_arrays, list_of_y_arrays, ring_poly) per polygon
    feature — numpy views over the flat Arrow buffers."""
    rx, ry = batch["rings_x"], batch["rings_y"]
    rp = batch["ring_poly"]
    for i in range(len(batch)):
        xs = [np.asarray(a, dtype=np.float64) for a in rx[i].as_py()] \
            if rx[i].is_valid else []
        ys = [np.asarray(a, dtype=np.float64) for a in ry[i].as_py()] \
            if ry[i].is_valid else []
        poly = np.asarray(rp[i].as_py() or [], dtype=np.int32) \
            if rp[i].is_valid else np.empty(0, np.int32)
        yield xs, ys, poly


def feature_rings(row_rx, row_ry):
    """Per-feature ring coordinate lists from already-materialized python
    lists (parse-side helper)."""
    return ([np.asarray(r, dtype=np.float64) for r in (row_rx or [])],
            [np.asarray(r, dtype=np.float64) for r in (row_ry or [])])


_GEOM_SCHEMAS = {**RINGS_SCHEMA, **PARTS_SCHEMA, **POINTS_SCHEMA}


def _listify(v, depth):
    """Nested numpy-object arrays (or Ray TensorArrayElement wrappers)
    → plain nested lists (depth 1 or 2)."""
    if v is None:
        return None
    if not isinstance(v, (list, tuple)):
        v = np.asarray(v)          # unwraps TensorArrayElement too
    if depth == 1:
        return [None if x is None else float(x) for x in v]
    return [None if r is None else
            [float(x) for x in np.asarray(r)] for r in v]


def to_arrow_safe(batch) -> pa.Table:
    """pandas block → pa.Table, tolerant of the ragged numpy-object
    geometry columns a pandas stage leaves behind (Arrow→pandas turns
    ``list<list<f64>>`` into object ndarrays of ndarrays, which Ray's
    tensor-extension conversion rejects with ArrowNotImplementedError).
    Geometry columns re-type against the layer schemas; other columns
    convert via plain pylists.  Arrow blocks pass through zero-copy."""
    if isinstance(batch, pa.Table):
        return batch
    cols, names = [], []
    for c in batch.columns:
        v = batch[c]
        names.append(c)
        if c in _GEOM_SCHEMAS:
            typ = _GEOM_SCHEMAS[c]
            depth = 2 if c in RINGS_SCHEMA or c in PARTS_SCHEMA else 1
            if c == "ring_poly":
                cols.append(pa.array(
                    [None if x is None else
                     [int(i) for i in np.asarray(x)] for x in v],
                    type=typ))
            else:
                cols.append(pa.array([_listify(x, depth) for x in v],
                                     type=typ))
        else:
            # from_pandas=True maps NaN/NaT to Arrow null (tolist()
            # keeps float('nan'), which write_geojson would emit as a
            # bare NaN token — invalid JSON — and which crashes
            # pa.array on mixed string/NaN join-miss columns)
            cols.append(pa.array(v, from_pandas=True))
    return pa.Table.from_arrays(cols, names=names)


def polygon_table(feature_ids, rings_x, rings_y, ring_poly, attrs=None):
    cols = {
        "feature_id": pa.array(feature_ids, type=pa.int64()),
        "rings_x": pa.array(rings_x, type=RINGS_SCHEMA["rings_x"]),
        "rings_y": pa.array(rings_y, type=RINGS_SCHEMA["rings_y"]),
        "ring_poly": pa.array(ring_poly, type=RINGS_SCHEMA["ring_poly"]),
    }
    for name, vals in (attrs or {}).items():
        cols[name] = vals if isinstance(vals, (pa.Array, pa.ChunkedArray)) \
            else pa.array(vals)
    return pa.table(cols)


def polyline_table(feature_ids, part_x, part_y, attrs=None):
    cols = {
        "feature_id": pa.array(feature_ids, type=pa.int64()),
        "part_x": pa.array(part_x, type=PARTS_SCHEMA["part_x"]),
        "part_y": pa.array(part_y, type=PARTS_SCHEMA["part_y"]),
    }
    for name, vals in (attrs or {}).items():
        cols[name] = vals if isinstance(vals, (pa.Array, pa.ChunkedArray)) \
            else pa.array(vals)
    return pa.table(cols)


def point_table(feature_ids, px, py, attrs=None):
    cols = {
        "feature_id": pa.array(feature_ids, type=pa.int64()),
        "px": pa.array(px, type=POINTS_SCHEMA["px"]),
        "py": pa.array(py, type=POINTS_SCHEMA["py"]),
    }
    for name, vals in (attrs or {}).items():
        cols[name] = vals if isinstance(vals, (pa.Array, pa.ChunkedArray)) \
            else pa.array(vals)
    return pa.table(cols)


def nz(v):
    """None-safe sequence coercion.  NEVER write ``v or []`` on a value
    that may be a numpy array: ``array([0])`` is falsy (bool of its one
    element) and a longer array raises — both bit this codebase."""
    if v is None:
        return []
    return list(v)
