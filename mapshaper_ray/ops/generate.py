"""Layer generators: -point-grid / -polygon-grid / -rectangle /
-graticule / -shape (SURVEY.md §2.2 rows; reference
src/commands/mapshaper-point-grid.js:3,8, mapshaper-shape.js:39,
mapshaper-graticule.js:7-50).

Grid generation is sharded: ``ray.data.range(n_cells)`` → map_batches
synthesize, so a billion-cell grid never materializes on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def point_grid(cols: int, rows: int, bbox=(-180, -90, 180, 90)):
    """Regular point grid over bbox — points at cell centers (reference
    point-grid placement)."""
    import ray.data as rd
    xmin, ymin, xmax, ymax = bbox
    dx = (xmax - xmin) / cols
    dy = (ymax - ymin) / rows

    def make(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["id"].to_numpy()
        r, c = np.divmod(ids, cols)
        return pd.DataFrame({
            "feature_id": ids,
            "px": [[v] for v in (xmin + (c + 0.5) * dx)],
            "py": [[v] for v in (ymin + (r + 0.5) * dy)],
            "row": r, "col": c,
        })
    return rd.range(cols * rows).map_batches(make, batch_format="pandas")


def polygon_grid(cols: int, rows: int, bbox=(-180, -90, 180, 90)):
    """Regular cell-polygon grid over bbox."""
    import ray.data as rd
    xmin, ymin, xmax, ymax = bbox
    dx = (xmax - xmin) / cols
    dy = (ymax - ymin) / rows

    def make(df: pd.DataFrame) -> pd.DataFrame:
        rows_out = []
        for i in df["id"].to_numpy():
            r, c = divmod(int(i), cols)
            x0 = xmin + c * dx
            y0 = ymin + r * dy
            rows_out.append({
                "feature_id": int(i), "row": r, "col": c,
                "rings_x": [[x0, x0 + dx, x0 + dx, x0, x0]],
                "rings_y": [[y0, y0, y0 + dy, y0 + dy, y0]],
                "ring_poly": [0],
            })
        return pd.DataFrame(rows_out)
    return rd.range(cols * rows).map_batches(make, batch_format="pandas")


def rectangle(bbox, feature_id=0, attrs=None):
    """-rectangle: single closed-rect polygon layer."""
    import ray.data as rd
    xmin, ymin, xmax, ymax = bbox
    # vertex order matches the reference's convertBboxToGeoJSON
    # (src/commands/mapshaper-shape.js:65): (xmin,ymin) up-first, CCW
    row = {"feature_id": feature_id,
           "rings_x": [[xmin, xmin, xmax, xmax, xmin]],
           "rings_y": [[ymin, ymax, ymax, ymin, ymin]],
           "ring_poly": [0], **(attrs or {})}
    return rd.from_items([row])


def graticule(interval=10.0, bbox=(-180, -90, 180, 90), step=1.0,
              major_step=90.0):
    """-graticule: meridian/parallel polyline layer, ported from the
    reference's createGraticule (src/commands/mapshaper-graticule.js:
    21-77): meridians every ``interval`` degrees and parallels every
    ``interval`` degrees, each densified every ``step`` degrees;
    meridians NOT on a ``major_step`` multiple stop ``interval`` short
    of the poles.  Properties are ``type``/``value`` like the
    reference."""
    import ray.data as rd
    xmin, ymin, xmax, ymax = bbox
    rows = []
    fid = 0

    def walk(lo, hi):
        # reference loop: lo, lo+step, ... < hi, then hi appended
        vals = []
        v = lo
        while v < hi:
            vals.append(float(v))
            v += step
        vals.append(float(hi))
        return vals

    for lon in np.arange(xmin, xmax + 1e-9, interval):
        lon = float(lon)
        lo, hi = ymin, ymax
        if major_step and lon % major_step != 0:
            lo, hi = ymin + interval, ymax - interval
        ys = walk(lo, hi)
        rows.append({"feature_id": fid, "type": "meridian",
                     "value": lon,
                     "part_x": [[lon] * len(ys)], "part_y": [ys]})
        fid += 1
    for lat in np.arange(ymin, ymax + 1e-9, interval):
        lat = float(lat)
        xs = walk(xmin, xmax)
        rows.append({"feature_id": fid, "type": "parallel",
                     "value": lat,
                     "part_x": [xs], "part_y": [[lat] * len(xs)]})
        fid += 1
    return rd.from_items(rows)


def points_from_columns(ds, x_col: str, y_col: str):
    """-points x= y= : build point geometry from attribute columns
    (src/commands/mapshaper-points.js:168)."""
    def go(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["px"] = [[float(v)] if pd.notna(v) else [] for v in df[x_col]]
        df["py"] = [[float(v)] if pd.notna(v) else [] for v in df[y_col]]
        return df
    return ds.map_batches(go, batch_format="pandas")


# ---------------------------------------------------------------------------
# -points vertices / endpoints / interpolated
# (reference src/commands/mapshaper-points.js:42-166)

def _feature_paths(row):
    """Ring or part coordinate arrays of one layer-model row."""
    from ..sources.layers import nz
    if "part_x" in row:
        xs, ys = row["part_x"], row["part_y"]
    else:
        xs, ys = row["rings_x"], row["rings_y"]
    return ([np.asarray(v, dtype=np.float64) for v in nz(xs)],
            [np.asarray(v, dtype=np.float64) for v in nz(ys)])


def _dedup_keep_first(px, py):
    """First-occurrence dedup of exact (x, y) pairs, vectorized
    (mirrors the reference's string-key index, pointsFromVertices)."""
    pts = np.stack([px, py], axis=1)
    view = pts.view([("x", np.float64), ("y", np.float64)]).ravel()
    _, first = np.unique(view, return_index=True)
    keep = np.sort(first)
    return px[keep], py[keep]


def points_vertices(ds):
    """-points vertices: every path vertex of each feature, deduped by
    exact coordinates (src/commands/mapshaper-points.js:96-122)."""
    def go(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for row in df.to_dict("records"):
            xs, ys = _feature_paths(row)
            if not xs:
                continue
            px = np.concatenate(xs)
            py = np.concatenate(ys)
            px, py = _dedup_keep_first(px, py)
            out = {c: row[c] for c in df.columns
                   if c not in ("rings_x", "rings_y", "ring_poly",
                                "part_x", "part_y")}
            out["px"] = px.tolist()
            out["py"] = py.tolist()
            rows.append(out)
        return pd.DataFrame(rows)
    return ds.map_batches(go, batch_format="pandas")


def points_endpoints(ds):
    """-points endpoints: first/last vertex of each part, deduped
    (src/commands/mapshaper-points.js:124-149)."""
    def go(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for row in df.to_dict("records"):
            xs, ys = _feature_paths(row)
            if not xs:
                continue
            px = np.array([v for x in xs for v in (x[0], x[-1])])
            py = np.array([v for y in ys for v in (y[0], y[-1])])
            px, py = _dedup_keep_first(px, py)
            out = {c: row[c] for c in df.columns
                   if c not in ("rings_x", "rings_y", "ring_poly",
                                "part_x", "part_y")}
            out["px"] = px.tolist()
            out["py"] = py.tolist()
            rows.append(out)
        return pd.DataFrame(rows)
    return ds.map_batches(go, batch_format="pandas")


def _interp_part(x, y, interval):
    """Sequential interval walk of one part — exact port of
    interpolatePointsAlongArc (src/commands/mapshaper-points.js:46-77):
    emit the start vertex, a point every ``interval`` along the line
    (resetting from each emitted point), and the final vertex when
    leftover distance remains."""
    import math

    def dist2d(ax, ay, bx, by):
        # the reference's distance2D is sqrt(dx*dx + dy*dy) — NOT
        # hypot, whose extra-precision rounding differs in the last ulp
        dx = bx - ax
        dy = by - ay
        return math.sqrt(dx * dx + dy * dy)

    px, py = [float(x[0])], [float(y[0])]
    prev_x, prev_y = float(x[0]), float(y[0])
    elapsed = 0.0
    for i in range(1, len(x)):
        cx, cy = float(x[i]), float(y[i])
        seg = dist2d(prev_x, prev_y, cx, cy)
        while elapsed + seg >= interval:
            k = (interval - elapsed) / seg
            j = 1 - k
            nx = prev_x * j + cx * k
            ny = prev_y * j + cy * k
            elapsed = 0.0
            px.append(nx)
            py.append(ny)
            prev_x, prev_y = nx, ny
            seg = dist2d(prev_x, prev_y, cx, cy)
        elapsed += seg
        prev_x, prev_y = cx, cy
    if elapsed > 0:
        px.append(prev_x)
        py.append(prev_y)
    return px, py


def points_interpolated(ds, interval: float):
    """-points interpolated over a polyline layer
    (src/commands/mapshaper-points.js:79-94).  Like the reference,
    non-polyline input is an error."""
    if not interval > 0:
        raise ValueError(f"invalid interpolation interval: {interval}")
    if "part_x" not in ds.schema().names:
        raise ValueError("Expected a polyline layer")

    def go(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for row in df.to_dict("records"):
            xs, ys = _feature_paths(row)
            if not xs:
                continue
            px: list = []
            py: list = []
            for x, y in zip(xs, ys):
                ax, ay = _interp_part(x, y, interval)
                px.extend(ax)
                py.extend(ay)
            out = {c: row[c] for c in df.columns
                   if c not in ("part_x", "part_y")}
            out["px"] = px
            out["py"] = py
            rows.append(out)
        return pd.DataFrame(rows)
    return ds.map_batches(go, batch_format="pandas")
