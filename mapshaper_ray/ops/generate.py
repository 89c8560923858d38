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
    row = {"feature_id": feature_id,
           "rings_x": [[xmin, xmax, xmax, xmin, xmin]],
           "rings_y": [[ymin, ymin, ymax, ymax, ymin]],
           "ring_poly": [0], **(attrs or {})}
    return rd.from_items([row])


def graticule(interval=10.0, bbox=(-180, -90, 180, 90), step=1.0):
    """-graticule: meridian/parallel polyline layer at ``interval``
    degrees, densified every ``step`` degrees (reference default 10°)."""
    import ray.data as rd
    xmin, ymin, xmax, ymax = bbox
    rows = []
    fid = 0
    for lon in np.arange(xmin, xmax + 1e-9, interval):
        ys = np.arange(ymin, ymax + 1e-9, step)
        rows.append({"feature_id": fid, "kind": "meridian", "value": float(lon),
                     "part_x": [[float(lon)] * len(ys)],
                     "part_y": [ys.tolist()]})
        fid += 1
    for lat in np.arange(ymin, ymax + 1e-9, interval):
        xs = np.arange(xmin, xmax + 1e-9, step)
        rows.append({"feature_id": fid, "kind": "parallel", "value": float(lat),
                     "part_x": [xs.tolist()],
                     "part_y": [[float(lat)] * len(xs)]})
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
