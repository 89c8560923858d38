"""Vertex snapping + coordinate dedup (SURVEY.md §2.2 snap rows).

``snap_coords_by_interval`` is an exact port of the reference sweep
(src/paths/mapshaper-snapping.js:31-64): vertices sorted by x; each
vertex pulls every later vertex within ``dist`` onto itself (first-seen
wins — order matters and is preserved).  ``dedup_arc_coords`` removes
NaN / consecutive-duplicate vertices
(src/paths/mapshaper-arcs.js:337-355,649-669).

Distributed shape: snap distance ≪ cell size, so per-cell partitions
sort+sweep independently and only a boundary band (width = snap dist)
needs a halo exchange — ``snap_points_ds`` implements the cell variant
for point tables; the arc variant runs per topology partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .arcs import ArcTable


def snap_coords_by_interval(xx, yy, snap_dist: float) -> int:
    """In-place snap; returns number of snapped vertices (reference
    sweep semantics: stable x-sort, earlier point wins)."""
    xx = np.asarray(xx)
    yy = np.asarray(yy)
    ids = np.argsort(xx, kind="stable")
    n = len(ids)
    count = 0
    lim2 = snap_dist * snap_dist
    for i in range(n):
        x = xx[ids[i]]
        y = yy[ids[i]]
        j = i
        while True:
            j += 1
            if j >= n:
                break
            id2 = ids[j]
            dx = xx[id2] - x
            if dx > snap_dist:
                break
            dy = yy[id2] - y
            if (dx == 0 and dy == 0) or dx * dx + dy * dy > lim2:
                continue
            xx[id2] = x
            yy[id2] = y
            count += 1
    return count


def snap_arcs(arcs: ArcTable, snap_dist: float) -> int:
    return snap_coords_by_interval(arcs.xx, arcs.yy, snap_dist)


def dedup_arc_coords(arcs: ArcTable) -> ArcTable:
    """Drop NaN and consecutive duplicate vertices per arc; arcs
    collapsing below 2 points keep their 2 endpoints (reference keeps
    defective arcs for later cleanShapes)."""
    out = []
    for a in range(len(arcs.nn)):
        i0 = arcs.ii[a]
        n = arcs.nn[a]
        xs = arcs.xx[i0:i0 + n]
        ys = arcs.yy[i0:i0 + n]
        ok = ~(np.isnan(xs) | np.isnan(ys))
        xs, ys = xs[ok], ys[ok]
        if len(xs) == 0:
            out.append(np.zeros((2, 2)))
            continue
        keep = np.ones(len(xs), dtype=bool)
        keep[1:] = (xs[1:] != xs[:-1]) | (ys[1:] != ys[:-1])
        xs, ys = xs[keep], ys[keep]
        if len(xs) < 2:
            xs = np.repeat(xs[:1], 2)
            ys = np.repeat(ys[:1], 2)
        out.append(np.stack([xs, ys], axis=1))
    return ArcTable.from_coord_lists(out)


def snap_points_ds(ds, snap_dist: float, x_col="lon", y_col="lat",
                   cell_factor: float = 1000.0):
    """Distributed point snapping: shuffle by cell (side = snap_dist *
    cell_factor), per-cell stable sweep.  Points in different cells are
    farther apart than snap_dist except in the boundary band; with
    snap_dist ≪ cell size the approximation error is confined to the
    band (documented partitioning assumption, SURVEY.md §2.2 snap row)."""
    cell = snap_dist * cell_factor

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__cell"] = (np.floor(df[x_col] / cell).astype(np.int64) *
                        np.int64(0x9E3779B1) +
                        np.floor(df[y_col] / cell).astype(np.int64))
        return df

    def per_cell(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("__order") if "__order" in df.columns else df
        xs = df[x_col].to_numpy().copy()
        ys = df[y_col].to_numpy().copy()
        snap_coords_by_interval(xs, ys, snap_dist)
        df = df.copy()
        df[x_col] = xs
        df[y_col] = ys
        return df.drop(columns=["__cell"])

    return ds.map_batches(tag, batch_format="pandas") \
             .groupby("__cell").map_groups(per_cell, batch_format="pandas")
