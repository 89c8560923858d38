"""Synthetic polygon layers (deterministic; no external data).

``make_regions`` builds the broadcast polygon side of the flagship
spatial join: an 8x4 grid of diamond polygons (one per 45-degree cell,
radius chosen so no geocoded point can land exactly on an edge).  The
diamond containment rule ``|dx|/r + |dy|/r <= 1`` is expressible in ANSI
SQL, giving the driver's DuckDB oracle an independent formulation to
check the engine's ray-crossing PIP against.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .state.path_index import PathIndex

GRID_COLS = 8
GRID_ROWS = 4
CELL_DEG = 45.0
RADIUS = 19.9997134  # not a sum of two 1e-4 multiples -> no exact edge hits


def region_centers():
    out = []
    for i in range(GRID_COLS):
        for j in range(GRID_ROWS):
            out.append((i * GRID_ROWS + j,
                        -180.0 + (i + 0.5) * CELL_DEG,
                        -90.0 + (j + 0.5) * CELL_DEG))
    return out


def diamond(cx, cy, r=RADIUS):
    return np.array([[cx + r, cy], [cx, cy + r], [cx - r, cy],
                     [cx, cy - r], [cx + r, cy]], dtype=np.float64)


def make_regions():
    """Returns (features, attrs): features = per-region ring list for
    PathIndex/topology; attrs = small pandas table broadcast with the
    index."""
    feats = []
    rows = []
    for rid, cx, cy in region_centers():
        feats.append([diamond(cx, cy)])
        rows.append({"region_id": rid,
                     "region_name": f"region_{rid:02d}",
                     "center_lon": cx, "center_lat": cy})
    return feats, pd.DataFrame(rows)


def build_region_index() -> PathIndex:
    feats, _ = make_regions()
    return PathIndex.from_features(feats)


def region_oracle_sql_case(lon_expr: str, lat_expr: str) -> str:
    """SQL expression computing the same region_id (-1 if none) as the
    PIP join, via the diamond inequality on the point's own grid cell."""
    i = f"LEAST(GREATEST(CAST(FLOOR(({lon_expr} + 180.0) / 45.0) AS BIGINT), 0), 7)"
    j = f"LEAST(GREATEST(CAST(FLOOR(({lat_expr} + 90.0) / 45.0) AS BIGINT), 0), 3)"
    cx = f"(-180.0 + ({i} + 0.5) * 45.0)"
    cy = f"(-90.0 + ({j} + 0.5) * 45.0)"
    inside = (f"(ABS({lon_expr} - {cx}) / {RADIUS!r} + "
              f"ABS({lat_expr} - {cy}) / {RADIUS!r}) <= 1.0")
    return f"CASE WHEN {inside} THEN {i} * 4 + {j} ELSE -1 END"
