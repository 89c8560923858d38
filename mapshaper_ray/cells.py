"""Deterministic quadkey cell scheme (H3/S2 stand-in, public algorithm).

Cells are the engine's partitioning key for all spatial shuffles
(SURVEY.md §7.3): tile assignment, spatial-join locality, hot-cell
salting.  A level-L quadkey is the classic Bing-maps digit string of
z-interleaved bits over an equirectangular mapping of (lon, lat); a
prefix of length k IS the ancestor cell at level k, so "groupby on cell
prefix" (north rule) is a string-slice + groupby.

Generalizes the reference's -split-on-grid r{row}c{col} cells
(src/commands/mapshaper-split-on-grid.js:6-62) to a hierarchical scheme.
All functions are stateless and vectorized (numpy) — cell assignment runs
in plain ``map_batches``.
"""

from __future__ import annotations

import numpy as np

_DIGITS = np.array([ord("0"), ord("1"), ord("2"), ord("3")], dtype=np.uint8)


def lonlat_to_cellxy(lon, lat, level: int):
    """Integer cell coords (x east, y north->south) at a zoom level."""
    n = 1 << level
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = np.clip(((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    y = np.clip(((90.0 - lat) / 180.0 * n).astype(np.int64), 0, n - 1)
    return x, y


def cellxy_to_quadkey(x, y, level: int):
    """Vectorized quadkey digit strings of length ``level``."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    m = len(x)
    buf = np.empty((m, level), dtype=np.uint8)
    for i in range(level):
        shift = level - 1 - i
        digit = (((y >> shift) & 1) << 1) | ((x >> shift) & 1)
        buf[:, i] = _DIGITS[digit]
    return buf.view(f"S{level}").ravel().astype(str)


def lonlat_to_quadkey(lon, lat, level: int):
    x, y = lonlat_to_cellxy(lon, lat, level)
    return cellxy_to_quadkey(x, y, level)


def lonlat_to_cell_id(lon, lat, level: int):
    """uint64 z-order cell id (level packed in high bits not needed — one
    level per pipeline stage)."""
    x, y = lonlat_to_cellxy(lon, lat, level)
    return _interleave_bits(x.astype(np.uint64), y.astype(np.uint64), level)


def _interleave_bits(x, y, level):
    z = np.zeros_like(x)
    for i in range(level):
        z |= ((x >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i)
        z |= ((y >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i + 1)
    return z


def quadkey_prefix(quadkeys, k: int):
    """Ancestor cell at level k (string slice, vectorized via numpy)."""
    arr = np.asarray(quadkeys, dtype=str)
    return arr.astype(f"U{k}")


def cell_bounds(quadkey: str):
    """(lon_min, lat_min, lon_max, lat_max) of one quadkey cell."""
    x = y = 0
    for ch in quadkey:
        d = int(ch)
        x = (x << 1) | (d & 1)
        y = (y << 1) | (d >> 1)
    level = len(quadkey)
    n = 1 << level
    lon0 = x / n * 360.0 - 180.0
    lon1 = (x + 1) / n * 360.0 - 180.0
    lat1 = 90.0 - y / n * 180.0
    lat0 = 90.0 - (y + 1) / n * 180.0
    return (lon0, lat0, lon1, lat1)


def cover_bbox(xmin, ymin, xmax, ymax, level: int):
    """All quadkeys at ``level`` whose cells intersect a lon/lat bbox —
    the polygon cell-cover primitive (bbox pass; PIP refinement happens
    against the real rings)."""
    n = 1 << level
    x0 = int(np.clip((xmin + 180.0) / 360.0 * n, 0, n - 1))
    x1 = int(np.clip((xmax + 180.0) / 360.0 * n, 0, n - 1))
    y0 = int(np.clip((90.0 - ymax) / 180.0 * n, 0, n - 1))
    y1 = int(np.clip((90.0 - ymin) / 180.0 * n, 0, n - 1))
    xs, ys = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
    return cellxy_to_quadkey(xs.ravel(), ys.ravel(), level)


# --------------------------------------------------------------------------
# Hexagonal cells (H3-style stand-in, public axial/cube-round math —
# Patel's hex-grid formulation): pointy-top hexes over the same
# equirectangular mapping the quadkeys use.  Hex bins are the density
# aggregation quadkeys can't express (equal-area-ish neighborhoods,
# 3-neighbor symmetry); assignment is stateless vectorized arithmetic
# so it runs in plain map_batches and a SQL mirror can reproduce the
# exact same cells.
# --------------------------------------------------------------------------

_SQRT3 = 1.7320508075688772


def _round_half_up(v: np.ndarray) -> np.ndarray:
    """floor(v + 0.5) — used instead of banker's rounding so a SQL
    floor(v + 0.5) mirror rounds identically on every input."""
    return np.floor(v + 0.5)


def lonlat_to_hex(lon, lat, size_deg: float):
    """Axial (q, r) hex cell of each point: pointy-top hexes of
    circumradius ``size_deg`` degrees on the equirectangular plane.
    Cube-rounding resolves the fractional axial coords to the nearest
    hex center exactly (the classic restore-x+y+z=0 fixup)."""
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    # division forms (y / 3, not y * (1/3)): the SQL mirror writes
    # lat/3, and the two differ in the last ulp for some inputs
    qf = (_SQRT3 / 3.0 * x - y / 3.0) / size_deg
    rf = (2.0 * y / 3.0) / size_deg
    xf = qf
    zf = rf
    yf = -xf - zf
    rx = _round_half_up(xf)
    ry = _round_half_up(yf)
    rz = _round_half_up(zf)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    # restore x + y + z = 0 by re-deriving the coordinate that moved
    # farthest (ties broken in x > y > z priority order, mirrored by
    # the SQL CASE chain)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def hex_center(hq, hr, size_deg: float):
    """Inverse of lonlat_to_hex at cell centers: (lon, lat) of each
    axial (q, r) hex center."""
    hq = np.asarray(hq, dtype=np.float64)
    hr = np.asarray(hr, dtype=np.float64)
    lat = 1.5 * size_deg * hr
    lon = _SQRT3 * size_deg * (hq + hr / 2.0)
    return lon, lat
