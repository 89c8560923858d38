"""Projection stage — the -proj command surface (SURVEY.md §2.2 row
-proj; reference: src/commands/mapshaper-proj.js:8 via proj4-compatible
mproj, aliases at src/geom/mapshaper-projections.js:4-9).

No proj library ships in this container, so the common aliases are
implemented directly from the public spherical formulas as vectorized
numpy kernels; anything else raises with the alias list.  The Ray shape
is the interesting part: a stateless map_batches over flat lon/lat
columns, or over layer-model ring columns — at 100 TB a pyproj-backed
``Transformer`` would live in an actor pool ``__init__`` with the same
call signature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

R = 6378137.0  # spherical web-mercator radius (EPSG:3857)
MAX_LAT = 85.051128779806604  # atan(sinh(pi)) in degrees


def webmercator_fwd(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    x = R * np.deg2rad(lon)
    y = R * np.log(np.tan(np.pi / 4 + np.deg2rad(lat) / 2))
    return x, y


def webmercator_inv(x, y):
    lon = np.rad2deg(np.asarray(x, dtype=np.float64) / R)
    lat = np.rad2deg(2 * np.arctan(np.exp(np.asarray(y, dtype=np.float64)
                                          / R)) - np.pi / 2)
    return lon, lat


def mercator_fwd(lon, lat):  # spherical, unit radius scaled by R
    return webmercator_fwd(lon, lat)


def albers_fwd(lon, lat, lat1=29.5, lat2=45.5, lat0=37.5, lon0=-96.0):
    """Spherical Albers equal-area conic (the reference's albersusa
    alias family, continental params)."""
    lon = np.deg2rad(np.asarray(lon, dtype=np.float64))
    lat = np.deg2rad(np.asarray(lat, dtype=np.float64))
    p1, p2 = np.deg2rad(lat1), np.deg2rad(lat2)
    p0, l0 = np.deg2rad(lat0), np.deg2rad(lon0)
    n = (np.sin(p1) + np.sin(p2)) / 2
    c = np.cos(p1) ** 2 + 2 * n * np.sin(p1)
    rho = R * np.sqrt(np.maximum(c - 2 * n * np.sin(lat), 0)) / n
    rho0 = R * np.sqrt(max(c - 2 * n * np.sin(p0), 0)) / n
    th = n * (lon - l0)
    return rho * np.sin(th), rho0 - rho * np.cos(th)


PROJECTIONS = {
    "webmercator": (webmercator_fwd, webmercator_inv),
    "merc": (mercator_fwd, webmercator_inv),
    "albers": (albers_fwd, None),
    "wgs84": (lambda lon, lat: (np.asarray(lon, float),
                                np.asarray(lat, float)), None),
}


def project_points(ds, proj="webmercator", lon_col="lon", lat_col="lat",
                   x_col="x", y_col="y"):
    """Flat lon/lat columns → projected x/y columns (zero-copy Arrow)."""
    if proj not in PROJECTIONS:
        raise ValueError(f"unknown projection {proj!r}; "
                         f"available: {sorted(PROJECTIONS)}")
    fwd = PROJECTIONS[proj][0]

    def go(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        x, y = fwd(lon, lat)
        batch = batch.append_column(x_col, pa.array(x, type=pa.float64()))
        return batch.append_column(y_col, pa.array(y, type=pa.float64()))
    return ds.map_batches(go, batch_format="pyarrow")


def project_layer(ds, proj="webmercator"):
    """Layer-model Dataset (rings/parts/points) → projected coordinates,
    same schema (the -proj in-place semantics)."""
    if proj not in PROJECTIONS:
        raise ValueError(f"unknown projection {proj!r}")
    fwd = PROJECTIONS[proj][0]
    from ..ops.features import _map_coords
    return _map_coords(ds, lambda x, y: fwd(x, y)[0],
                       lambda x, y: fwd(x, y)[1])
