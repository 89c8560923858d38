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


def albers_inv(x, y, lat1=29.5, lat2=45.5, lat0=37.5, lon0=-96.0):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    p1, p2 = np.deg2rad(lat1), np.deg2rad(lat2)
    p0, l0 = np.deg2rad(lat0), np.deg2rad(lon0)
    n = (np.sin(p1) + np.sin(p2)) / 2
    c = np.cos(p1) ** 2 + 2 * n * np.sin(p1)
    rho0 = R * np.sqrt(max(c - 2 * n * np.sin(p0), 0)) / n
    rho = np.hypot(x, rho0 - y)
    th = np.arctan2(x, rho0 - y)
    lat = np.arcsin((c - (rho * n / R) ** 2) / (2 * n))
    return np.rad2deg(l0 + th / n), np.rad2deg(lat)


def lcc_fwd(lon, lat, lat1=33.0, lat2=45.0, lat0=23.0, lon0=-96.0):
    """Spherical Lambert conformal conic (proj4 lcc family; default
    parallels match proj's +lat_1=33 +lat_2=45 convention)."""
    lon = np.deg2rad(np.asarray(lon, dtype=np.float64))
    lat = np.clip(np.asarray(lat, dtype=np.float64), -89.9, 89.9)
    lat = np.deg2rad(lat)
    p1, p2 = np.deg2rad(lat1), np.deg2rad(lat2)
    p0, l0 = np.deg2rad(lat0), np.deg2rad(lon0)
    if lat1 == lat2:
        n = np.sin(p1)
    else:
        n = np.log(np.cos(p1) / np.cos(p2)) / \
            np.log(np.tan(np.pi / 4 + p2 / 2) / np.tan(np.pi / 4 + p1 / 2))
    F = np.cos(p1) * np.tan(np.pi / 4 + p1 / 2) ** n / n
    rho = R * F / np.tan(np.pi / 4 + lat / 2) ** n
    rho0 = R * F / np.tan(np.pi / 4 + p0 / 2) ** n
    th = n * (lon - l0)
    return rho * np.sin(th), rho0 - rho * np.cos(th)


def lcc_inv(x, y, lat1=33.0, lat2=45.0, lat0=23.0, lon0=-96.0):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    p1, p2 = np.deg2rad(lat1), np.deg2rad(lat2)
    p0, l0 = np.deg2rad(lat0), np.deg2rad(lon0)
    if lat1 == lat2:
        n = np.sin(p1)
    else:
        n = np.log(np.cos(p1) / np.cos(p2)) / \
            np.log(np.tan(np.pi / 4 + p2 / 2) / np.tan(np.pi / 4 + p1 / 2))
    F = np.cos(p1) * np.tan(np.pi / 4 + p1 / 2) ** n / n
    rho0 = R * F / np.tan(np.pi / 4 + p0 / 2) ** n
    sgn = np.sign(n) or 1.0
    rho = sgn * np.hypot(x, rho0 - y)
    th = np.arctan2(sgn * x, sgn * (rho0 - y))
    lat = 2 * np.arctan((R * F / rho) ** (1 / n)) - np.pi / 2
    return np.rad2deg(l0 + th / n), np.rad2deg(lat)


def eqc_fwd(lon, lat, lat_ts=0.0):
    """Equirectangular / plate carrée with standard parallel lat_ts."""
    k = np.cos(np.deg2rad(lat_ts))
    return (R * np.deg2rad(np.asarray(lon, float)) * k,
            R * np.deg2rad(np.asarray(lat, float)))


def eqc_inv(x, y, lat_ts=0.0):
    k = np.cos(np.deg2rad(lat_ts))
    return (np.rad2deg(np.asarray(x, float) / (R * k)),
            np.rad2deg(np.asarray(y, float) / R))


def sinusoidal_fwd(lon, lat, lon0=0.0):
    lat_r = np.deg2rad(np.asarray(lat, float))
    return (R * np.deg2rad(np.asarray(lon, float) - lon0) * np.cos(lat_r),
            R * lat_r)


# Robinson 1974 table (public domain; every 5 deg of |lat|), LINEAR
# interpolation — a deliberate, documented simplification of proj4's
# cubic 'robin' (this engine defines the op; the SQL oracle reproduces
# the same table + interpolation exactly)
ROBINSON_X = np.array([
    1.0000, 0.9986, 0.9954, 0.9900, 0.9822, 0.9730, 0.9600, 0.9427,
    0.9216, 0.8962, 0.8679, 0.8350, 0.7986, 0.7597, 0.7186, 0.6732,
    0.6213, 0.5722, 0.5322])
ROBINSON_Y = np.array([
    0.0000, 0.0620, 0.1240, 0.1860, 0.2480, 0.3100, 0.3720, 0.4340,
    0.4958, 0.5571, 0.6176, 0.6769, 0.7346, 0.7903, 0.8435, 0.8936,
    0.9394, 0.9761, 1.0000])


def robinson_fwd(lon, lat, lon0=0.0):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    alat = np.abs(lat)
    idx = np.minimum((alat / 5.0).astype(np.int64), 17)
    frac = (alat - idx * 5.0) / 5.0
    X = ROBINSON_X[idx] + frac * (ROBINSON_X[idx + 1] - ROBINSON_X[idx])
    Y = ROBINSON_Y[idx] + frac * (ROBINSON_Y[idx + 1] - ROBINSON_Y[idx])
    return (0.8487 * R * X * np.deg2rad(lon - lon0),
            1.3523 * R * Y * np.sign(lat))


def albersusa_fwd(lon, lat):
    """Composite AlbersUSA (the reference's albersusa / AlbersNYT
    alias, a mixed projection with Alaska and Hawaii insets —
    src/geom/mapshaper-mixed-projection.js).  Points inside the AK / HI
    boxes project with their own Albers parameters, then scale+shift
    into inset positions (d3-geo's public albersUsa layout constants);
    everything else uses the continental Albers."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x, y = albers_fwd(lon, lat)
    ak = (lat > 50) & (lon < -128)
    hi = (lat <= 25) & (lat > 15) & (lon < -150)
    if ak.any():
        ax, ay = albers_fwd(lon[ak], lat[ak],
                            lat1=55.0, lat2=65.0, lat0=60.0, lon0=-150.0)
        x[ak] = ax * 0.35 - 2500000.0
        y[ak] = ay * 0.35 - 1500000.0
    if hi.any():
        hx, hy = albers_fwd(lon[hi], lat[hi],
                            lat1=19.0, lat2=21.0, lat0=20.0, lon0=-157.0)
        x[hi] = hx - 1000000.0
        y[hi] = hy - 2000000.0
    return x, y


def _identity(lon, lat):
    return np.asarray(lon, float), np.asarray(lat, float)


# alias index (reference src/geom/mapshaper-projections.js:4-9 plus the
# proj4 family names its tests use)
PROJECTIONS = {
    "webmercator": (webmercator_fwd, webmercator_inv),
    "merc": (mercator_fwd, webmercator_inv),
    "albers": (albers_fwd, albers_inv),
    "albersusa": (albersusa_fwd, None),
    "lcc": (lcc_fwd, lcc_inv),
    "eqc": (eqc_fwd, eqc_inv),
    "sinu": (sinusoidal_fwd, None),
    "sinusoidal": (sinusoidal_fwd, None),
    "robin": (robinson_fwd, None),
    "robinson": (robinson_fwd, None),
    "wgs84": (_identity, _identity),
    "longlat": (_identity, _identity),
}

_PARAM_KEYS = {"lat_1": "lat1", "lat_2": "lat2", "lat_0": "lat0",
               "lon_0": "lon0", "lat_ts": "lat_ts"}


def resolve_projection(defn: str):
    """Alias or proj4-style string → (fwd, inv) callables with bound
    parameters (the reference getProjDefn surface: alias index first,
    then bare proj names, then '+proj=...' strings —
    src/geom/mapshaper-projections.js:52-63)."""
    import functools
    defn = defn.strip()
    if defn in PROJECTIONS:
        return PROJECTIONS[defn]
    if defn.startswith("+"):
        parts = dict(p.split("=", 1) if "=" in p else (p, "")
                     for p in defn.replace("+", " ").split())
        name = parts.get("proj", "")
        if name not in PROJECTIONS:
            raise ValueError(f"unsupported +proj={name!r}; "
                             f"available: {sorted(PROJECTIONS)}")
        kw = {dst: float(parts[src]) for src, dst in _PARAM_KEYS.items()
              if src in parts}
        fwd, inv = PROJECTIONS[name]
        bfwd = functools.partial(fwd, **kw) if kw and fwd else fwd
        binv = functools.partial(inv, **kw) if kw and inv else inv
        return bfwd, binv
    raise ValueError(f"unknown projection {defn!r}; "
                     f"available: {sorted(PROJECTIONS)}")


def _compose(proj, from_proj):
    """fwd(lon,lat) for to-CRS, optionally preceded by inverse of the
    source CRS (the -proj from= option; match= callers pass the other
    layer's recorded CRS string here)."""
    fwd, _ = resolve_projection(proj)
    if fwd is None:
        raise ValueError(f"projection {proj!r} has no forward transform")
    if from_proj is None or from_proj in ("wgs84", "longlat"):
        return fwd
    _, inv = resolve_projection(from_proj)
    if inv is None:
        raise ValueError(f"projection {from_proj!r} has no inverse; "
                         "cannot use as from=")

    def composed(x, y):
        lon, lat = inv(x, y)
        return fwd(lon, lat)
    return composed


def project_points(ds, proj="webmercator", lon_col="lon", lat_col="lat",
                   x_col="x", y_col="y", from_proj=None):
    """Flat lon/lat columns → projected x/y columns (zero-copy Arrow).
    ``from_proj`` reprojects source coordinates that are not lon/lat
    (the -proj from= / match= surface)."""
    fwd = _compose(proj, from_proj)

    def go(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        x, y = fwd(lon, lat)
        batch = batch.append_column(x_col, pa.array(x, type=pa.float64()))
        return batch.append_column(y_col, pa.array(y, type=pa.float64()))
    return ds.map_batches(go, batch_format="pyarrow")


def project_layer(ds, proj="webmercator", from_proj=None):
    """Layer-model Dataset (rings/parts/points) → projected coordinates,
    same schema (the -proj in-place semantics)."""
    fwd = _compose(proj, from_proj)
    from ..ops.features import _map_coords
    return _map_coords(ds, lambda x, y: fwd(x, y)[0],
                       lambda x, y: fwd(x, y)[1])
