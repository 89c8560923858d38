"""Projection stage — the -proj command surface (SURVEY.md §2.2 row
-proj; reference: src/commands/mapshaper-proj.js:8 via proj4-compatible
mproj, aliases at src/geom/mapshaper-projections.js:4-9).

No proj library ships in this container, so the reference's alias
families are implemented directly as vectorized numpy kernels — the
conic families (aea/albers, lcc) use the ELLIPSOIDAL WGS84 formulas
ported from mproj (the reference's actual backend), robinson uses the
proj4 float32 cubic table (bit-exact vs the reference CLI), and
albersusa is the exact AlbersNYT mixed projection with AK/HI lcc
frames; anything else raises with the alias list.  The Ray shape
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


# ---------------------------------------------------------------------------
# WGS84 ellipsoid (mproj's default when no +ellps/+datum is given,
# www/modules.js:10562; rf from the ellipsoid table line 10220)
F_WGS84 = 1.0 / 298.257223563
ES = F_WGS84 * (2.0 - F_WGS84)
E = np.sqrt(ES)
ONE_ES = 1.0 - ES


def _qsfn(sinphi):
    """pj_qsfn (mproj www/modules.js:12532)."""
    con = E * sinphi
    return ONE_ES * (sinphi / (1 - con * con) -
                     (0.5 / E) * np.log((1 - con) / (1 + con)))


def _msfn(sinphi, cosphi):
    return cosphi / np.sqrt(1 - ES * sinphi * sinphi)


def _tsfn(phi, sinphi):
    sinphi = sinphi * E
    return (np.tan(0.5 * (np.pi / 2 - phi)) /
            np.power((1 - sinphi) / (1 + sinphi), 0.5 * E))


def _phi2(ts):
    """pj_phi2: inverse of tsfn by iteration."""
    phi = np.pi / 2 - 2 * np.arctan(ts)
    for _ in range(15):
        con = E * np.sin(phi)
        dphi = np.pi / 2 - 2 * np.arctan(
            ts * np.power((1 - con) / (1 + con), 0.5 * E)) - phi
        phi = phi + dphi
        if np.all(np.abs(dphi) <= 1e-10):
            break
    return phi


def _phi1(qs):
    """pj_aea's phi1_: latitude from authalic q by iteration."""
    phi = np.arcsin(0.5 * qs)
    for _ in range(15):
        sinpi = np.sin(phi)
        cospi = np.cos(phi)
        con = E * sinpi
        com = 1 - con * con
        dphi = 0.5 * com * com / cospi * (
            qs / ONE_ES - sinpi / com +
            0.5 / E * np.log((1 - con) / (1 + con)))
        phi = phi + dphi
        if np.all(np.abs(dphi) <= 1e-10):
            break
    return phi


def _aea_setup(lat1, lat2, lat0):
    p1, p2, p0 = np.deg2rad([lat1, lat2, lat0])
    sinphi, cosphi = np.sin(p1), np.cos(p1)
    n = sinphi
    m1 = _msfn(sinphi, cosphi)
    ml1 = _qsfn(sinphi)
    if abs(lat1 - lat2) >= 1e-10:
        s2, c2 = np.sin(p2), np.cos(p2)
        m2 = _msfn(s2, c2)
        ml2 = _qsfn(s2)
        n = (m1 * m1 - m2 * m2) / (ml2 - ml1)
    ec = 1 - 0.5 * ONE_ES * np.log((1 - E) / (1 + E)) / E
    c = m1 * m1 + n * ml1
    dd = 1 / n
    rho0 = dd * np.sqrt(c - n * _qsfn(np.sin(p0)))
    return n, c, dd, rho0, ec


def albers_fwd(lon, lat, lat1=29.5, lat2=45.5, lat0=37.5, lon0=-96.0):
    """Ellipsoidal Albers equal-area conic on WGS84 — pj_aea e_fwd
    (mproj www/modules.js:12554-12610; defaults = the reference's
    AlbersNYT base, src/geom/mapshaper-projections.js:135).  Verified
    1e-12 against the reference CLI running real mproj."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n, c, dd, rho0, _ = _aea_setup(lat1, lat2, lat0)
    lam = np.deg2rad(lon - lon0)
    phi = np.deg2rad(lat)
    rho = dd * np.sqrt(np.maximum(c - n * _qsfn(np.sin(phi)), 0))
    th = lam * n
    return R * rho * np.sin(th), R * (rho0 - rho * np.cos(th))


def albers_inv(x, y, lat1=29.5, lat2=45.5, lat0=37.5, lon0=-96.0):
    x = np.asarray(x, dtype=np.float64) / R
    y = np.asarray(y, dtype=np.float64) / R
    n, c, dd, rho0, ec = _aea_setup(lat1, lat2, lat0)
    yy = rho0 - y
    rho = np.hypot(x, yy)
    if n < 0:
        rho, x, yy = -rho, -x, -yy
    qs = (c - (rho / dd) ** 2) / n
    phi = np.where(np.abs(ec - np.abs(qs)) > 1e-7, _phi1(qs),
                   np.where(qs < 0, -np.pi / 2, np.pi / 2))
    lam = np.arctan2(x, yy) / n
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def _lcc_setup(lat1, lat2, lat0):
    p1, p2, p0 = np.deg2rad([lat1, lat2, lat0])
    sinphi, cosphi = np.sin(p1), np.cos(p1)
    n = sinphi
    m1 = _msfn(sinphi, cosphi)
    ml1 = _tsfn(p1, sinphi)
    if abs(lat1 - lat2) >= 1e-10:
        s2 = np.sin(p2)
        n = np.log(m1 / _msfn(s2, np.cos(p2)))
        n = n / np.log(ml1 / _tsfn(p2, s2))
    c = m1 * np.power(ml1, -n) / n
    rho0 = 0.0 if abs(abs(lat0) - 90) < 1e-10 else \
        c * np.power(_tsfn(p0, np.sin(p0)), n)
    return n, c, rho0


def lcc_fwd(lon, lat, lat1=33.0, lat2=45.0, lat0=23.0, lon0=-96.0):
    """Ellipsoidal Lambert conformal conic on WGS84 — pj_lcc e_fwd
    (mproj www/modules.js:17628-17712)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -89.999999, 89.999999)
    n, c, rho0 = _lcc_setup(lat1, lat2, lat0)
    phi = np.deg2rad(lat)
    rho = c * np.power(_tsfn(phi, np.sin(phi)), n)
    lam = np.deg2rad(lon - lon0) * n
    return R * rho * np.sin(lam), R * (rho0 - rho * np.cos(lam))


def lcc_inv(x, y, lat1=33.0, lat2=45.0, lat0=23.0, lon0=-96.0):
    x = np.asarray(x, dtype=np.float64) / R
    y = np.asarray(y, dtype=np.float64) / R
    n, c, rho0 = _lcc_setup(lat1, lat2, lat0)
    yy = rho0 - y
    rho = np.hypot(x, yy)
    if n < 0:
        rho, x, yy = -rho, -x, -yy
    phi = _phi2(np.power(rho / c, 1.0 / n))
    lam = np.arctan2(x, yy) / n
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


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


# Robinson: proj4 'robin' cubic-coefficient table, stored as FLOAT32
# like mproj does for proj.4 float-compatibility (www/modules.js:
# 19708-19827).  Rows: [c0, c1, c2, c3] per 5-degree node.
_ROBIN_X = np.array([
    [1, 2.2199e-17, -7.15515e-05, 3.1103e-06],
    [0.9986, -0.000482243, -2.4897e-05, -1.3309e-06],
    [0.9954, -0.00083103, -4.48605e-05, -9.86701e-07],
    [0.99, -0.00135364, -5.9661e-05, 3.6777e-06],
    [0.9822, -0.00167442, -4.49547e-06, -5.72411e-06],
    [0.973, -0.00214868, -9.03571e-05, 1.8736e-08],
    [0.96, -0.00305085, -9.00761e-05, 1.64917e-06],
    [0.9427, -0.00382792, -6.53386e-05, -2.6154e-06],
    [0.9216, -0.00467746, -0.00010457, 4.81243e-06],
    [0.8962, -0.00536223, -3.23831e-05, -5.43432e-06],
    [0.8679, -0.00609363, -0.000113898, 3.32484e-06],
    [0.835, -0.00698325, -6.40253e-05, 9.34959e-07],
    [0.7986, -0.00755338, -5.00009e-05, 9.35324e-07],
    [0.7597, -0.00798324, -3.5971e-05, -2.27626e-06],
    [0.7186, -0.00851367, -7.01149e-05, -8.6303e-06],
    [0.6732, -0.00986209, -0.000199569, 1.91974e-05],
    [0.6213, -0.010418, 8.83923e-05, 6.24051e-06],
    [0.5722, -0.00906601, 0.000182, 6.24051e-06],
    [0.5322, -0.00677797, 0.000275608, 6.24051e-06],
], dtype=np.float32).astype(np.float64)
_ROBIN_Y = np.array([
    [-5.20417e-18, 0.0124, 1.21431e-18, -8.45284e-11],
    [0.062, 0.0124, -1.26793e-09, 4.22642e-10],
    [0.124, 0.0124, 5.07171e-09, -1.60604e-09],
    [0.186, 0.0123999, -1.90189e-08, 6.00152e-09],
    [0.248, 0.0124002, 7.10039e-08, -2.24e-08],
    [0.31, 0.0123992, -2.64997e-07, 8.35986e-08],
    [0.372, 0.0124029, 9.88983e-07, -3.11994e-07],
    [0.434, 0.0123893, -3.69093e-06, -4.35621e-07],
    [0.4958, 0.0123198, -1.02252e-05, -3.45523e-07],
    [0.5571, 0.0121916, -1.54081e-05, -5.82288e-07],
    [0.6176, 0.0119938, -2.41424e-05, -5.25327e-07],
    [0.6769, 0.011713, -3.20223e-05, -5.16405e-07],
    [0.7346, 0.0113541, -3.97684e-05, -6.09052e-07],
    [0.7903, 0.0109107, -4.89042e-05, -1.04739e-06],
    [0.8435, 0.0103431, -6.4615e-05, -1.40374e-09],
    [0.8936, 0.00969686, -6.4636e-05, -8.547e-06],
    [0.9394, 0.00840947, -0.000192841, -4.2106e-06],
    [0.9761, 0.00616527, -0.000256, -4.2106e-06],
    [1, 0.00328947, -0.000319159, -4.2106e-06],
], dtype=np.float32).astype(np.float64)
_ROBIN_FXC = 0.8487
_ROBIN_FYC = 1.3523
_ROBIN_C1 = 11.45915590261646417544
_ROBIN_RC1 = 0.08726646259971647884


def robinson_fwd(lon, lat, lon0=0.0):
    """proj4 'robin' (cubic interpolation over the float32 table) —
    matches mproj/the reference CLI."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = np.deg2rad(lat)
    lam = np.deg2rad(lon - lon0)
    aphi = np.abs(phi)
    i = np.minimum(np.floor(aphi * _ROBIN_C1).astype(np.int64), 17)
    dphi = np.rad2deg(aphi - _ROBIN_RC1 * i)
    cx = _ROBIN_X[i]
    cy = _ROBIN_Y[i]
    vx = cx[:, 0] + dphi * (cx[:, 1] + dphi * (cx[:, 2] + dphi * cx[:, 3]))
    vy = cy[:, 0] + dphi * (cy[:, 1] + dphi * (cy[:, 2] + dphi * cy[:, 3]))
    x = vx * _ROBIN_FXC * lam
    y = np.where(phi < 0, -vy, vy) * _ROBIN_FYC
    return R * x, R * y


class _Matrix2D:
    """Reference Matrix2D (src/geom/mapshaper-matrix2d.js), verbatim."""

    def __init__(self):
        self.a, self.c, self.tx = 1.0, 0.0, 0.0
        self.b, self.d, self.ty = 0.0, 1.0, 0.0

    def transform(self, x, y):
        return (x * self.a + y * self.c + self.tx,
                x * self.b + y * self.d + self.ty)

    def translate(self, dx, dy):
        self.tx += dx
        self.ty += dy

    def rotate(self, q, x, y):
        cos, sin = np.cos(q), np.sin(q)
        self.a, self.c = cos, -sin
        self.b, self.d = sin, cos
        self.tx += x - x * cos + y * sin
        self.ty += y - x * sin - y * cos

    def scale(self, sx, sy):
        self.a *= sx
        self.c *= sx
        self.b *= sy
        self.d *= sy


def _albersusa_frames():
    """AlbersNYT frame setup (src/geom/mapshaper-projections.js:132-140
    + MixedProjection.addFrame): AK and HI insets on an ellipsoidal
    lcc, positioned by the reference's exact constants.  Frames work in
    RAW units (meters / a)."""
    def aea_raw(lam, phi):
        x, y = albers_fwd(lam, phi)
        return x / R, y / R

    def lcc_raw(lam, phi):
        x, y = lcc_fwd(lam, phi, lat1=33.0, lat2=45.0, lat0=39.0,
                       lon0=-96.0)
        return x / R, y / R

    frames = []
    for (c1, c2, fw, fh, scale, rot) in (
            ((-152.0, 63.0), (-115.0, 27.0), 6e6, 3e6, 0.31, 29.2),
            ((-157.0, 20.9), (-106.6, 28.2), 3e6, 5e6, 0.9, 40.0)):
        x1, y1 = (float(v) for v in aea_raw(np.array([c1[0]]),
                                            np.array([c1[1]])))
        x2, y2 = (float(v) for v in aea_raw(np.array([c2[0]]),
                                            np.array([c2[1]])))
        a2 = 2.0  # proj.a * 2 in raw units
        bbox = (x1 - fw / (R * a2), y1 - fh / (R * a2),
                x1 + fw / (R * a2), y1 + fh / (R * a2))
        m = _Matrix2D()
        m.rotate(rot * np.pi / 180.0, x1, y1)
        m.scale(scale, scale)
        tx1, ty1 = m.transform(x1, y1)
        m.translate(x2 - tx1, y2 - ty1)
        frames.append((bbox, m, lcc_raw))
    return frames


_ALBERSUSA_FRAMES = None


def albersusa_fwd(lon, lat):
    """The reference's albersusa (AlbersNYT MixedProjection): main
    ellipsoidal Albers; points whose BASE projection lands inside an
    inset frame bbox re-project with the frame's lcc and its affine."""
    global _ALBERSUSA_FRAMES
    if _ALBERSUSA_FRAMES is None:
        _ALBERSUSA_FRAMES = _albersusa_frames()
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x, y = albers_fwd(lon, lat)
    rx, ry = x / R, y / R      # frames test the BASE projection result
    moved = np.zeros(len(np.atleast_1d(rx)), dtype=bool)
    for bbox, m, frame_fwd in _ALBERSUSA_FRAMES:
        sel = ~moved & (rx >= bbox[0]) & (rx <= bbox[2]) & \
            (ry >= bbox[1]) & (ry <= bbox[3])
        if sel.any():
            fx, fy = frame_fwd(lon[sel], lat[sel])
            tx, ty = m.transform(fx, fy)
            x[sel] = tx * R
            y[sel] = ty * R
            moved |= sel   # reference breaks after the first match
    return x, y


def _identity(lon, lat):
    return np.asarray(lon, float), np.asarray(lat, float)


# alias index (reference src/geom/mapshaper-projections.js:4-9 plus the
# proj4 family names its tests use)
PROJECTIONS = {
    "webmercator": (webmercator_fwd, webmercator_inv),
    "merc": (mercator_fwd, webmercator_inv),
    "albers": (albers_fwd, albers_inv),
    "aea": (albers_fwd, albers_inv),
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
