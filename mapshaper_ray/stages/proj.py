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


def _pel(cur, step, tol, iters, consts=(), inclusive=False,
         replace=False):
    """Per-element fixed-point iteration for the inverse-projection
    solvers.

    PROJ / mproj iterate each POINT independently
    (``do { d = step(cur); cur += d; } while (fabs(d) > tol && --i)``);
    a whole-array ``np.all`` convergence test stops every element at
    the same round, so the fixed point depends on how the layer
    happened to be batched (block boundaries, per-ring densify calls).
    Here each element freezes the moment ITS OWN update is within tol —
    identical to the scalar reference loop under ANY chunking.

    ``step(cur_active, *consts_active)`` returns the delta ADDED to
    cur (or, with ``replace=True``, the NEW value — convergence then
    tests ``|new - cur|``, the reference's ``fabs(phi - nphi)`` form).
    ``inclusive=True`` freezes at ``|d| <= tol`` (loops written
    ``while (fabs(d) > tol)``), else at ``|d| < tol``.
    """
    arr = np.atleast_1d(np.asarray(cur, dtype=float)).copy()
    shp = arr.shape
    flat = arr.ravel()
    cs = [np.broadcast_to(np.asarray(c), shp).ravel() for c in consts]
    act = np.arange(flat.size)
    for _ in range(iters):
        res = step(flat[act], *[c[act] for c in cs])
        if replace:
            d = res - flat[act]
            flat[act] = res
        else:
            d = res
            flat[act] = flat[act] + d
        ad = np.abs(d)
        keep = ad > tol if inclusive else ad >= tol
        act = act[keep]
        if act.size == 0:
            break
    out = flat.reshape(shp)
    return float(out[0]) if np.ndim(cur) == 0 else out


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
    """pj_phi2: inverse of tsfn by per-element iteration."""
    def step(phi, t):
        con = E * np.sin(phi)
        return np.pi / 2 - 2 * np.arctan(
            t * np.power((1 - con) / (1 + con), 0.5 * E)) - phi
    return _pel(np.pi / 2 - 2 * np.arctan(ts), step, 1e-10, 15,
                consts=(ts,), inclusive=True)


def _phi1(qs):
    """pj_aea's phi1_: latitude from authalic q, per-element."""
    def step(phi, q):
        sinpi = np.sin(phi)
        cospi = np.cos(phi)
        con = E * sinpi
        com = 1 - con * con
        return 0.5 * com * com / cospi * (
            q / ONE_ES - sinpi / com +
            0.5 / E * np.log((1 - con) / (1 + con)))
    return _pel(np.arcsin(0.5 * qs), step, 1e-10, 15,
                consts=(qs,), inclusive=True)


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


# ---------------------------------------------------------------------------
# stere / laea / eqdc — ellipsoidal WGS84 kernels ported from the PROJ
# C originals (PJ_stere.c / PJ_laea.c / PJ_eqdc.c, same formulas mproj
# bundles at www/modules.js), vectorized.  Like aea/lcc above they bind
# the WGS84 ellipsoid (mproj's default with no +ellps/+datum).

def _ssfn(phi, sinphi):
    """ssfn_ (PJ_stere.c): conformal-latitude helper."""
    sinphi = sinphi * E
    return (np.tan(0.5 * (np.pi / 2 + phi)) *
            np.power((1 - sinphi) / (1 + sinphi), 0.5 * E))


def stere_fwd(lon, lat, lat0=0.0, lat_ts=None, lon0=0.0, k0=1.0,
              x0=0.0, y0=0.0):
    """Ellipsoidal stereographic (PJ_stere.c e_forward), all three
    modes: polar (|lat0| = 90, with optional true-scale parallel
    lat_ts), equatorial (lat0 = 0) and oblique."""
    lam = np.deg2rad(np.asarray(lon, float) - lon0)
    phi = np.deg2rad(np.asarray(lat, float))
    p0 = np.deg2rad(lat0)
    coslam = np.cos(lam)
    sinlam = np.sin(lam)
    sinphi = np.sin(phi)
    if abs(abs(lat0) - 90.0) < 1e-10:          # polar
        south = lat0 < 0
        if south:
            phi, sinphi, coslam = -phi, -sinphi, -coslam
        if lat_ts is None or abs(abs(lat_ts) - 90.0) < 1e-10:
            akm1 = 2.0 * k0 / np.sqrt(
                np.power(1 + E, 1 + E) * np.power(1 - E, 1 - E))
        else:
            t = np.sin(np.deg2rad(abs(lat_ts)))
            akm1 = (np.cos(np.deg2rad(abs(lat_ts))) /
                    _tsfn(np.deg2rad(abs(lat_ts)), t))
            akm1 /= np.sqrt(1 - ES * t * t)
        x = akm1 * _tsfn(phi, sinphi)
        y = -x * coslam
        x = x * sinlam
    elif abs(lat0) < 1e-10:                    # equatorial
        akm1 = 2.0 * k0
        X = 2 * np.arctan(_ssfn(phi, sinphi)) - np.pi / 2
        sinX, cosX = np.sin(X), np.cos(X)
        A = akm1 / (1 + cosX * coslam)
        y = A * sinX
        x = A * cosX * sinlam
    else:                                      # oblique
        sinph0 = np.sin(p0)
        X0 = 2 * np.arctan(_ssfn(p0, sinph0)) - np.pi / 2
        sinX1, cosX1 = np.sin(X0), np.cos(X0)
        akm1 = (2.0 * k0 * np.cos(p0) /
                np.sqrt(1 - ES * sinph0 * sinph0))
        X = 2 * np.arctan(_ssfn(phi, sinphi)) - np.pi / 2
        sinX, cosX = np.sin(X), np.cos(X)
        A = akm1 / (cosX1 * (1 + sinX1 * sinX + cosX1 * cosX * coslam))
        y = A * (cosX1 * sinX - sinX1 * cosX * coslam)
        x = A * cosX * sinlam
    return x0 + R * x, y0 + R * y


def stere_inv(x, y, lat0=0.0, lat_ts=None, lon0=0.0, k0=1.0,
              x0=0.0, y0=0.0):
    """PJ_stere.c e_inverse (iterative conformal-latitude unwind)."""
    x = (np.asarray(x, float) - x0) / R
    y = (np.asarray(y, float) - y0) / R
    p0 = np.deg2rad(lat0)
    rho = np.hypot(x, y)
    if abs(abs(lat0) - 90.0) < 1e-10:          # polar
        south = lat0 < 0
        if lat_ts is None or abs(abs(lat_ts) - 90.0) < 1e-10:
            akm1 = 2.0 * k0 / np.sqrt(
                np.power(1 + E, 1 + E) * np.power(1 - E, 1 - E))
        else:
            t = np.sin(np.deg2rad(abs(lat_ts)))
            akm1 = (np.cos(np.deg2rad(abs(lat_ts))) /
                    _tsfn(np.deg2rad(abs(lat_ts)), t))
            akm1 /= np.sqrt(1 - ES * t * t)
        if not south:
            y = -y
        tp = -rho / akm1
        phi_l = np.pi / 2 - 2 * np.arctan(tp)
        halfpi = -np.pi / 2
        halfe = -0.5 * E
    else:
        sinph0 = np.sin(p0)
        X0 = 2 * np.arctan(_ssfn(p0, sinph0)) - np.pi / 2
        sinX1, cosX1 = np.sin(X0), np.cos(X0)
        akm1 = (2.0 * k0 * np.cos(p0) /
                np.sqrt(1 - ES * sinph0 * sinph0)) \
            if abs(lat0) >= 1e-10 else 2.0 * k0
        if abs(lat0) < 1e-10:
            sinX1, cosX1 = 0.0, 1.0
        tt = 2 * np.arctan2(rho * cosX1, akm1)
        cosphi, sinphi = np.cos(tt), np.sin(tt)
        phi_l = np.where(rho == 0, np.arcsin(cosphi * sinX1),
                         np.arcsin(cosphi * sinX1 +
                                   np.where(rho == 0, 0,
                                            y * sinphi * cosX1 /
                                            np.where(rho == 0, 1, rho))))
        tp = np.tan(0.5 * (np.pi / 2 + phi_l))
        x = x * sinphi
        y = rho * cosX1 * cosphi - y * sinX1 * sinphi
        halfpi = np.pi / 2
        halfe = 0.5 * E
    def _stere_step(ph, t):
        sinphi_e = E * np.sin(ph)
        return 2 * np.arctan(t * np.power((1 + sinphi_e) /
                                          (1 - sinphi_e), halfe)) - halfpi
    phi = _pel(phi_l, _stere_step, 1e-10, 20, consts=(tp,), replace=True)
    if abs(abs(lat0) - 90.0) < 1e-10 and lat0 < 0:
        phi = -phi
        lam = np.where((x == 0) & (y == 0), 0.0, np.arctan2(x, y))
    elif abs(abs(lat0) - 90.0) < 1e-10:
        phi = np.where(rho == 0, np.pi / 2, phi)
        lam = np.where((x == 0) & (y == 0), 0.0, np.arctan2(x, y))
    else:
        lam = np.where((x == 0) & (y == 0), 0.0, np.arctan2(x, y))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def _authset():
    """pj_authset: authalic→geodetic latitude series for WGS84 es."""
    P00, P01, P02 = 1 / 3.0, 31 / 180.0, 517 / 5040.0
    P10, P11 = 23 / 360.0, 251 / 3780.0
    P20 = 761 / 45360.0
    t = ES
    apa0 = t * (P00 + t * (P01 + t * P02))
    apa1 = t * t * (P10 + t * P11)
    apa2 = t * t * t * P20
    return apa0, apa1, apa2


def _authlat(beta):
    a0, a1, a2 = _authset()
    return (beta + a0 * np.sin(2 * beta) + a1 * np.sin(4 * beta)
            + a2 * np.sin(6 * beta))


def laea_fwd(lon, lat, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
    """Ellipsoidal Lambert azimuthal equal-area (PJ_laea.c
    e_forward) — oblique / equatorial / polar modes."""
    lam = np.deg2rad(np.asarray(lon, float) - lon0)
    phi = np.deg2rad(np.asarray(lat, float))
    p0 = np.deg2rad(lat0)
    coslam, sinlam = np.cos(lam), np.sin(lam)
    qp = _qsfn(1.0)
    q = _qsfn(np.sin(phi))
    if abs(abs(lat0) - 90.0) < 1e-10:          # polar
        north = lat0 > 0
        if north:
            b = qp - q
            x = np.sqrt(np.maximum(b, 0.0)) * sinlam
            y = -np.sqrt(np.maximum(b, 0.0)) * coslam
        else:
            b = qp + q
            x = np.sqrt(np.maximum(b, 0.0)) * sinlam
            y = np.sqrt(np.maximum(b, 0.0)) * coslam
    elif abs(lat0) < 1e-10:                    # equatorial
        xmf, ymf = 1.0, 0.5 * qp   # PJ_laea setup EQUIT (dd only
        sinb = q / qp              # enters the INVERSE scaling)
        cosb = np.sqrt(np.maximum(1 - sinb * sinb, 0.0))
        b = np.sqrt(2.0 / (1 + cosb * coslam))
        y = b * sinb * ymf
        x = xmf * b * cosb * sinlam
    else:                                      # oblique
        rq = np.sqrt(0.5 * qp)
        sinb1 = _qsfn(np.sin(p0)) / qp
        cosb1 = np.sqrt(1 - sinb1 * sinb1)
        dd = (np.cos(p0) /
              (np.sqrt(1 - ES * np.sin(p0) ** 2) * rq * cosb1))
        ymf = rq / dd
        xmf = rq * dd
        sinb = q / qp
        cosb = np.sqrt(np.maximum(1 - sinb * sinb, 0.0))
        b = 1 + sinb1 * sinb + cosb1 * cosb * coslam
        b = np.sqrt(2.0 / b)
        y = ymf * b * (cosb1 * sinb - sinb1 * cosb * coslam)
        x = xmf * b * cosb * sinlam
    return x0 + R * x, y0 + R * y


def laea_inv(x, y, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
    """PJ_laea.c e_inverse via the authalic-latitude series."""
    x = (np.asarray(x, float) - x0) / R
    y = (np.asarray(y, float) - y0) / R
    qp = _qsfn(1.0)
    p0 = np.deg2rad(lat0)
    if abs(abs(lat0) - 90.0) < 1e-10:          # polar
        north = lat0 > 0
        q = x * x + y * y
        ab = 1.0 - q / qp
        if north:
            lam = np.arctan2(x, -y)
        else:
            ab = -ab
            lam = np.arctan2(x, y)
    else:
        rq = np.sqrt(0.5 * qp)
        if abs(lat0) < 1e-10:
            sinb1, cosb1 = 0.0, 1.0
            dd = 1.0 / rq
        else:
            sinb1 = _qsfn(np.sin(p0)) / qp
            cosb1 = np.sqrt(1 - sinb1 * sinb1)
            dd = (np.cos(p0) /
                  (np.sqrt(1 - ES * np.sin(p0) ** 2) * rq * cosb1))
        x = x / dd
        y = y * dd
        rho = np.hypot(x, y)
        sCe = 2 * np.arcsin(np.clip(0.5 * rho / rq, -1, 1))
        cCe, sCe_s = np.cos(sCe), np.sin(sCe)
        safe_rho = np.where(rho == 0, 1.0, rho)
        ab = np.where(rho == 0, sinb1,
                      cCe * sinb1 + y * sCe_s * cosb1 / safe_rho)
        lam = np.arctan2(x * sCe_s,
                         safe_rho * cosb1 * cCe - y * sinb1 * sCe_s)
        lam = np.where(rho == 0, 0.0, lam)
    phi = _authlat(np.arcsin(np.clip(ab, -1, 1)))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


# --- cass / moll / mill / gall / cea (PJ_cass.c, PJ_moll.c,
# PJ_mill.c, PJ_gall.c, PJ_cea.c ports; WGS84 where ellipsoidal) ---

_C1, _C2, _C3, _C4, _C5 = (1 / 6.0, 1 / 120.0, 1 / 24.0,
                           1 / 3.0, 1 / 15.0)


def cass_fwd(lon, lat, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
    """Ellipsoidal Cassini–Soldner (PJ_cass.c e_forward)."""
    lam = np.deg2rad(np.asarray(lon, float) - lon0)
    phi = np.deg2rad(np.asarray(lat, float))
    en = _enfn(ES)
    m0 = _mlfn(np.deg2rad(lat0), np.sin(np.deg2rad(lat0)),
               np.cos(np.deg2rad(lat0)), en)
    sinp, cosp = np.sin(phi), np.cos(phi)
    n = 1.0 / np.sqrt(1 - ES * sinp * sinp)
    tn = np.tan(phi)
    t = tn * tn
    a1 = lam * cosp
    c = cosp * cosp * ES / (1 - ES)
    a2 = a1 * a1
    x = n * a1 * (1 - a2 * t * (_C1 - (8 - t + 8 * c) * a2 * _C2))
    y = (_mlfn(phi, sinp, cosp, en) - m0
         + n * tn * a2 * (0.5 + (5 - t + 6 * c) * a2 * _C3))
    return x0 + R * x, y0 + R * y


def aeqd_fwd(lon, lat, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0, guam=False):
    """Ellipsoidal azimuthal equidistant (PJ_aeqd.c; reference mproj
    pj_aeqd) — the pj_mlfn-based modes: polar north/south (meridian-arc
    radius) and the Guam variant.  The equatorial/oblique ellipsoidal
    modes run a full Karney geodesic in mproj (GeographicLib) and
    raise here."""
    lam = np.deg2rad(np.asarray(lon, float) - lon0)
    phi = np.deg2rad(np.asarray(lat, float))
    en = _enfn(ES)
    if guam:
        p0 = np.deg2rad(lat0)
        m1 = _mlfn(p0, np.sin(p0), np.cos(p0), en)
        sinphi, cosphi = np.sin(phi), np.cos(phi)
        t = 1.0 / np.sqrt(1 - ES * sinphi * sinphi)
        x = lam * cosphi * t
        y = (_mlfn(phi, sinphi, cosphi, en) - m1
             + 0.5 * lam * lam * cosphi * sinphi * t)
    elif abs(abs(lat0) - 90.0) < 1e-10:
        north = lat0 > 0
        mp = _mlfn(np.pi / 2 if north else -np.pi / 2,
                   1.0 if north else -1.0, 0.0, en)
        coslam = np.cos(lam)
        if north:
            coslam = -coslam
        rho = np.abs(mp - _mlfn(phi, np.sin(phi), np.cos(phi), en))
        x = rho * np.sin(lam)
        y = rho * coslam
    else:
        raise NotImplementedError(
            "+proj=aeqd equatorial/oblique ellipsoidal modes need a "
            "full geodesic (GeographicLib); supported: +lat_0=90, "
            "+lat_0=-90, +guam")
    return x0 + R * x, y0 + R * y


def aeqd_inv(x, y, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0, guam=False):
    x = (np.asarray(x, float) - x0) / R
    y = (np.asarray(y, float) - y0) / R
    en = _enfn(ES)
    if guam:
        p0 = np.deg2rad(lat0)
        m1 = _mlfn(p0, np.sin(p0), np.cos(p0), en)
        x2 = 0.5 * x * x
        phi = np.full(np.shape(x), p0, dtype=np.float64)
        t = np.ones_like(phi)
        for _ in range(3):
            t = E * np.sin(phi)
            t = np.sqrt(1 - t * t)
            phi = _inv_mlfn(m1 + y - x2 * np.tan(phi) * t, ES, en)
        lam = x * t / np.cos(phi)
    elif abs(abs(lat0) - 90.0) < 1e-10:
        north = lat0 > 0
        mp = _mlfn(np.pi / 2 if north else -np.pi / 2,
                   1.0 if north else -1.0, 0.0, en)
        c = np.hypot(x, y)
        phi = _inv_mlfn(mp - c if north else mp + c, ES, en)
        lam = np.arctan2(x, -y if north else y)
        ctr = c < 1e-10
        if np.any(ctr):
            phi = np.where(ctr, np.deg2rad(lat0), phi)
            lam = np.where(ctr, 0.0, lam)
    else:
        raise NotImplementedError(
            "+proj=aeqd equatorial/oblique ellipsoidal inverse "
            "unsupported (see aeqd_fwd)")
    return lon0 + np.rad2deg(lam), np.rad2deg(phi)


def cass_inv(x, y, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
    x = (np.asarray(x, float) - x0) / R
    y = (np.asarray(y, float) - y0) / R
    en = _enfn(ES)
    m0 = _mlfn(np.deg2rad(lat0), np.sin(np.deg2rad(lat0)),
               np.cos(np.deg2rad(lat0)), en)
    ph1 = _inv_mlfn(m0 + y, ES, en)
    tn = np.tan(ph1)
    t = tn * tn
    n = np.sin(ph1)
    r = 1.0 / (1 - ES * n * n)
    n = np.sqrt(r)
    r *= (1 - ES) * n
    dd = x / n
    d2 = dd * dd
    phi = ph1 - (n * tn / r) * d2 * (0.5 - (1 + 3 * t) * d2 * _C3)
    lam = dd * (1 + t * d2 * (-_C4 + (1 + 3 * t) * d2 * _C5)) \
        / np.cos(ph1)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


_MOLL_P = np.pi / 2
_MOLL_SP = 1.0
_MOLL_P2 = np.pi
_MOLL_R = np.sqrt(2 * np.pi * _MOLL_SP / (_MOLL_P2 + np.sin(_MOLL_P2)))
_MOLL_CX = 2 * _MOLL_R / np.pi
_MOLL_CY = _MOLL_R / _MOLL_SP
_MOLL_CP = _MOLL_P2 + np.sin(_MOLL_P2)


def moll_fwd(lon, lat, lon0=0.0):
    """Spherical Mollweide (PJ_moll.c, generic setup at p=pi/2)."""
    lam = np.deg2rad(np.asarray(lon, float) - lon0)
    phi = np.deg2rad(np.asarray(lat, float))
    k = _MOLL_CP * np.sin(phi)
    th = _pel(phi, lambda t, kk: -((t + np.sin(t) - kk) /
                                   (1 + np.cos(t))),
              1e-10, 10, consts=(k,))
    th = th * 0.5
    return (R * _MOLL_CX * lam * np.cos(th),
            R * _MOLL_CY * np.sin(th))


def moll_inv(x, y, lon0=0.0):
    x = np.asarray(x, float) / R
    y = np.asarray(y, float) / R
    th = np.arcsin(np.clip(y / _MOLL_CY, -1, 1))
    lam = x / (_MOLL_CX * np.cos(th))
    th = th + th
    phi = np.arcsin(np.clip((th + np.sin(th)) / _MOLL_CP, -1, 1))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def mill_fwd(lon, lat, lon0=0.0):
    """Spherical Miller cylindrical (PJ_mill.c)."""
    lam = np.deg2rad(np.asarray(lon, float) - lon0)
    phi = np.deg2rad(np.asarray(lat, float))
    return (R * lam,
            R * np.log(np.tan(np.pi / 4 + phi * 0.4)) * 1.25)


def mill_inv(x, y, lon0=0.0):
    lam = np.asarray(x, float) / R
    phi = 2.5 * (np.arctan(np.exp(0.8 * np.asarray(y, float) / R))
                 - np.pi / 4)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


_GALL_XF = 0.70710678118654752440
_GALL_YF = 1.70710678118654752440


def gall_fwd(lon, lat, lon0=0.0):
    """Spherical Gall stereographic (PJ_gall.c)."""
    lam = np.deg2rad(np.asarray(lon, float) - lon0)
    phi = np.deg2rad(np.asarray(lat, float))
    return (R * _GALL_XF * lam, R * _GALL_YF * np.tan(0.5 * phi))


def gall_inv(x, y, lon0=0.0):
    lam = np.asarray(x, float) / R / _GALL_XF
    phi = 2 * np.arctan(np.asarray(y, float) / R / _GALL_YF)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def cea_fwd(lon, lat, lat_ts=0.0, lon0=0.0, x0=0.0, y0=0.0):
    """Ellipsoidal cylindrical equal-area (PJ_cea.c e_forward)."""
    lam = np.deg2rad(np.asarray(lon, float) - lon0)
    phi = np.deg2rad(np.asarray(lat, float))
    t = np.sin(np.deg2rad(lat_ts))
    k0 = np.cos(np.deg2rad(lat_ts)) / np.sqrt(1 - ES * t * t)
    return (x0 + R * k0 * lam,
            y0 + R * 0.5 * _qsfn(np.sin(phi)) / k0)


def cea_inv(x, y, lat_ts=0.0, lon0=0.0, x0=0.0, y0=0.0):
    x = (np.asarray(x, float) - x0) / R
    y = (np.asarray(y, float) - y0) / R
    t = np.sin(np.deg2rad(lat_ts))
    k0 = np.cos(np.deg2rad(lat_ts)) / np.sqrt(1 - ES * t * t)
    qp = _qsfn(1.0)
    phi = _authlat(np.arcsin(np.clip(2 * y * k0 / qp, -1, 1)))
    return np.rad2deg(x / k0) + lon0, np.rad2deg(phi)


def eqdc_fwd(lon, lat, lat1=0.0, lat2=0.0, lat0=0.0, lon0=0.0,
             x0=0.0, y0=0.0):
    """Ellipsoidal equidistant conic (PJ_eqdc.c)."""
    lam = np.deg2rad(np.asarray(lon, float) - lon0)
    phi = np.deg2rad(np.asarray(lat, float))
    p1, p2, p0 = np.deg2rad([lat1, lat2, lat0])
    en = _enfn(ES)
    sin1, cos1 = np.sin(p1), np.cos(p1)
    m1 = _msfn(sin1, cos1)
    ml1 = _mlfn(p1, sin1, cos1, en)
    if abs(lat1 - lat2) >= 1e-10:
        sin2, cos2 = np.sin(p2), np.cos(p2)
        n = (m1 - _msfn(sin2, cos2)) / (_mlfn(p2, sin2, cos2, en) - ml1)
    else:
        n = sin1
    c = ml1 + m1 / n
    rho0 = c - _mlfn(p0, np.sin(p0), np.cos(p0), en)
    rho = c - _mlfn(phi, np.sin(phi), np.cos(phi), en)
    return (x0 + R * rho * np.sin(lam * n),
            y0 + R * (rho0 - rho * np.cos(lam * n)))


def eqdc_inv(x, y, lat1=0.0, lat2=0.0, lat0=0.0, lon0=0.0,
             x0=0.0, y0=0.0):
    x = (np.asarray(x, float) - x0) / R
    y = (np.asarray(y, float) - y0) / R
    p1, p2, p0 = np.deg2rad([lat1, lat2, lat0])
    en = _enfn(ES)
    sin1, cos1 = np.sin(p1), np.cos(p1)
    m1 = _msfn(sin1, cos1)
    ml1 = _mlfn(p1, sin1, cos1, en)
    if abs(lat1 - lat2) >= 1e-10:
        sin2, cos2 = np.sin(p2), np.cos(p2)
        n = (m1 - _msfn(sin2, cos2)) / (_mlfn(p2, sin2, cos2, en) - ml1)
    else:
        n = sin1
    c = ml1 + m1 / n
    rho0 = c - _mlfn(p0, np.sin(p0), np.cos(p0), en)
    yy = rho0 - y
    rho = np.hypot(x, yy)
    if n < 0:
        rho, x, yy = -rho, -x, -yy
    phi = _inv_mlfn(c - rho, ES, en)
    lam = np.where(rho == 0, 0.0, np.arctan2(x, yy) / n)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


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


# ---------------------------------------------------------------------------
# transverse Mercator (pj_tmerc ellipsoidal branch, mproj
# www/modules.js pj_tmerc/pj_enfn/pj_mlfn/pj_inv_mlfn) — parameterized
# ellipsoid so Gauss-Kruger zones (Krasovsky etc.) project exactly

_FC = (1.0, 0.5, 0.16666666666666666666, 0.08333333333333333333,
       0.05, 0.03333333333333333333, 0.02380952380952380952,
       0.01785714285714285714)


def _enfn(es):
    C00, C02, C04, C06, C08 = 1, 0.25, 0.046875, 0.01953125, \
        0.01068115234375
    C22, C44, C46, C48 = 0.75, 0.46875, 0.01302083333333333333, \
        0.00712076822916666666
    C66, C68, C88 = 0.36458333333333333333, \
        0.00569661458333333333, 0.3076171875
    t = es * es
    return (C00 - es * (C02 + es * (C04 + es * (C06 + es * C08))),
            es * (C22 - es * (C04 + es * (C06 + es * C08))),
            t * (C44 - es * (C46 + es * C48)),
            t * es * (C66 - es * C68),
            t * es * es * C88)


def _mlfn(phi, sphi, cphi, en):
    cphi = cphi * sphi
    sphi = sphi * sphi
    return en[0] * phi - cphi * (en[1] + sphi * (en[2] + sphi *
                                                 (en[3] + sphi * en[4])))


def _inv_mlfn(arg, es, en):
    k = 1.0 / (1.0 - es)

    def step(phi, a):
        s = np.sin(phi)
        t = 1 - es * s * s
        return -((_mlfn(phi, s, np.cos(phi), en) - a) *
                 (t * np.sqrt(t)) * k)
    return _pel(arg, step, 1e-11, 10, consts=(arg,))


def _tmerc_setup(lat0, a, rf):
    f = 1.0 / rf
    es = f * (2.0 - f)
    en = _enfn(es)
    phi0 = np.deg2rad(lat0)
    ml0 = _mlfn(phi0, np.sin(phi0), np.cos(phi0), en)
    esp = es / (1 - es)
    return es, en, ml0, esp


def tmerc_fwd(lon, lat, lon0=0.0, lat0=0.0, k0=1.0, x0=0.0, y0=0.0,
              a=R, rf=1.0 / F_WGS84):
    FC1, FC2, FC3, FC4, FC5, FC6, FC7, FC8 = _FC
    es, en, ml0, esp = _tmerc_setup(lat0, a, rf)
    lam = np.deg2rad(np.asarray(lon, float) - lon0)
    phi = np.deg2rad(np.asarray(lat, float))
    sinphi = np.sin(phi)
    cosphi = np.cos(phi)
    t = np.where(np.abs(cosphi) > 1e-10, sinphi / cosphi, 0.0)
    t = t * t
    al = cosphi * lam
    als = al * al
    al = al / np.sqrt(1 - es * sinphi * sinphi)
    n = esp * cosphi * cosphi
    x = k0 * al * (FC1 + FC3 * als * (1 - t + n +
        FC5 * als * (5 + t * (t - 18) + n * (14 - 58 * t) +
        FC7 * als * (61 + t * (t * (179 - t) - 479)))))
    y = k0 * (_mlfn(phi, sinphi, cosphi, en) - ml0 +
        sinphi * al * lam * FC2 * (1 +
        FC4 * als * (5 - t + n * (9 + 4 * n) +
        FC6 * als * (61 + t * (t - 58) + n * (270 - 330 * t) +
        FC8 * als * (1385 + t * (t * (543 - t) - 3111))))))
    return a * x + x0, a * y + y0


def tmerc_inv(x, y, lon0=0.0, lat0=0.0, k0=1.0, x0=0.0, y0=0.0,
              a=R, rf=1.0 / F_WGS84):
    FC1, FC2, FC3, FC4, FC5, FC6, FC7, FC8 = _FC
    es, en, ml0, esp = _tmerc_setup(lat0, a, rf)
    xs = (np.asarray(x, float) - x0) / a
    ys = (np.asarray(y, float) - y0) / a
    phi = _inv_mlfn(ml0 + ys / k0, es, en)
    over = np.abs(phi) >= np.pi / 2
    sinphi = np.sin(phi)
    cosphi = np.cos(phi)
    t = np.where(np.abs(cosphi) > 1e-10, sinphi / cosphi, 0.0)
    n = esp * cosphi * cosphi
    con = 1 - es * sinphi * sinphi
    d = xs * np.sqrt(con) / k0
    con = con * t
    t = t * t
    ds = d * d
    phi2 = phi - (con * ds / (1 - es)) * FC2 * (1 -
        ds * FC4 * (5 + t * (3 - 9 * n) + n * (1 - 4 * n) -
        ds * FC6 * (61 + t * (90 - 252 * n + 45 * t) + 46 * n -
        ds * FC8 * (1385 + t * (3633 + t * (4095 + 1575 * t))))))
    lam = d * (FC1 - ds * FC3 * (1 + 2 * t + n -
        ds * FC5 * (5 + t * (28 + 24 * t + 8 * n) + 6 * n -
        ds * FC7 * (61 + t * (662 + t * (1320 + 720 * t)))))) \
        / np.where(np.abs(cosphi) > 0, cosphi, 1.0)
    phi_out = np.where(over, np.where(ys < 0, -np.pi / 2, np.pi / 2),
                       phi2)
    lam_out = np.where(over, 0.0, lam)
    return np.rad2deg(lam_out) + lon0, np.rad2deg(phi_out)


# ---------------------------------------------------------------------------
# extended (exact) transverse Mercator — pj_etmerc, the Poder/Engsager
# 6th-order Gauss-Krueger algorithm mproj uses for +proj=utm
# (www/modules.js:16122-16309); accurate across the whole zone where
# the pj_tmerc power series degrades far from the central meridian

def _gatg(pp, B):
    """Clenshaw summation: B + sum(pp[i] * sin(2(i+1)B))."""
    cos_2B = 2 * np.cos(2 * B)
    h1 = np.full_like(np.asarray(B, float), pp[-1])
    h2 = np.zeros_like(h1)
    for c in pp[-2::-1]:
        h = -h2 + cos_2B * h1 + c
        h2, h1 = h1, h
    return B + h1 * np.sin(2 * B)


def _clens(pp, arg_r):
    r = 2 * np.cos(arg_r)
    hr1 = pp[-1]
    hr2 = 0.0
    for c in pp[-2::-1]:
        hr = -hr2 + r * hr1 + c
        hr2, hr1 = hr1, hr
    return np.sin(arg_r) * hr1


def _clenS(pp, arg_r, arg_i):
    """Complex Clenshaw over sin(2kz) with z = arg_r + i*arg_i."""
    sin_r, cos_r = np.sin(arg_r), np.cos(arg_r)
    sinh_i, cosh_i = np.sinh(arg_i), np.cosh(arg_i)
    r = 2 * cos_r * cosh_i
    i = -2 * sin_r * sinh_i
    hr = np.full_like(np.asarray(arg_r, float), pp[-1])
    hr1 = np.zeros_like(hr)
    hi = np.zeros_like(hr)
    hi1 = np.zeros_like(hr)
    for c in pp[-2::-1]:
        hr2, hi2, hr1, hi1 = hr1, hi1, hr, hi
        hr = -hr2 + r * hr1 - i * hi1 + c
        hi = -hi2 + i * hr1 + r * hi1
    rr = sin_r * cosh_i
    ri = cos_r * sinh_i
    return rr * hr - ri * hi, rr * hi + ri * hr


def _etmerc_setup(lat0, k0, a, rf):
    f_ = 1.0 / rf
    es = f_ * (2.0 - f_)
    f = es / (1 + np.sqrt(1 - es))
    n = f / (2 - f)
    cgb = [n * (2 + n * (-2 / 3 + n * (-2 + n * (116 / 45 + n * (26 / 45 + n * (-2854 / 675)))))),
           0, 0, 0, 0, 0]
    cbg = [n * (-2 + n * (2 / 3 + n * (4 / 3 + n * (-82 / 45 + n * (32 / 45 + n * (4642 / 4725)))))),
           0, 0, 0, 0, 0]
    np_ = n * n
    cgb[1] = np_ * (7 / 3 + n * (-8 / 5 + n * (-227 / 45 + n * (2704 / 315 + n * (2323 / 945)))))
    cbg[1] = np_ * (5 / 3 + n * (-16 / 15 + n * (-13 / 9 + n * (904 / 315 + n * (-1522 / 945)))))
    np_ *= n
    cgb[2] = np_ * (56 / 15 + n * (-136 / 35 + n * (-1262 / 105 + n * (73814 / 2835))))
    cbg[2] = np_ * (-26 / 15 + n * (34 / 21 + n * (8 / 5 + n * (-12686 / 2835))))
    np_ *= n
    cgb[3] = np_ * (4279 / 630 + n * (-332 / 35 + n * (-399572 / 14175)))
    cbg[3] = np_ * (1237 / 630 + n * (-12 / 5 + n * (-24832 / 14175)))
    np_ *= n
    cgb[4] = np_ * (4174 / 315 + n * (-144838 / 6237))
    cbg[4] = np_ * (-734 / 315 + n * (109598 / 31185))
    np_ *= n
    cgb[5] = np_ * (601676 / 22275)
    cbg[5] = np_ * (444337 / 155925)
    np_ = n * n
    qn = k0 / (1 + n) * (1 + np_ * (1 / 4 + np_ * (1 / 64 + np_ / 256)))
    utg = [n * (-0.5 + n * (2 / 3 + n * (-37 / 96 + n * (1 / 360 + n * (81 / 512 + n * (-96199 / 604800)))))),
           0, 0, 0, 0, 0]
    gtu = [n * (0.5 + n * (-2 / 3 + n * (5 / 16 + n * (41 / 180 + n * (-127 / 288 + n * (7891 / 37800)))))),
           0, 0, 0, 0, 0]
    utg[1] = np_ * (-1 / 48 + n * (-1 / 15 + n * (437 / 1440 + n * (-46 / 105 + n * (1118711 / 3870720)))))
    gtu[1] = np_ * (13 / 48 + n * (-3 / 5 + n * (557 / 1440 + n * (281 / 630 + n * (-1983433 / 1935360)))))
    np_ *= n
    utg[2] = np_ * (-17 / 480 + n * (37 / 840 + n * (209 / 4480 + n * (-5569 / 90720))))
    gtu[2] = np_ * (61 / 240 + n * (-103 / 140 + n * (15061 / 26880 + n * (167603 / 181440))))
    np_ *= n
    utg[3] = np_ * (-4397 / 161280 + n * (11 / 504 + n * (830251 / 7257600)))
    gtu[3] = np_ * (49561 / 161280 + n * (-179 / 168 + n * (6601661 / 7257600)))
    np_ *= n
    utg[4] = np_ * (-4583 / 161280 + n * (108847 / 3991680))
    gtu[4] = np_ * (34729 / 80640 + n * (-3418889 / 1995840))
    np_ *= n
    utg[5] = np_ * (-20648693 / 638668800)
    gtu[5] = np_ * (212378941 / 319334400)
    z = _gatg(cbg, np.float64(np.deg2rad(lat0)))
    zb = -qn * (z + _clens(gtu, 2 * z))
    return cgb, cbg, utg, gtu, qn, float(zb)


def etmerc_fwd(lon, lat, lon0=0.0, lat0=0.0, k0=1.0, x0=0.0, y0=0.0,
               a=R, rf=1.0 / F_WGS84):
    cgb, cbg, utg, gtu, qn, zb = _etmerc_setup(lat0, k0, a, rf)
    ce = np.deg2rad(np.asarray(lon, float) - lon0)
    cn = _gatg(cbg, np.deg2rad(np.asarray(lat, float)))
    sin_cn, cos_cn = np.sin(cn), np.cos(cn)
    sin_ce, cos_ce = np.sin(ce), np.cos(ce)
    cn = np.arctan2(sin_cn, cos_ce * cos_cn)
    ce = np.arctan2(sin_ce * cos_cn, np.hypot(sin_cn, cos_cn * cos_ce))
    ce = np.arcsinh(np.tan(ce))
    dcn, dce = _clenS(gtu, 2 * cn, 2 * ce)
    cn = cn + dcn
    ce = ce + dce
    return a * qn * ce + x0, a * (qn * cn + zb) + y0


def etmerc_inv(x, y, lon0=0.0, lat0=0.0, k0=1.0, x0=0.0, y0=0.0,
               a=R, rf=1.0 / F_WGS84):
    cgb, cbg, utg, gtu, qn, zb = _etmerc_setup(lat0, k0, a, rf)
    cn = ((np.asarray(y, float) - y0) / a - zb) / qn
    ce = (np.asarray(x, float) - x0) / a / qn
    dcn, dce = _clenS(utg, 2 * cn, 2 * ce)
    cn = cn + dcn
    ce = np.arctan(np.sinh(ce + dce))
    sin_cn, cos_cn = np.sin(cn), np.cos(cn)
    sin_ce, cos_ce = np.sin(ce), np.cos(ce)
    lam = np.arctan2(sin_ce, cos_ce * cos_cn)
    phi = _gatg(cgb, np.arctan2(sin_cn * cos_ce,
                                np.hypot(sin_ce, cos_ce * cos_cn)))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


# ---------------------------------------------------------------------------
# ellipsoidal Mercator (pj_merc e_fwd/e_inv, mproj www/modules.js) —
# PROJECTION["Mercator"] in ESRI WKT carries standard_parallel_1

def _tsfn_e(phi, sinphi, e):
    sinphi = sinphi * e
    return (np.tan(0.5 * (np.pi / 2 - phi)) /
            np.power((1 - sinphi) / (1 + sinphi), 0.5 * e))


def _phi2_e(ts, e):
    def step(phi, t):
        con = e * np.sin(phi)
        return np.pi / 2 - 2 * np.arctan(
            t * np.power((1 - con) / (1 + con), 0.5 * e)) - phi
    return _pel(np.pi / 2 - 2 * np.arctan(ts), step, 1e-10, 15,
                consts=(ts,), inclusive=True)


def merc_ell_fwd(lon, lat, lon0=0.0, lat_ts=0.0, k0=None, x0=0.0,
                 y0=0.0, a=R, rf=1.0 / F_WGS84):
    f = 1.0 / rf
    es = f * (2.0 - f)
    e = np.sqrt(es)
    if k0 is None:
        pts = np.deg2rad(lat_ts)
        k0 = np.cos(pts) / np.sqrt(1 - es * np.sin(pts) ** 2)
    lam = np.deg2rad(np.asarray(lon, float) - lon0)
    phi = np.deg2rad(np.clip(np.asarray(lat, float), -89.999999,
                             89.999999))
    x = k0 * lam
    y = -k0 * np.log(_tsfn_e(phi, np.sin(phi), e))
    return a * x + x0, a * y + y0


def merc_ell_inv(x, y, lon0=0.0, lat_ts=0.0, k0=None, x0=0.0, y0=0.0,
                 a=R, rf=1.0 / F_WGS84):
    f = 1.0 / rf
    es = f * (2.0 - f)
    e = np.sqrt(es)
    if k0 is None:
        pts = np.deg2rad(lat_ts)
        k0 = np.cos(pts) / np.sqrt(1 - es * np.sin(pts) ** 2)
    xs = (np.asarray(x, float) - x0) / a
    ys = (np.asarray(y, float) - y0) / a
    phi = _phi2_e(np.exp(-ys / k0), e)
    return np.rad2deg(xs / k0) + lon0, np.rad2deg(phi)


# ---------------------------------------------------------------------------
# round-3 wide-family batch: world projections (spherical — mproj
# forces P.es=0, sphere radius = a) and national-grid ellipsoidal
# families, formula-ported from mproj's pj_* setups (the reference's
# actual -proj backend, same math as PROJ.4; reference
# src/commands/mapshaper-proj.js:8)

def _wrap_lam(lam):
    """mproj adjlon applied in pj_fwd: wrap lam-lam0 into [-pi, pi]."""
    lam = np.asarray(lam, float)
    return np.where(np.abs(lam) > np.pi,
                    lam - 2 * np.pi * np.round(lam / (2 * np.pi)), lam)


def ortho_fwd(lon, lat, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
    """Spherical orthographic (pj_ortho); the invisible hemisphere
    projects to NaN (mproj raises f_error per point)."""
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    p0 = np.deg2rad(lat0)
    cosphi, sinphi = np.cos(phi), np.sin(phi)
    coslam = np.cos(lam)
    if abs(abs(lat0) - 90.0) <= 1e-8:                       # polar
        cl = coslam if lat0 < 0 else -coslam
        bad = np.abs(phi - p0) - 1e-10 > np.pi / 2
        y = np.where(bad, np.nan, cosphi * cl)
    elif abs(lat0) > 1e-8:                                  # oblique
        s0, c0 = np.sin(p0), np.cos(p0)
        bad = s0 * sinphi + c0 * cosphi * coslam < -1e-10
        y = np.where(bad, np.nan, c0 * sinphi - s0 * cosphi * coslam)
    else:                                                   # equatorial
        bad = cosphi * coslam < -1e-10
        y = np.where(bad, np.nan, sinphi)
    x = np.where(np.isnan(y), np.nan, cosphi * np.sin(lam))
    return x0 + R * x, y0 + R * y


def ortho_inv(x, y, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
    x = (np.asarray(x, float) - x0) / R
    y = (np.asarray(y, float) - y0) / R
    p0 = np.deg2rad(lat0)
    rh = np.hypot(x, y)
    sinc = np.minimum(rh, 1.0)
    cosc = np.sqrt(1 - sinc * sinc)
    with np.errstate(invalid="ignore", divide="ignore"):
        if abs(abs(lat0) - 90.0) <= 1e-8:
            phi = np.arccos(sinc) * (1 if lat0 >= 0 else -1)
            lam = np.arctan2(x, -y if lat0 >= 0 else y)
        elif abs(lat0) > 1e-8:
            s0, c0 = np.sin(p0), np.cos(p0)
            phi = cosc * s0 + y * sinc * c0 / rh
            yy = (cosc - s0 * phi) * rh
            xx = x * sinc * c0
            phi = np.arcsin(np.clip(phi, -1, 1))
            lam = np.where(yy == 0,
                           np.where(xx == 0, 0.0,
                                    np.sign(xx) * np.pi / 2),
                           np.arctan2(xx, yy))
        else:
            phi = y * sinc / rh
            yy = cosc * rh
            xx = x * sinc
            phi = np.arcsin(np.clip(phi, -1, 1))
            lam = np.where(yy == 0,
                           np.where(xx == 0, 0.0,
                                    np.sign(xx) * np.pi / 2),
                           np.arctan2(xx, yy))
    phi = np.where(rh <= 1e-10, p0, phi)
    lam = np.where(rh <= 1e-10, 0.0, lam)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def gnom_fwd(lon, lat, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
    """Spherical gnomonic (pj_gnom); the far hemisphere → NaN."""
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    p0 = np.deg2rad(lat0)
    sinphi, cosphi = np.sin(phi), np.cos(phi)
    coslam = np.cos(lam)
    if abs(abs(lat0) - 90.0) < 1e-10:
        t = sinphi if lat0 > 0 else -sinphi
        cl = -coslam if lat0 > 0 else coslam
    elif abs(lat0) < 1e-10:
        t = cosphi * coslam
        cl = coslam
    else:
        s0, c0 = np.sin(p0), np.cos(p0)
        t = s0 * sinphi + c0 * cosphi * coslam
        cl = coslam
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(t <= 1e-10, np.nan, 1.0 / t)
        x = t * cosphi * np.sin(lam)
        if abs(abs(lat0) - 90.0) < 1e-10:
            y = t * cosphi * cl
        elif abs(lat0) < 1e-10:
            y = t * sinphi
        else:
            s0, c0 = np.sin(p0), np.cos(p0)
            y = t * (c0 * sinphi - s0 * cosphi * coslam)
    return x0 + R * x, y0 + R * y


def gnom_inv(x, y, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
    x = (np.asarray(x, float) - x0) / R
    y = (np.asarray(y, float) - y0) / R
    p0 = np.deg2rad(lat0)
    rh = np.hypot(x, y)
    z = np.arctan(rh)
    sinz, cosz = np.sin(z), np.sqrt(1 - np.sin(z) ** 2)
    with np.errstate(invalid="ignore", divide="ignore"):
        if abs(abs(lat0) - 90.0) < 1e-10:
            phi = (np.pi / 2 - z) if lat0 > 0 else (z - np.pi / 2)
            yy = -y if lat0 > 0 else y
            xx = x
        elif abs(lat0) < 1e-10:
            phi = np.arcsin(np.clip(y * sinz / rh, -1, 1))
            yy = cosz * rh
            xx = x * sinz
        else:
            s0, c0 = np.sin(p0), np.cos(p0)
            phi = np.arcsin(np.clip(cosz * s0 + y * sinz * c0 / rh,
                                    -1, 1))
            yy = (cosz - s0 * np.sin(phi)) * rh
            xx = x * sinz * c0
        lam = np.arctan2(xx, yy)
    phi = np.where(rh <= 1e-10, p0, phi)
    lam = np.where(rh <= 1e-10, 0.0, lam)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


_NE_A = (0.8707, -0.131979, -0.013791, 0.003971, -0.001529)
_NE_B = (1.007226, 0.015085, -0.044475, 0.028874, -0.005916)
_NE_C = (_NE_B[0], 3 * _NE_B[1], 7 * _NE_B[2], 9 * _NE_B[3],
         11 * _NE_B[4])
_NE_MAX_Y = 0.8707 * 0.52 * np.pi


def natearth_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    """Natural Earth (pj_natearth polynomial)."""
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    A0, A1, A2, A3, A4 = _NE_A
    B0, B1, B2, B3, B4 = _NE_B
    phi2 = phi * phi
    phi4 = phi2 * phi2
    x = lam * (A0 + phi2 * (A1 + phi2 * (A2 + phi4 * phi2 *
                                         (A3 + phi2 * A4))))
    y = phi * (B0 + phi2 * (B1 + phi4 * (B2 + B3 * phi2 + B4 * phi4)))
    return x0 + R * x, y0 + R * y


def natearth_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    x = (np.asarray(x, float) - x0) / R
    y = np.clip((np.asarray(y, float) - y0) / R, -_NE_MAX_Y, _NE_MAX_Y)
    A0, A1, A2, A3, A4 = _NE_A
    B0, B1, B2, B3, B4 = _NE_B
    C0, C1, C2, C3, C4 = _NE_C
    def step(yc, yt):                                     # Newton
        y2 = yc * yc
        y4 = y2 * y2
        f = (yc * (B0 + y2 * (B1 + y4 * (B2 + B3 * y2 + B4 * y4)))) - yt
        fder = C0 + y2 * (C1 + y4 * (C2 + C3 * y2 + C4 * y4))
        return -(f / fder)
    yc = _pel(y, step, 1e-11, 20, consts=(y,))
    y2 = yc * yc
    lam = x / (A0 + y2 * (A1 + y2 * (A2 + y2 * y2 * y2 *
                                     (A3 + y2 * A4))))
    return np.rad2deg(lam) + lon0, np.rad2deg(yc)


def eck1_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    FC, RP = 0.92131773192356127802, 0.31830988618379067154
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    return (x0 + R * FC * lam * (1 - RP * np.abs(phi)),
            y0 + R * FC * phi)


def eck1_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    FC, RP = 0.92131773192356127802, 0.31830988618379067154
    phi = (np.asarray(y, float) - y0) / R / FC
    lam = (np.asarray(x, float) - x0) / R / (FC * (1 - RP * np.abs(phi)))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def eck2_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    FXC, FYC = 0.46065886596178063902, 1.44720250911653531871
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    t = np.sqrt(4 - 3 * np.sin(np.abs(phi)))
    return (x0 + R * FXC * lam * t,
            y0 + R * np.sign(phi) * FYC * (2 - t))


def eck2_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    FXC, FYC = 0.46065886596178063902, 1.44720250911653531871
    x = (np.asarray(x, float) - x0) / R
    y = (np.asarray(y, float) - y0) / R
    t = 2 - np.abs(y) / FYC
    lam = x / (FXC * t)
    phi = np.arcsin(np.clip((4 - t * t) / 3.0, -1, 1)) * np.sign(y)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def _eck3_family(C_x, C_y, A, B):
    def fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
        lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
        phi = np.deg2rad(np.asarray(lat, float))
        return (x0 + R * C_x * lam *
                (A + np.sqrt(np.maximum(1 - B * phi * phi, 0.0))),
                y0 + R * C_y * phi)

    def inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
        phi = (np.asarray(y, float) - y0) / R / C_y
        lam = ((np.asarray(x, float) - x0) / R /
               (C_x * (A + np.sqrt(np.maximum(1 - B * phi * phi, 0.0)))))
        return np.rad2deg(lam) + lon0, np.rad2deg(phi)
    return fwd, inv


eck3_fwd, eck3_inv = _eck3_family(
    0.42223820031577120149, 0.84447640063154240298, 1.0,
    0.4052847345693510857755)
kav7_fwd, kav7_inv = _eck3_family(0.8660254037844, 1.0, 0.0,
                                  0.30396355092701331433)


def eck4_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    C_x, C_y, C_p = (0.42223820031577120149, 1.32650042817700232218,
                     3.57079632679489661922)
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    p = C_p * np.sin(phi)
    V = phi * phi

    def step(th, pp):
        c, s = np.cos(th), np.sin(th)
        return -((th + s * (c + 2) - pp) / (1 + c * (c + 2) - s * s))
    th = _pel(phi * (0.895168 + V * (0.0218849 + V * 0.00826809)),
              step, 1e-7, 6, consts=(p,))
    return (x0 + R * C_x * lam * (1 + np.cos(th)),
            y0 + R * C_y * np.sin(th))


def eck4_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    C_x, C_y, C_p = (0.42223820031577120149, 1.32650042817700232218,
                     3.57079632679489661922)
    x = (np.asarray(x, float) - x0) / R
    y = (np.asarray(y, float) - y0) / R
    th = np.arcsin(np.clip(y / C_y, -1, 1))
    c = np.cos(th)
    lam = x / (C_x * (1 + c))
    phi = np.arcsin(np.clip((th + np.sin(th) * (c + 2)) / C_p, -1, 1))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def eck5_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    XF, YF = 0.44101277172455148219, 0.88202554344910296438
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    return (x0 + R * XF * (1 + np.cos(phi)) * lam, y0 + R * YF * phi)


def eck5_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    RXF, RYF = 2.26750802723822639137, 1.13375401361911319568
    phi = RYF * (np.asarray(y, float) - y0) / R
    lam = RXF * (np.asarray(x, float) - x0) / R / (1 + np.cos(phi))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def _sinu_general(m, n):
    """pj_sinu_init(m, n) family: eck6 = (1, 2.5707963...)."""
    C_y = np.sqrt((m + 1) / n)
    C_x = C_y / (m + 1)

    def fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
        lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
        phi = np.deg2rad(np.asarray(lat, float))
        k = n * np.sin(phi)
        th = _pel(phi, lambda t, kk: -((m * t + np.sin(t) - kk) /
                                       (m + np.cos(t))),
                  1e-7, 8, consts=(k,))
        return (x0 + R * C_x * lam * (m + np.cos(th)),
                y0 + R * C_y * th)

    def inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
        x = (np.asarray(x, float) - x0) / R
        th = (np.asarray(y, float) - y0) / R / C_y
        phi = np.arcsin(np.clip((m * th + np.sin(th)) / n, -1, 1))
        lam = x / (C_x * (m + np.cos(th)))
        return np.rad2deg(lam) + lon0, np.rad2deg(phi)
    return fwd, inv


eck6_fwd, eck6_inv = _sinu_general(1.0, 2.570796326794896619231321691)


def hammer_fwd(lon, lat, W=0.5, M=1.0, lon0=0.0, x0=0.0, y0=0.0):
    """Hammer(-Aitoff) with generalized W/M (pj_hammer)."""
    w = abs(W)
    m, rm = abs(M) / w, 1.0 / abs(M)
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0)) * w
    phi = np.deg2rad(np.asarray(lat, float))
    cosphi = np.cos(phi)
    d = np.sqrt(2.0 / (1 + cosphi * np.cos(lam)))
    return (x0 + R * m * d * cosphi * np.sin(lam),
            y0 + R * rm * d * np.sin(phi))


def hammer_inv(x, y, W=0.5, M=1.0, lon0=0.0, x0=0.0, y0=0.0):
    """pj_hammer s_inv — mirrors mproj exactly (closed form on the
    raw plane coordinates; exact for the default M=1)."""
    w = abs(W)
    xs = (np.asarray(x, float) - x0) / R
    ys = (np.asarray(y, float) - y0) / R
    z = np.sqrt(np.maximum(1 - 0.25 * w * w * xs * xs -
                           0.25 * ys * ys, 0.0))
    with np.errstate(invalid="ignore", divide="ignore"):
        lam = np.arctan2(w * xs * z, 2 * z * z - 1) / w
        phi = np.arcsin(np.clip(z * ys, -1, 1))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def _aitoff_fwd_core(lam, phi, cosphi1, winkel):
    c = 0.5 * lam
    d = np.arccos(np.clip(np.cos(phi) * np.cos(c), -1, 1))
    with np.errstate(invalid="ignore", divide="ignore"):
        y0_ = 1.0 / np.sin(d)
        x = 2 * d * np.cos(phi) * np.sin(c) * y0_
        y = y0_ * d * np.sin(phi)
    x = np.where(d == 0, 0.0, x)
    y = np.where(d == 0, 0.0, y)
    if winkel:
        x = (x + lam * cosphi1) * 0.5
        y = (y + phi) * 0.5
    return x, y


def aitoff_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    x, y = _aitoff_fwd_core(lam, phi, 0.0, False)
    return x0 + R * x, y0 + R * y


_WINTRI_COSPHI1 = 0.636619772367581343  # acos(2/pi)


def wintri_fwd(lon, lat, lat1=None, lon0=0.0, x0=0.0, y0=0.0):
    cosphi1 = _WINTRI_COSPHI1 if lat1 is None else \
        np.cos(np.deg2rad(lat1))
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    x, y = _aitoff_fwd_core(lam, phi, cosphi1, True)
    return x0 + R * x, y0 + R * y


def _aitoff_inv_core(x, y, cosphi1, winkel):
    """Vectorized Newton-Raphson from pj_aitoff s_inv."""
    phi = np.atleast_1d(np.asarray(y, float)).copy()
    lam = np.atleast_1d(np.asarray(x, float)).copy()
    xt = np.broadcast_to(np.atleast_1d(np.asarray(x, float)), lam.shape)
    yt = np.broadcast_to(np.atleast_1d(np.asarray(y, float)), phi.shape)
    # per-element Newton (see _pel): each point converges on its own
    act = np.arange(phi.size)
    for _ in range(30):
        la, ph = lam[act], phi[act]
        sl, cl = np.sin(la * 0.5), np.cos(la * 0.5)
        sp, cp = np.sin(ph), np.cos(ph)
        with np.errstate(invalid="ignore", divide="ignore"):
            D = cp * cl
            C = 1 - D * D
            D = np.arccos(np.clip(D, -1, 1)) / np.power(
                np.maximum(C, 1e-300), 1.5)
            f1 = 2 * D * C * cp * sl
            f2 = D * C * sp
            f1p = 2 * (sl * cl * sp * cp / C - D * sp * sl)
            f1l = cp * cp * sl * sl / C + D * cp * cl * sp * sp
            f2p = sp * sp * cl / C + D * sl * sl * cp
            f2l = 0.5 * (sp * cp * sl / C - D * sp * cp * cp * sl * cl)
            if winkel:
                f1 = 0.5 * (f1 + la * cosphi1)
                f2 = 0.5 * (f2 + ph)
                f1p = f1p * 0.5
                f1l = 0.5 * (f1l + cosphi1)
                f2p = 0.5 * (f2p + 1)
                f2l = f2l * 0.5
            f1 = f1 - xt[act]
            f2 = f2 - yt[act]
            den = f1p * f2l - f2p * f1l
            dl = (f2 * f1p - f1 * f2p) / den
            dp = (f1 * f2l - f2 * f1l) / den
        dl = np.where(np.isfinite(dl), dl, 0.0)
        dp = np.where(np.isfinite(dp), dp, 0.0)
        dl = np.mod(dl + np.pi, 2 * np.pi) - np.pi
        phi[act] = ph - dp
        lam[act] = la - dl
        act = act[(np.abs(dp) >= 1e-12) | (np.abs(dl) >= 1e-12)]
        if act.size == 0:
            break
    if np.ndim(x) == 0:
        phi, lam = phi[0], lam[0]
    phi = np.where(phi > np.pi / 2, np.pi - phi, phi)
    phi = np.where(phi < -np.pi / 2, -np.pi - phi, phi)
    near0 = (np.abs(x) < 1e-12) & (np.abs(y) < 1e-12)
    return np.where(near0, 0.0, lam), np.where(near0, 0.0, phi)


def aitoff_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    lam, phi = _aitoff_inv_core((np.asarray(x, float) - x0) / R,
                                (np.asarray(y, float) - y0) / R,
                                0.0, False)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def wintri_inv(x, y, lat1=None, lon0=0.0, x0=0.0, y0=0.0):
    cosphi1 = _WINTRI_COSPHI1 if lat1 is None else \
        np.cos(np.deg2rad(lat1))
    lam, phi = _aitoff_inv_core((np.asarray(x, float) - x0) / R,
                                (np.asarray(y, float) - y0) / R,
                                cosphi1, True)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def vandg_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    """Van der Grinten I (pj_vandg s_fwd), three-branch vectorized."""
    TOL = 1e-10
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    p2 = np.minimum(np.abs(phi / (np.pi / 2)), 1.0)
    on_eq = np.abs(phi) <= TOL
    on_cm = (np.abs(lam) <= TOL) | (np.abs(p2 - 1) < TOL)
    with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
        al = 0.5 * np.abs(np.pi / lam - lam / np.pi)
        al2 = al * al
        g = np.sqrt(np.maximum(1 - p2 * p2, 0.0))
        g = g / np.maximum(p2 + g - 1, 1e-300)
        g2 = g * g
        q2 = (g * (2 / np.maximum(p2, 1e-300) - 1)) ** 2
        xg = g - q2
        gg = q2 + al2
        x = (np.pi * (al * xg + np.sqrt(np.maximum(
            al2 * xg * xg - gg * (g2 - q2), 0.0))) / gg)
        x = np.where(lam < 0, -x, x)
        yy = np.abs(x / np.pi)
        yy = 1 - yy * (yy + 2 * al)
        y = np.sqrt(np.maximum(yy, 0.0)) * np.where(phi < 0, -np.pi,
                                                    np.pi)
    x = np.where(on_eq, lam, np.where(on_cm, 0.0, x))
    y_cm = np.pi * np.tan(0.5 * np.arcsin(p2)) * np.sign(phi)
    y = np.where(on_eq, 0.0, np.where(on_cm, y_cm, y))
    return x0 + R * x, y0 + R * y


def vandg_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    """pj_vandg s_inv (cubic resolvent closed form)."""
    TOL = 1e-10
    THIRD = 1.0 / 3.0
    C2_27 = 0.07407407407407407407
    PI4_3 = 4.18879020478639098458
    PISQ = np.pi * np.pi
    TPISQ, HPISQ = 2 * PISQ, 0.5 * PISQ
    x = (np.asarray(x, float) - x0) / R
    y = (np.asarray(y, float) - y0) / R
    x2 = x * x
    ay = np.abs(y)
    y2 = y * y
    r = x2 + y2
    r2 = r * r
    with np.errstate(invalid="ignore", divide="ignore"):
        c1 = -np.pi * ay * (r + PISQ)
        c3 = r2 + 2 * np.pi * (ay * r + np.pi * (y2 + np.pi *
                                                 (ay + np.pi / 2)))
        c2 = (c1 + PISQ * (r - 3 * y2)) / c3
        c0 = np.pi * ay
        al = c1 / c3 - THIRD * c2 * c2
        m = 2 * np.sqrt(np.maximum(-THIRD * al, 0.0))
        d = C2_27 * c2 * c2 * c2 + (c0 * c0 - THIRD * c2 * c1) / c3
        dd = 3 * d / (al * m)
        t = np.abs(dd)
        dcl = np.where(t > 1, np.where(dd > 0, 0.0, np.pi),
                       np.arccos(np.clip(dd, -1, 1)))
        phi = np.pi * (m * np.cos(dcl * THIRD + PI4_3) - THIRD * c2)
        phi = np.where(y < 0, -phi, phi)
        tt = r2 + TPISQ * (x2 - y2 + HPISQ)
        lam = np.where(np.abs(x) <= TOL, 0.0,
                       0.5 * (r - PISQ + np.sqrt(np.maximum(tt, 0.0)))
                       / np.where(x == 0, 1.0, x))
    # equator row (|y| ~ 0): dedicated closed form
    t0 = x2 * x2 + TPISQ * (x2 + HPISQ)
    lam0 = np.where(np.abs(x) <= TOL, 0.0,
                    0.5 * (x2 - PISQ + np.sqrt(t0))
                    / np.where(x == 0, 1.0, x))
    on_eq = ay < TOL
    phi = np.where(on_eq, 0.0, phi)
    lam = np.where(on_eq, lam0, lam)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def loxim_fwd(lon, lat, lat1=0.0, lon0=0.0, x0=0.0, y0=0.0):
    """Loximuthal (pj_loxim)."""
    EPS = 1e-8
    phi1 = np.deg2rad(lat1)
    cosphi1 = np.cos(phi1)
    tanphi1 = np.tan(np.pi / 4 + 0.5 * phi1)
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    y = phi - phi1
    t = np.pi / 4 + 0.5 * phi
    with np.errstate(invalid="ignore", divide="ignore"):
        x_gen = lam * y / np.log(np.tan(t) / tanphi1)
    x = np.where(np.abs(y) < EPS, lam * cosphi1,
                 np.where((np.abs(t) < EPS) |
                          (np.abs(np.abs(t) - np.pi / 2) < EPS),
                          0.0, x_gen))
    return x0 + R * x, y0 + R * y


def loxim_inv(x, y, lat1=0.0, lon0=0.0, x0=0.0, y0=0.0):
    EPS = 1e-8
    phi1 = np.deg2rad(lat1)
    cosphi1 = np.cos(phi1)
    tanphi1 = np.tan(np.pi / 4 + 0.5 * phi1)
    x = (np.asarray(x, float) - x0) / R
    y = (np.asarray(y, float) - y0) / R
    phi = y + phi1
    t = np.pi / 4 + 0.5 * phi
    with np.errstate(invalid="ignore", divide="ignore"):
        lam_gen = x * np.log(np.tan(t) / tanphi1) / \
            np.where(y == 0, 1.0, y)
    lam = np.where(np.abs(y) < EPS, x / cosphi1,
                   np.where((np.abs(t) < EPS) |
                            (np.abs(np.abs(t) - np.pi / 2) < EPS),
                            0.0, lam_gen))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def times_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    """Times Atlas (pj_times)."""
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    t = np.tan(phi / 2)
    s = np.sin(np.pi / 4 * t)
    return (x0 + R * lam * (0.74482 - 0.34588 * s * s),
            y0 + R * 1.70711 * t)


def times_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    x = (np.asarray(x, float) - x0) / R
    t = (np.asarray(y, float) - y0) / R / 1.70711
    s = np.sin(np.pi / 4 * t)
    lam = x / (0.74482 - 0.34588 * s * s)
    return np.rad2deg(lam) + lon0, np.rad2deg(2 * np.arctan(t))


def tcea_fwd(lon, lat, lat0=0.0, lon0=0.0, k0=1.0, x0=0.0, y0=0.0):
    """Transverse cylindrical equal-area (pj_tcea, spherical)."""
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    p0 = np.deg2rad(lat0)
    return (x0 + R * np.cos(phi) * np.sin(lam) / k0,
            y0 + R * k0 * (np.arctan2(np.tan(phi), np.cos(lam)) - p0))


def tcea_inv(x, y, lat0=0.0, lon0=0.0, k0=1.0, x0=0.0, y0=0.0):
    p0 = np.deg2rad(lat0)
    xs = (np.asarray(x, float) - x0) / R * k0
    ys = (np.asarray(y, float) - y0) / R / k0 + p0
    t = np.sqrt(np.maximum(1 - xs * xs, 0.0))
    phi = np.arcsin(np.clip(t * np.sin(ys), -1, 1))
    lam = np.arctan2(xs, t * np.cos(ys))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


_GOODE_Y_COR = 0.05280
_GOODE_PHI_LIM = 0.71093078197902358062


def _sinu_sph_fwd(lam, phi):
    return lam * np.cos(phi), phi


def goode_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    """Goode homolosine (pj_goode): sinusoidal inside |phi|<40d44',
    Mollweide (shifted by Y_COR) outside."""
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    sx, sy = lam * np.cos(phi), phi
    mx, my = moll_fwd(np.rad2deg(lam), np.asarray(lat, float))
    mx, my = np.asarray(mx, float) / R, np.asarray(my, float) / R
    my = my - np.where(phi > 0, _GOODE_Y_COR, -_GOODE_Y_COR)
    use_moll = np.abs(phi) >= _GOODE_PHI_LIM
    return (x0 + R * np.where(use_moll, mx, sx),
            y0 + R * np.where(use_moll, my, sy))


def goode_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    xs = (np.asarray(x, float) - x0) / R
    ys = (np.asarray(y, float) - y0) / R
    use_moll = np.abs(ys) > _GOODE_PHI_LIM
    # sinusoidal leg
    s_phi = ys
    with np.errstate(invalid="ignore", divide="ignore"):
        s_lam = xs / np.cos(s_phi)
    # mollweide leg (undo the Y_COR shift)
    ym = ys + np.where(ys > 0, _GOODE_Y_COR, -_GOODE_Y_COR)
    m_lon, m_lat = moll_inv(xs * R, ym * R)
    lam = np.where(use_moll, np.deg2rad(np.asarray(m_lon, float)),
                   s_lam)
    phi = np.where(use_moll, np.deg2rad(np.asarray(m_lat, float)),
                   s_phi)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


# --- national-grid ellipsoidal families -----------------------------------

def _gauss_ini(e, phi0):
    """pj_gauss_ini (conformal-sphere constants for sterea)."""
    es = e * e
    sphi, cphi = np.sin(phi0), np.cos(phi0)
    rc = np.sqrt(1 - es) / (1 - es * sphi * sphi)
    C = np.sqrt(1 + es * cphi ** 4 / (1 - es))
    chi = np.arcsin(sphi / C)
    ratexp = 0.5 * C * e
    K = np.tan(0.5 * chi + np.pi / 4) / (
        np.power(np.tan(0.5 * phi0 + np.pi / 4), C) *
        _srat(e * sphi, ratexp))
    return dict(e=e, K=K, C=C, chi=chi, ratexp=ratexp, rc=rc)


def _srat(esinp, exp_):
    return np.power((1 - esinp) / (1 + esinp), exp_)


def _gauss(phi, lam, en):
    return (2 * np.arctan(en["K"] *
                          np.power(np.tan(0.5 * phi + np.pi / 4),
                                   en["C"]) *
                          _srat(en["e"] * np.sin(phi), en["ratexp"]))
            - np.pi / 2,
            en["C"] * lam)


def _inv_gauss(phi, lam, en):
    lam = lam / en["C"]
    num = np.power(np.tan(0.5 * phi + np.pi / 4) / en["K"],
                   1 / en["C"])
    phi_i = _pel(phi,
                 lambda p, nm: 2 * np.arctan(
                     nm * _srat(en["e"] * np.sin(p),
                                -0.5 * en["e"])) - np.pi / 2,
                 1e-14, 20, consts=(num,), replace=True)
    return phi_i, lam


def sterea_fwd(lon, lat, lat0=0.0, lon0=0.0, k0=1.0, x0=0.0, y0=0.0,
               a=R, rf=1.0 / F_WGS84):
    """Oblique stereographic (pj_sterea — Gauss conformal sphere;
    the Dutch RD / EPSG 9809 projection)."""
    f = 1.0 / rf
    e = np.sqrt(f * (2 - f))
    p0 = np.deg2rad(lat0)
    en = _gauss_ini(e, p0)
    R2 = 2 * en["rc"]
    sinc0, cosc0 = np.sin(en["chi"]), np.cos(en["chi"])
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    cphi, clam = _gauss(phi, lam, en)
    sinc, cosc = np.sin(cphi), np.cos(cphi)
    cosl = np.cos(clam)
    k = k0 * R2 / (1 + sinc0 * sinc + cosc0 * cosc * cosl)
    return (x0 + a * k * cosc * np.sin(clam),
            y0 + a * k * (cosc0 * sinc - sinc0 * cosc * cosl))


def sterea_inv(x, y, lat0=0.0, lon0=0.0, k0=1.0, x0=0.0, y0=0.0,
               a=R, rf=1.0 / F_WGS84):
    f = 1.0 / rf
    e = np.sqrt(f * (2 - f))
    p0 = np.deg2rad(lat0)
    en = _gauss_ini(e, p0)
    R2 = 2 * en["rc"]
    sinc0, cosc0 = np.sin(en["chi"]), np.cos(en["chi"])
    xs = (np.asarray(x, float) - x0) / a / k0
    ys = (np.asarray(y, float) - y0) / a / k0
    rho = np.hypot(xs, ys)
    c = 2 * np.arctan2(rho, R2)
    sinc, cosc = np.sin(c), np.cos(c)
    with np.errstate(invalid="ignore", divide="ignore"):
        cphi = np.arcsin(np.clip(cosc * sinc0 + ys * sinc * cosc0 /
                                 rho, -1, 1))
        clam = np.arctan2(xs * sinc,
                          rho * cosc0 * cosc - ys * sinc0 * sinc)
    cphi = np.where(rho == 0, en["chi"], cphi)
    clam = np.where(rho == 0, 0.0, clam)
    phi, lam = _inv_gauss(cphi, clam, en)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def somerc_fwd(lon, lat, lat0=0.0, lon0=0.0, k0=1.0, x0=0.0, y0=0.0,
               a=R, rf=1.0 / F_WGS84):
    """Swiss oblique Mercator (pj_somerc)."""
    f = 1.0 / rf
    es = f * (2 - f)
    e = np.sqrt(es)
    one_es, rone_es = 1 - es, 1.0 / (1 - es)
    p0 = np.deg2rad(lat0)
    hlf_e = 0.5 * e
    cp = np.cos(p0) ** 2
    c = np.sqrt(1 + es * cp * cp * rone_es)
    sp = np.sin(p0)
    sinp0 = sp / c
    phip0 = np.arcsin(sinp0)
    cosp0 = np.cos(phip0)
    spe = sp * e
    K = (np.log(np.tan(np.pi / 4 + 0.5 * phip0)) -
         c * (np.log(np.tan(np.pi / 4 + 0.5 * p0)) -
              hlf_e * np.log((1 + spe) / (1 - spe))))
    kR = k0 * np.sqrt(one_es) / (1 - spe * spe)
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    s = e * np.sin(phi)
    phip = 2 * np.arctan(np.exp(
        c * (np.log(np.tan(np.pi / 4 + 0.5 * phi)) -
             hlf_e * np.log((1 + s) / (1 - s))) + K)) - np.pi / 2
    lamp = c * lam
    cpp = np.cos(phip)
    phipp = np.arcsin(np.clip(cosp0 * np.sin(phip) -
                              sinp0 * cpp * np.cos(lamp), -1, 1))
    lampp = np.arcsin(np.clip(cpp * np.sin(lamp) / np.cos(phipp),
                              -1, 1))
    return (x0 + a * kR * lampp,
            y0 + a * kR * np.log(np.tan(np.pi / 4 + 0.5 * phipp)))


def somerc_inv(x, y, lat0=0.0, lon0=0.0, k0=1.0, x0=0.0, y0=0.0,
               a=R, rf=1.0 / F_WGS84):
    f = 1.0 / rf
    es = f * (2 - f)
    e = np.sqrt(es)
    one_es, rone_es = 1 - es, 1.0 / (1 - es)
    p0 = np.deg2rad(lat0)
    hlf_e = 0.5 * e
    cp = np.cos(p0) ** 2
    c = np.sqrt(1 + es * cp * cp * rone_es)
    sp = np.sin(p0)
    sinp0 = sp / c
    phip0 = np.arcsin(sinp0)
    cosp0 = np.cos(phip0)
    spe = sp * e
    K = (np.log(np.tan(np.pi / 4 + 0.5 * phip0)) -
         c * (np.log(np.tan(np.pi / 4 + 0.5 * p0)) -
              hlf_e * np.log((1 + spe) / (1 - spe))))
    kR = k0 * np.sqrt(one_es) / (1 - spe * spe)
    xs = (np.asarray(x, float) - x0) / a
    ys = (np.asarray(y, float) - y0) / a
    phipp = 2 * (np.arctan(np.exp(ys / kR)) - np.pi / 4)
    lampp = xs / kR
    cpp = np.cos(phipp)
    phip = np.arcsin(np.clip(cosp0 * np.sin(phipp) +
                             sinp0 * cpp * np.cos(lampp), -1, 1))
    lamp = np.arcsin(np.clip(cpp * np.sin(lampp) / np.cos(phip),
                             -1, 1))
    con = (K - np.log(np.tan(np.pi / 4 + 0.5 * phip))) / c

    def step(ph, cn):
        esp = e * np.sin(ph)
        return -((cn + np.log(np.tan(np.pi / 4 + 0.5 * ph)) -
                  hlf_e * np.log((1 + esp) / (1 - esp))) *
                 (1 - esp * esp) * np.cos(ph) * rone_es)
    phip = _pel(phip, step, 1e-10, 6, consts=(con,))
    return np.rad2deg(lamp / c) + lon0, np.rad2deg(phip)


def krovak_fwd(lon, lat, lon0=None, lat0=None, k0=0.9999,
               czech=False, x0=0.0, y0=0.0):
    """Czech Krovak (pj_krovak) — fixed Bessel ellipsoid; default
    center 49d30'N / 24d50'E (42d30' east of Ferro)."""
    a_b, es = 6377397.155, 0.006674372230614
    e = np.sqrt(es)
    S45, S90 = 0.785398163397448, 1.570796326794896
    UQ, S0 = 1.04216856380474, 1.37008346281555
    phi0 = 0.863937979737193 if lat0 is None else np.deg2rad(lat0)
    lam0 = (0.7417649320975901 - 0.308341501185665) if lon0 is None \
        else np.deg2rad(lon0)
    sgn = 1.0 if czech else -1.0
    alpha = np.sqrt(1 + (es * np.cos(phi0) ** 4) / (1 - es))
    u0 = np.arcsin(np.sin(phi0) / alpha)
    g = np.power((1 + e * np.sin(phi0)) / (1 - e * np.sin(phi0)),
                 alpha * e / 2)
    kk = np.tan(u0 / 2 + S45) / np.power(np.tan(phi0 / 2 + S45),
                                         alpha) * g
    n0 = np.sqrt(1 - es) / (1 - es * np.sin(phi0) ** 2)
    n = np.sin(S0)
    rho0 = k0 * n0 / np.tan(S0)
    ad = S90 - UQ
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float)) - lam0)
    phi = np.deg2rad(np.asarray(lat, float))
    gfi = np.power((1 + e * np.sin(phi)) / (1 - e * np.sin(phi)),
                   alpha * e / 2)
    u = 2 * (np.arctan(kk * np.power(np.tan(phi / 2 + S45), alpha) /
                       gfi) - S45)
    deltav = -lam * alpha
    s = np.arcsin(np.clip(np.cos(ad) * np.sin(u) +
                          np.sin(ad) * np.cos(u) * np.cos(deltav),
                          -1, 1))
    d = np.arcsin(np.clip(np.cos(u) * np.sin(deltav) / np.cos(s),
                          -1, 1))
    eps = n * d
    rho = rho0 * np.power(np.tan(S0 / 2 + S45), n) / \
        np.power(np.tan(s / 2 + S45), n)
    return (x0 + a_b * sgn * rho * np.sin(eps),
            y0 + a_b * sgn * rho * np.cos(eps))


def krovak_inv(x, y, lon0=None, lat0=None, k0=0.9999,
               czech=False, x0=0.0, y0=0.0):
    a_b, es = 6377397.155, 0.006674372230614
    e = np.sqrt(es)
    S45, S90 = 0.785398163397448, 1.570796326794896
    UQ, S0 = 1.04216856380474, 1.37008346281555
    phi0 = 0.863937979737193 if lat0 is None else np.deg2rad(lat0)
    lam0 = (0.7417649320975901 - 0.308341501185665) if lon0 is None \
        else np.deg2rad(lon0)
    sgn = 1.0 if czech else -1.0
    alpha = np.sqrt(1 + (es * np.cos(phi0) ** 4) / (1 - es))
    u0 = np.arcsin(np.sin(phi0) / alpha)
    g = np.power((1 + e * np.sin(phi0)) / (1 - e * np.sin(phi0)),
                 alpha * e / 2)
    kk = np.tan(u0 / 2 + S45) / np.power(np.tan(phi0 / 2 + S45),
                                         alpha) * g
    n0 = np.sqrt(1 - es) / (1 - es * np.sin(phi0) ** 2)
    n = np.sin(S0)
    rho0 = k0 * n0 / np.tan(S0)
    ad = S90 - UQ
    # swap axes, apply czech sign (pj_krovak e_inv preamble)
    xs = (np.asarray(y, float) - y0) / a_b * sgn
    ys = (np.asarray(x, float) - x0) / a_b * sgn
    rho = np.hypot(xs, ys)
    eps = np.arctan2(ys, xs)
    d = eps / np.sin(S0)
    s = 2 * (np.arctan(np.power(rho0 / rho, 1 / n) *
                       np.tan(S0 / 2 + S45)) - S45)
    u = np.arcsin(np.clip(np.cos(ad) * np.sin(s) -
                          np.sin(ad) * np.cos(s) * np.cos(d), -1, 1))
    deltav = np.arcsin(np.clip(np.cos(s) * np.sin(d) / np.cos(u),
                               -1, 1))
    lam = -deltav / alpha
    fi1 = _pel(u,
               lambda f, uu: 2 * (np.arctan(
                   np.power(kk, -1 / alpha) *
                   np.power(np.tan(uu / 2 + S45), 1 / alpha) *
                   np.power((1 + e * np.sin(f)) /
                            (1 - e * np.sin(f)), e / 2)) - S45),
               1e-15, 30, consts=(u,), replace=True)
    return np.rad2deg(lam + lam0), np.rad2deg(fi1)


def poly_fwd(lon, lat, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0,
             a=R, rf=1.0 / F_WGS84):
    """American polyconic (pj_poly, ellipsoidal)."""
    TOL = 1e-10
    f = 1.0 / rf
    es = f * (2 - f)
    en = _enfn(es)
    p0 = np.deg2rad(lat0)
    ml0 = _mlfn(p0, np.sin(p0), np.cos(p0), en)
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    sp, cp = np.sin(phi), np.cos(phi)
    with np.errstate(invalid="ignore", divide="ignore"):
        ms = np.where(np.abs(cp) > TOL,
                      cp / np.sqrt(1 - es * sp * sp) / sp, 0.0)
        E = lam * sp
        x = ms * np.sin(E)
        y = (_mlfn(phi, sp, cp, en) - ml0) + ms * (1 - np.cos(E))
    on_eq = np.abs(phi) <= TOL
    x = np.where(on_eq, lam, x)
    y = np.where(on_eq, -ml0, y)
    return x0 + a * x, y0 + a * y


def poly_inv(x, y, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0,
             a=R, rf=1.0 / F_WGS84):
    TOL, ITOL = 1e-10, 1e-12
    f = 1.0 / rf
    es = f * (2 - f)
    one_es = 1 - es
    en = _enfn(es)
    p0 = np.deg2rad(lat0)
    ml0 = _mlfn(p0, np.sin(p0), np.cos(p0), en)
    xs = (np.asarray(x, float) - x0) / a
    ys = (np.asarray(y, float) - y0) / a + ml0
    r = ys * ys + xs * xs

    def step(phi, yy, rr):
        sp = np.sin(phi)
        cp = np.cos(phi)
        s2ph = sp * cp
        mlp = np.sqrt(1 - es * sp * sp)
        c = sp * mlp / cp
        ml = _mlfn(phi, sp, cp, en)
        mlb = ml * ml + rr
        mlp = one_es / (mlp * mlp * mlp)
        dphi = ((ml + ml + c * mlb - 2 * yy * (c * ml + 1)) /
                (es * s2ph * (mlb - 2 * yy * ml) / c +
                 2 * (yy - ml) * (c * mlp - 1 / s2ph) - mlp - mlp))
        return np.where(np.isfinite(dphi), dphi, 0.0)

    with np.errstate(invalid="ignore", divide="ignore"):
        phi = _pel(ys, step, ITOL, 20, consts=(ys, r), inclusive=True)
        c = np.sin(phi)
        lam = (np.arcsin(np.clip(xs * np.tan(phi) *
                                 np.sqrt(1 - es * c * c), -1, 1)) /
               np.sin(phi))
    on_eq = np.abs(ys) <= TOL
    phi = np.where(on_eq, 0.0, phi)
    lam = np.where(on_eq, xs, lam)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def bonne_fwd(lon, lat, lat1=None, lon0=0.0, x0=0.0, y0=0.0,
              a=R, rf=1.0 / F_WGS84):
    """Bonne (pj_bonne, ellipsoidal; lat_1 required non-zero)."""
    if lat1 is None or abs(lat1) < 1e-10:
        raise ValueError("+proj=bonne requires a non-zero +lat_1=")
    f = 1.0 / rf
    es = f * (2 - f)
    en = _enfn(es)
    phi1 = np.deg2rad(lat1)
    s1, c1 = np.sin(phi1), np.cos(phi1)
    m1 = _mlfn(phi1, s1, c1, en)
    am1 = c1 / (np.sqrt(1 - es * s1 * s1) * s1)
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    E, c = np.sin(phi), np.cos(phi)
    rh = am1 + m1 - _mlfn(phi, E, c, en)
    E = c * lam / (rh * np.sqrt(1 - es * E * E))
    return x0 + a * rh * np.sin(E), y0 + a * (am1 - rh * np.cos(E))


def bonne_inv(x, y, lat1=None, lon0=0.0, x0=0.0, y0=0.0,
              a=R, rf=1.0 / F_WGS84):
    if lat1 is None or abs(lat1) < 1e-10:
        raise ValueError("+proj=bonne requires a non-zero +lat_1=")
    f = 1.0 / rf
    es = f * (2 - f)
    en = _enfn(es)
    phi1 = np.deg2rad(lat1)
    s1, c1 = np.sin(phi1), np.cos(phi1)
    m1 = _mlfn(phi1, s1, c1, en)
    am1 = c1 / (np.sqrt(1 - es * s1 * s1) * s1)
    xs = (np.asarray(x, float) - x0) / a
    ys = am1 - (np.asarray(y, float) - y0) / a
    rh = np.hypot(xs, ys)
    phi = _inv_mlfn(am1 + m1 - rh, es, en)
    s = np.sin(phi)
    with np.errstate(invalid="ignore", divide="ignore"):
        lam = (rh * np.arctan2(xs, ys) *
               np.sqrt(1 - es * s * s) / np.cos(phi))
    lam = np.where(np.abs(np.abs(phi) - np.pi / 2) <= 1e-10, 0.0, lam)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def omerc_fwd(lon, lat, alpha=None, gamma=None, lonc=0.0,
              lat0=0.0, lon0=None, lat1=0.0, lon1=0.0, lat2=0.0,
              lon2=0.0, k0=1.0, no_rot=False, no_off=False,
              x0=0.0, y0=0.0, a=R, rf=1.0 / F_WGS84):
    """Hotine oblique Mercator (pj_omerc) — both the azimuth
    (+alpha/+gamma+lonc) and two-point (+lat_1/+lon_1/+lat_2/+lon_2)
    forms."""
    st = _omerc_setup(alpha, gamma, lonc, lat0, lat1, lon1, lat2,
                      lon2, k0, no_off, rf)
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float)) - st["lam0"])
    phi = np.deg2rad(np.asarray(lat, float))
    e = st["e"]
    B, E_, ArB, A = st["B"], st["E"], st["ArB"], st["A"]
    singam, cosgam = st["singam"], st["cosgam"]
    sinrot, cosrot = st["sinrot"], st["cosrot"]
    with np.errstate(invalid="ignore", divide="ignore"):
        W = E_ / np.power(_tsfn_e(phi, np.sin(phi), e), B)
        temp = 1.0 / W
        S = 0.5 * (W - temp)
        T = 0.5 * (W + temp)
        V = np.sin(B * lam)
        U = (S * singam - V * cosgam) / T
        v = 0.5 * ArB * np.log((1 - U) / (1 + U))
        temp = np.cos(B * lam)
        u = np.where(np.abs(temp) < 1e-7, A * lam,
                     ArB * np.arctan2(S * cosgam + V * singam, temp))
    polar = np.abs(np.abs(phi) - np.pi / 2) <= 1e-10
    v = np.where(polar, np.where(phi > 0, st["v_pole_n"],
                                 st["v_pole_s"]), v)
    u = np.where(polar, ArB * phi, u)
    if no_rot:
        x, y = u, v
    else:
        u = u - st["u_0"]
        x = v * cosrot + u * sinrot
        y = u * cosrot - v * sinrot
    return x0 + a * x, y0 + a * y


def omerc_inv(x, y, alpha=None, gamma=None, lonc=0.0,
              lat0=0.0, lon0=None, lat1=0.0, lon1=0.0, lat2=0.0,
              lon2=0.0, k0=1.0, no_rot=False, no_off=False,
              x0=0.0, y0=0.0, a=R, rf=1.0 / F_WGS84):
    st = _omerc_setup(alpha, gamma, lonc, lat0, lat1, lon1, lat2,
                      lon2, k0, no_off, rf)
    e = st["e"]
    B, E_, BrA, rB = st["B"], st["E"], st["BrA"], 1.0 / st["B"]
    singam, cosgam = st["singam"], st["cosgam"]
    sinrot, cosrot = st["sinrot"], st["cosrot"]
    xs = (np.asarray(x, float) - x0) / a
    ys = (np.asarray(y, float) - y0) / a
    if no_rot:
        v, u = ys, xs
    else:
        v = xs * cosrot - ys * sinrot
        u = ys * cosrot + xs * sinrot + st["u_0"]
    Qp = np.exp(-BrA * v)
    Sp = 0.5 * (Qp - 1 / Qp)
    Tp = 0.5 * (Qp + 1 / Qp)
    Vp = np.sin(BrA * u)
    Up = (Vp * cosgam + Sp * singam) / Tp
    with np.errstate(invalid="ignore", divide="ignore"):
        t = E_ / np.sqrt((1 + Up) / (1 - Up))
        phi = _phi2_e(np.power(t, 1.0 / B), e)
        lam = -rB * np.arctan2(Sp * cosgam - Vp * singam,
                               np.cos(BrA * u))
    on_pole = np.abs(np.abs(Up) - 1) < 1e-10
    phi = np.where(on_pole, np.where(Up < 0, -np.pi / 2, np.pi / 2),
                   phi)
    lam = np.where(on_pole, 0.0, lam)
    return np.rad2deg(lam + st["lam0"]), np.rad2deg(phi)


def _omerc_setup(alpha, gamma, lonc, lat0, lat1, lon1, lat2, lon2,
                 k0, no_off, rf):
    f = 1.0 / rf
    es = f * (2 - f)
    e = np.sqrt(es)
    one_es = 1 - es
    com = np.sqrt(one_es)
    phi0 = np.deg2rad(lat0)
    use_azimuth = alpha is not None or gamma is not None
    if not use_azimuth:
        p1, p2 = np.deg2rad(lat1), np.deg2rad(lat2)
        if (abs(p1 - p2) <= 1e-7 or abs(p1) <= 1e-7 or
                abs(abs(p1) - np.pi / 2) <= 1e-7 or
                abs(abs(phi0) - np.pi / 2) <= 1e-7 or
                abs(abs(p2) - np.pi / 2) <= 1e-7):
            raise ValueError("omerc: invalid two-point parameters")
    if abs(phi0) > 1e-10:
        sinph0, cosph0 = np.sin(phi0), np.cos(phi0)
        con = 1 - es * sinph0 * sinph0
        B = cosph0 * cosph0
        B = np.sqrt(1 + es * B * B / one_es)
        A = B * k0 * com / con
        D = B * com / (cosph0 * np.sqrt(con))
        F = D * D - 1
        F = 0.0 if F <= 0 else np.sqrt(F) * (1 if phi0 >= 0 else -1)
        E_ = F = F + D
        E_ = F * np.power(_tsfn_e(phi0, sinph0, e), B)
    else:
        B = 1 / com
        A = k0
        E_ = D = F = 1.0
    if use_azimuth:
        alpha_c = np.deg2rad(alpha) if alpha is not None else 0.0
        gam = np.deg2rad(gamma) if gamma is not None else None
        # PROJ/mproj use unclamped asin here; with +alpha=90 the
        # argument lands exactly at 1±1ulp depending on the libm, so
        # clamp to the domain (mproj's V8 trig happens to round <=1;
        # glibc rounds just above and would NaN the whole transform)
        if alpha is not None:
            gamma0 = np.arcsin(min(max(np.sin(alpha_c) / D, -1.0),
                                   1.0))
            if gam is None:
                gam = alpha_c
        else:
            gamma0 = gam
            alpha_c = np.arcsin(min(max(D * np.sin(gamma0), -1.0),
                                    1.0))
        lam0 = np.deg2rad(lonc) - np.arcsin(
            min(max(0.5 * (F - 1 / F) * np.tan(gamma0), -1.0),
                1.0)) / B
    else:
        l1, l2 = np.deg2rad(lon1), np.deg2rad(lon2)
        H = np.power(_tsfn_e(p1, np.sin(p1), e), B)
        L = np.power(_tsfn_e(p2, np.sin(p2), e), B)
        F = E_ / H
        p = (L - H) / (L + H)
        J = E_ * E_
        J = (J - L * H) / (J + L * H)
        con = l1 - l2
        if con < -np.pi:
            l2 -= 2 * np.pi
        elif con > np.pi:
            l2 += 2 * np.pi
        lam0 = _adjlon(0.5 * (l1 + l2) - np.arctan(
            J * np.tan(0.5 * B * (l1 - l2)) / p) / B)
        gamma0 = np.arctan(2 * np.sin(B * _adjlon(l1 - lam0)) /
                           (F - 1 / F))
        gam = alpha_c = np.arcsin(D * np.sin(gamma0))
    singam, cosgam = np.sin(gamma0), np.cos(gamma0)
    sinrot, cosrot = np.sin(gam), np.cos(gam)
    rB = 1.0 / B
    ArB = A * rB
    BrA = 1.0 / ArB
    if no_off:
        u_0 = 0.0
    else:
        u_0 = abs(ArB * np.arctan(np.sqrt(D * D - 1) /
                                  np.cos(alpha_c)))
        if phi0 < 0:
            u_0 = -u_0
    Fh = 0.5 * gamma0
    v_pole_n = ArB * np.log(np.tan(np.pi / 4 - Fh))
    v_pole_s = ArB * np.log(np.tan(np.pi / 4 + Fh))
    return dict(e=e, B=B, A=A, E=E_, ArB=ArB, BrA=BrA, lam0=lam0,
                singam=singam, cosgam=cosgam, sinrot=sinrot,
                cosrot=cosrot, u_0=u_0, v_pole_n=v_pole_n,
                v_pole_s=v_pole_s)


def _adjlon(lam):
    while lam < -np.pi:
        lam += 2 * np.pi
    while lam > np.pi:
        lam -= 2 * np.pi
    return lam


_NZMG_BF = np.array([[0.7557853228, 0.0],
                     [0.249204646, 0.003371507],
                     [-0.001541739, 0.041058560],
                     [-0.10162907, 0.01727609],
                     [-0.26623489, -0.36249218],
                     [-0.6870983, -1.1651967]])
_NZMG_TPHI = np.array([1.5627014243, 0.5185406398, -0.03333098,
                       -0.1052906, -0.0368594, 0.007317, 0.01220,
                       0.00394, -0.0013])
_NZMG_TPSI = np.array([0.6399175073, -0.1358797613, 0.063294409,
                       -0.02526853, 0.0117879, -0.0055161, 0.0026906,
                       -0.001333, 0.00067, -0.00034])


def _zpoly1(zr, zi, C):
    r = np.full_like(zr, C[-1][0])
    i = np.full_like(zr, C[-1][1])
    for n in range(len(C) - 2, -1, -1):
        t = r
        r = C[n][0] + zr * t - zi * i
        i = C[n][1] + zr * i + zi * t
    return zr * r - zi * i, zr * i + zi * r


def _zpolyd1(zr, zi, C):
    ar = br = np.full_like(zr, C[-1][0])
    ai = bi = np.full_like(zr, C[-1][1])
    first = True
    for n in range(len(C) - 2, -1, -1):
        if first:
            first = False
        else:
            t = br
            br = ar + zr * t - zi * bi
            bi = ai + zr * bi + zi * t
        t = ar
        ar = C[n][0] + zr * t - zi * ai
        ai = C[n][1] + zr * ai + zi * t
    der_r = ar + zr * br - zi * bi
    der_i = ai + zr * bi + zi * br
    return (zr * ar - zi * ai, zr * ai + zi * ar, der_r, der_i)


def nzmg_fwd(lon, lat, x0=None, y0=None):
    """New Zealand Map Grid (pj_nzmg) — fixed International ellipsoid
    a=6378388, origin 173E/41S, FE 2510000 / FN 6023150."""
    a_i = 6378388.0
    x0 = 2510000.0 if x0 is None else x0
    y0 = 6023150.0 if y0 is None else y0
    RAD_TO_SEC5 = 2.062648062470963551564733573
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float)) - np.deg2rad(173.0))
    phi = (np.deg2rad(np.asarray(lat, float)) -
           np.deg2rad(-41.0)) * RAD_TO_SEC5
    p = np.full_like(phi, _NZMG_TPSI[-1])
    for i in range(len(_NZMG_TPSI) - 2, -1, -1):
        p = _NZMG_TPSI[i] + phi * p
    p = p * phi
    zr, zi = _zpoly1(p, lam, _NZMG_BF)
    return x0 + a_i * zi, y0 + a_i * zr


def nzmg_inv(x, y, x0=None, y0=None):
    a_i = 6378388.0
    x0 = 2510000.0 if x0 is None else x0
    y0 = 6023150.0 if y0 is None else y0
    SEC5_TO_RAD = 0.4848136811095359935899141023
    pr = (np.asarray(y, float) - y0) / a_i
    pi = (np.asarray(x, float) - x0) / a_i
    yr = np.atleast_1d(pr).copy()
    yi = np.atleast_1d(pi).copy()
    prf = np.atleast_1d(pr)
    pif = np.atleast_1d(pi)
    act = np.arange(yr.size)        # per-element Newton (see _pel)
    for _ in range(20):
        fr, fi, dr, di = _zpolyd1(yr[act], yi[act], _NZMG_BF)
        fr = fr - prf[act]
        fi = fi - pif[act]
        den = dr * dr + di * di
        ddr = -(fr * dr + fi * di) / den
        ddi = -(fi * dr - fr * di) / den
        yr[act] = yr[act] + ddr
        yi[act] = yi[act] + ddi
        act = act[np.abs(ddr) + np.abs(ddi) > 1e-10]
        if act.size == 0:
            break
    if np.ndim(pr) == 0:
        yr, yi = yr[0], yi[0]
    lam = yi
    phi = np.full_like(yr, _NZMG_TPHI[-1])
    for i in range(len(_NZMG_TPHI) - 2, -1, -1):
        phi = _NZMG_TPHI[i] + yr * phi
    phi = np.deg2rad(-41.0) + yr * phi * SEC5_TO_RAD
    return (np.rad2deg(lam) + 173.0, np.rad2deg(phi))


# ---------------------------------------------------------------------------
# minimal ESRI .prj WKT → (fwd, inv) — enough for the reference's
# shapefile fixtures (GEOGCS passthrough + Transverse_Mercator /
# Gauss_Kruger zones on any spheroid + ellipsoidal Mercator); the
# reference parses .prj through mproj's wkt_to_proj4
# (src/crs/mapshaper-projections.js parsePrj)

def parse_prj(text: str):
    """ESRI WKT → (fwd, inv) callables, or None when unsupported.
    GEOGCS-only = latlong (identity)."""
    import functools
    import re
    t = text.strip()
    if t.startswith("GEOGCS"):
        return (_identity, _identity)
    if not t.startswith("PROJCS"):
        return None
    m = re.search(r'PROJECTION\["([^"]+)"\]', t)
    if not m:
        return None
    proj_name = m.group(1).lower()
    params = {k.lower(): float(v) for k, v in
              re.findall(r'PARAMETER\["([^"]+)",([-\d.eE+]+)\]', t)}
    sph = re.search(r'SPHEROID\["[^"]*",([-\d.eE+]+),([-\d.eE+]+)', t)
    a, rf = (float(sph.group(1)), float(sph.group(2))) if sph else \
        (R, 1.0 / F_WGS84)
    common = dict(lon0=params.get("central_meridian", 0.0),
                  x0=params.get("false_easting", 0.0),
                  y0=params.get("false_northing", 0.0),
                  a=a, rf=rf)
    if proj_name in ("gauss_kruger", "transverse_mercator"):
        kw = dict(lat0=params.get("latitude_of_origin", 0.0),
                  k0=params.get("scale_factor", 1.0), **common)
        return (functools.partial(tmerc_fwd, **kw),
                functools.partial(tmerc_inv, **kw))
    if proj_name in ("mercator", "mercator_1sp"):
        kw = dict(lat_ts=params.get("standard_parallel_1", 0.0),
                  k0=params.get("scale_factor"), **common)
        return (functools.partial(merc_ell_fwd, **kw),
                functools.partial(merc_ell_inv, **kw))
    # a/rf-parameterized national-grid families (EPSG method names):
    # Oblique_Stereographic = EPSG 9809 double stereographic (RD New)
    # — the sterea kernel, NOT plain stere
    if proj_name in ("oblique_stereographic", "double_stereographic"):
        kw = dict(lat0=params.get("latitude_of_center",
                                  params.get("latitude_of_origin",
                                             0.0)),
                  k0=params.get("scale_factor", 1.0), **common)
        return (functools.partial(sterea_fwd, **kw),
                functools.partial(sterea_inv, **kw))
    if proj_name in ("swiss_oblique_mercator",
                     "swiss_oblique_cylindrical"):
        kw = dict(lat0=params.get("latitude_of_center",
                                  params.get("latitude_of_origin",
                                             0.0)),
                  k0=params.get("scale_factor", 1.0), **common)
        kw["lon0"] = params.get("longitude_of_center", kw["lon0"])
        return (functools.partial(somerc_fwd, **kw),
                functools.partial(somerc_inv, **kw))
    if proj_name in ("oblique_mercator",
                     "hotine_oblique_mercator",
                     "hotine_oblique_mercator_azimuth_natural_origin",
                     "hotine_oblique_mercator_azimuth_center"):
        # variant A (natural origin, Hotine_*) drops the u_0 offset
        # (+no_uoff); variant B (Oblique_Mercator / azimuth_center)
        # keeps it — GDAL's mapping.  mproj's own simple WKT maker
        # emits lonc as central_meridian, so accept both spellings.
        kw = dict(lat0=params.get("latitude_of_center", 0.0),
                  lonc=params.get("longitude_of_center",
                                  params.get("central_meridian", 0.0)),
                  alpha=params.get("azimuth", 0.0),
                  gamma=params.get("rectified_grid_angle", None),
                  k0=params.get("scale_factor", 1.0),
                  no_off=proj_name not in
                  ("hotine_oblique_mercator_azimuth_center",
                   "oblique_mercator"),
                  x0=common["x0"], y0=common["y0"],
                  a=a, rf=rf)
        if kw["gamma"] is None:
            del kw["gamma"]
        return (functools.partial(omerc_fwd, **kw),
                functools.partial(omerc_inv, **kw))
    if proj_name == "krovak":
        kw = dict(lat0=params.get("latitude_of_center", None),
                  lon0=params.get("longitude_of_center", None),
                  k0=params.get("scale_factor", 0.9999),
                  x0=common["x0"], y0=common["y0"])
        return (functools.partial(krovak_fwd, **kw),
                functools.partial(krovak_inv, **kw))
    if proj_name in ("polyconic", "american_polyconic"):
        kw = dict(lat0=params.get("latitude_of_center",
                                  params.get("latitude_of_origin",
                                             0.0)),
                  **common)
        return (functools.partial(poly_fwd, **kw),
                functools.partial(poly_inv, **kw))
    if proj_name == "bonne":
        kw = dict(lat1=params.get("standard_parallel_1", 0.0),
                  **common)
        return (functools.partial(bonne_fwd, **kw),
                functools.partial(bonne_inv, **kw))
    if proj_name == "new_zealand_map_grid":
        kw = dict(x0=params.get("false_easting", None),
                  y0=params.get("false_northing", None))
        return (functools.partial(nzmg_fwd, **kw),
                functools.partial(nzmg_inv, **kw))

    # families below bind the WGS84 ellipsoid (like the alias kernels);
    # a non-WGS84 spheroid would silently project wrong — refuse it
    if abs(a - R) > 1e-6 or abs(rf - 1.0 / F_WGS84) > 1e-6:
        return None
    x0 = params.get("false_easting", 0.0)
    y0 = params.get("false_northing", 0.0)

    def _offset(fwd, inv):
        if not (x0 or y0):
            return fwd, inv
        f2 = (lambda lon, lat: (lambda xy: (xy[0] + x0, xy[1] + y0))(
            fwd(lon, lat)))
        i2 = (lambda x, y: inv(np.asarray(x, float) - x0,
                               np.asarray(y, float) - y0)) \
            if inv else None
        return f2, i2

    lon0 = params.get("central_meridian",
                      params.get("longitude_of_center", 0.0))
    lat0c = params.get("latitude_of_center",
                       params.get("latitude_of_origin", 0.0))
    if proj_name in ("albers_conic_equal_area", "albers"):
        kw = dict(lat1=params.get("standard_parallel_1", 0.0),
                  lat2=params.get("standard_parallel_2", 0.0),
                  lat0=lat0c, lon0=lon0)
        return _offset(functools.partial(albers_fwd, **kw),
                       functools.partial(albers_inv, **kw))
    if proj_name in ("lambert_conformal_conic",
                     "lambert_conformal_conic_2sp") and \
            "standard_parallel_1" in params:
        kw = dict(lat1=params["standard_parallel_1"],
                  lat2=params.get("standard_parallel_2",
                                  params["standard_parallel_1"]),
                  lat0=params.get("latitude_of_origin", 0.0),
                  lon0=lon0)
        return _offset(functools.partial(lcc_fwd, **kw),
                       functools.partial(lcc_inv, **kw))
    if proj_name in ("polar_stereographic", "stereographic_north_pole",
                     "stereographic_south_pole"):
        # geotiff convention: latitude_of_origin is the true-scale
        # parallel; the pole is its hemisphere's
        lat_ts = params.get("latitude_of_origin",
                            params.get("standard_parallel_1", 90.0))
        kw = dict(lat0=90.0 if lat_ts >= 0 else -90.0, lat_ts=lat_ts,
                  lon0=lon0, k0=params.get("scale_factor", 1.0),
                  x0=x0, y0=y0)
        return (functools.partial(stere_fwd, **kw),
                functools.partial(stere_inv, **kw))
    if proj_name in ("stereographic", "oblique_stereographic"):
        kw = dict(lat0=params.get("latitude_of_origin", 0.0),
                  lon0=lon0, k0=params.get("scale_factor", 1.0),
                  x0=x0, y0=y0)
        return (functools.partial(stere_fwd, **kw),
                functools.partial(stere_inv, **kw))
    if proj_name == "lambert_azimuthal_equal_area":
        kw = dict(lat0=lat0c, lon0=lon0, x0=x0, y0=y0)
        return (functools.partial(laea_fwd, **kw),
                functools.partial(laea_inv, **kw))
    if proj_name == "equidistant_conic" and \
            "standard_parallel_1" in params:
        kw = dict(lat1=params["standard_parallel_1"],
                  lat2=params.get("standard_parallel_2",
                                  params["standard_parallel_1"]),
                  lat0=params.get("latitude_of_origin", 0.0),
                  lon0=lon0, x0=x0, y0=y0)
        return (functools.partial(eqdc_fwd, **kw),
                functools.partial(eqdc_inv, **kw))
    if proj_name in ("equirectangular", "plate_carree",
                     "equidistant_cylindrical"):
        kw = dict(lat_ts=params.get("standard_parallel_1", 0.0))
        return _offset(functools.partial(eqc_fwd, **kw),
                       functools.partial(eqc_inv, **kw))
    if proj_name == "sinusoidal":
        return _offset(functools.partial(sinusoidal_fwd, lon0=lon0),
                       None)
    if proj_name == "robinson":
        return _offset(functools.partial(robinson_fwd, lon0=lon0),
                       None)
    if proj_name in ("cassini_soldner", "cassini"):
        kw = dict(lat0=params.get("latitude_of_origin", 0.0),
                  lon0=lon0, x0=x0, y0=y0)
        return (functools.partial(cass_fwd, **kw),
                functools.partial(cass_inv, **kw))
    if proj_name == "mollweide":
        return _offset(functools.partial(moll_fwd, lon0=lon0),
                       functools.partial(moll_inv, lon0=lon0))
    if proj_name == "miller_cylindrical":
        return _offset(functools.partial(mill_fwd, lon0=lon0),
                       functools.partial(mill_inv, lon0=lon0))
    if proj_name == "gall_stereographic":
        return _offset(functools.partial(gall_fwd, lon0=lon0),
                       functools.partial(gall_inv, lon0=lon0))
    if proj_name == "cylindrical_equal_area":
        kw = dict(lat_ts=params.get("standard_parallel_1", 0.0),
                  lon0=lon0, x0=x0, y0=y0)
        return (functools.partial(cea_fwd, **kw),
                functools.partial(cea_inv, **kw))
    # round-3 world families (spherical on the WGS84 radius)
    _sph = {"van_der_grinten_i": (vandg_fwd, vandg_inv),
            "vandergrinten": (vandg_fwd, vandg_inv),
            "eckert_i": (eck1_fwd, eck1_inv),
            "eckert_ii": (eck2_fwd, eck2_inv),
            "eckert_iii": (eck3_fwd, eck3_inv),
            "eckert_iv": (eck4_fwd, eck4_inv),
            "eckert_v": (eck5_fwd, eck5_inv),
            "eckert_vi": (eck6_fwd, eck6_inv),
            "hammer_aitoff": (hammer_fwd, hammer_inv),
            "aitoff": (aitoff_fwd, aitoff_inv),
            "natural_earth": (natearth_fwd, natearth_inv),
            "goode_homolosine": (goode_fwd, goode_inv),
            "times": (times_fwd, times_inv)}
    if proj_name in _sph:
        f, i = _sph[proj_name]
        return _offset(functools.partial(f, lon0=lon0),
                       functools.partial(i, lon0=lon0))
    if proj_name == "winkel_tripel":
        kw = dict(lat1=params.get("standard_parallel_1", None),
                  lon0=lon0, x0=x0, y0=y0)
        if kw["lat1"] is None:
            del kw["lat1"]
        return (functools.partial(wintri_fwd, **kw),
                functools.partial(wintri_inv, **kw))
    if proj_name == "loximuthal":
        kw = dict(lat1=params.get("central_parallel",
                                  params.get("standard_parallel_1",
                                             0.0)),
                  lon0=lon0, x0=x0, y0=y0)
        return (functools.partial(loxim_fwd, **kw),
                functools.partial(loxim_inv, **kw))
    if proj_name == "orthographic":
        kw = dict(lat0=params.get("latitude_of_origin",
                                  params.get("latitude_of_center",
                                             0.0)),
                  lon0=lon0, x0=x0, y0=y0)
        return (functools.partial(ortho_fwd, **kw),
                functools.partial(ortho_inv, **kw))
    if proj_name == "gnomonic":
        kw = dict(lat0=params.get("latitude_of_origin",
                                  params.get("latitude_of_center",
                                             0.0)),
                  lon0=lon0, x0=x0, y0=y0)
        return (functools.partial(gnom_fwd, **kw),
                functools.partial(gnom_inv, **kw))
    if proj_name == "azimuthal_equidistant":
        lat0v = params.get("latitude_of_center",
                           params.get("latitude_of_origin", 0.0))
        if abs(abs(lat0v) - 90.0) > 1e-9:
            # only the polar aeqd kernels exist (aeqd_fwd raises on
            # oblique); reject at parse time so the caller gets the
            # clean "unsupported .prj projection" error, not a
            # NotImplementedError inside a map_batches worker
            return None
        kw = dict(lat0=lat0v, lon0=lon0, x0=x0, y0=y0)
        return (functools.partial(aeqd_fwd, **kw),
                functools.partial(aeqd_inv, **kw))
    return None


# exact .prj strings the reference CLI emits for its projection
# aliases (captured live: `-proj webmercator/robinson/wgs84 -o`); the
# reference generates these through mproj's proj4→WKT converter
_GEOGCS_WGS84 = ('GEOGCS["WGS84",DATUM["WGS_1984",SPHEROID["WGS 84",'
                 '6378137,298.257223563]],PRIMEM["Greenwich",0],'
                 'UNIT["degree",0.017453292519943295]]')
_GEOGCS_UNK = ('GEOGCS["UNK",DATUM["Unknown datum",SPHEROID["WGS 84",'
               '6378137,298.257223563]],PRIMEM["Greenwich",0],'
               'UNIT["degree",0.017453292519943295]]')
_WKT_PROJ_NAMES = {"merc": "Mercator_1SP", "robin": "Robinson",
                   "tmerc": "Transverse_Mercator",
                   "aea": "Albers_Conic_Equal_Area",
                   "lcc": "Lambert_Conformal_Conic_2SP",
                   "eqc": "Equirectangular", "sinu": "Sinusoidal"}
_ALIAS_PROJ4 = {"webmercator": None,  # special EPSG:3857 title below
                "merc": "merc", "mercator": "merc",
                "robinson": "robin", "robin": "robin",
                "albers": "aea", "aea": "aea", "lcc": "lcc",
                "eqc": "eqc", "sinu": "sinu", "sinusoidal": "sinu",
                "tmerc": "tmerc"}


def wkt_for_defn(defn: str) -> str | None:
    """Projection defn string → the .prj WKT the reference CLI writes
    for it (aliases carry +datum=WGS84, bare +proj strings are 'UNK')."""
    d = defn.strip()
    if d in ("wgs84", "longlat", "latlong", "+proj=longlat"):
        return _GEOGCS_WGS84
    if d == "webmercator":
        return ('PROJCS["WGS 84 / Pseudo-Mercator",' + _GEOGCS_WGS84 +
                ',PROJECTION["Mercator_1SP"],UNIT["Meter",1]]')
    datum_wgs84 = not d.startswith("+") or "+datum=WGS84" in d
    if d.startswith("+"):
        parts = dict(p.split("=", 1) if "=" in p else (p, "")
                     for p in d.replace("+", " ").split())
        p4 = parts.get("proj", "")
        if p4 == "utm":
            zone = int(parts["zone"])
            hemi = "S" if "south" in parts else "N"
            geog = _GEOGCS_WGS84 if datum_wgs84 else _GEOGCS_UNK
            title = "WGS84" if datum_wgs84 else "UNK"
            return (f'PROJCS["{title} / UTM zone {zone}{hemi}",{geog},'
                    f'PROJECTION["Transverse_Mercator"],'
                    f'PARAMETER["latitude_of_origin",0],'
                    f'PARAMETER["central_meridian",{zone * 6 - 183}],'
                    f'PARAMETER["scale_factor",0.9996],'
                    f'PARAMETER["false_easting",500000],'
                    f'PARAMETER["false_northing",'
                    f'{10000000 if hemi == "S" else 0}],'
                    f'UNIT["Meter",1]]')
        made = _wkt_make_parametered(d, parts, p4, datum_wgs84)
        if made is not None:
            return made
    else:
        p4 = _ALIAS_PROJ4.get(d)
    name = _WKT_PROJ_NAMES.get(p4 or "")
    if name is None and p4 in _WKT_MAKER:
        # bare (parameterless) +proj= of any maker family emits the
        # maker's PROJECTION name with no PARAMETER list (live-verified
        # for laea/cass/moll/cea/mill/gall/vandg/ortho/... )
        name = _WKT_MAKER[p4][0]
    if name is None:
        return None
    geog, title = (_GEOGCS_WGS84, "WGS84") if datum_wgs84 else \
        (_GEOGCS_UNK, "UNK")
    if p4 == "nzmg":
        # mproj copies P.a (nzmg forces the International-1924 major
        # axis) into the SPHEROID while keeping the WGS84 rf —
        # live-verified byte shape
        geog = geog.replace("6378137,", "6378388,")
    return (f'PROJCS["{title} / {name}",{geog},'
            f'PROJECTION["{name}"],UNIT["Meter",1]]')


# mproj's proj4→WKT parameter rules (www/modules.js wkt_param_table +
# wkt_common_params + the add_simple_wkt_maker registry): per family,
# projection-specific rules first, then the common tail; a None target
# DROPS the parameter (e.g. polar stere's lat_0).  Parameters emit in
# their order of appearance in the +proj string, exactly as the
# reference's maker walks P.params.
_WKT_COMMON_RULES = [("x_0", "false_easting"), ("y_0", "false_northing"),
                     ("k_0", "scale_factor"), ("k", "scale_factor"),
                     ("lat_0", "latitude_of_center"),
                     ("lon_0", "central_meridian")]
_WKT_MAKER = {
    "aea": ("Albers_Conic_Equal_Area",
            [("lat_1", "standard_parallel_1"),
             ("lat_2", "standard_parallel_2")]),
    "eqdc": ("Equidistant_Conic",
             [("lat_1", "standard_parallel_1"),
              ("lat_2", "standard_parallel_2")]),
    "laea": ("Lambert_Azimuthal_Equal_Area", []),
    "lcc": ("Lambert_Conformal_Conic_2SP",
            [("lat_1", "standard_parallel_1"),
             ("lat_2", "standard_parallel_2"),
             ("lat_0", "latitude_of_origin")]),
    "tmerc": ("Transverse_Mercator", [("lat_0", "latitude_of_origin")]),
    "etmerc": ("Transverse_Mercator",
               [("lat_0", "latitude_of_origin")]),
    "eqc": ("Equirectangular", [("lat_ts", "standard_parallel_1")]),
    "sinu": ("Sinusoidal", []),
    "robin": ("Robinson", []),
    "cass": ("Cassini_Soldner", [("lat_0", "latitude_of_origin")]),
    "aeqd": ("Azimuthal_Equidistant", [("lat_0", "latitude_of_center")]),
    "moll": ("Mollweide", []),
    "mill": ("Miller_Cylindrical", []),
    "gall": ("Gall_Stereographic", []),
    "cea": ("Cylindrical_Equal_Area",
            [("lat_ts", "standard_parallel_1")]),
    # round-3 families — names/param mappings captured from the live
    # reference CLI (mproj add_simple_wkt_maker table); families the
    # reference writes NO .prj for (krovak, goode, natearth, hammer,
    # aitoff, somerc, times, tcea, kav7) are deliberately absent
    "sterea": ("Oblique_Stereographic", []),
    "poly": ("Polyconic", []),
    "bonne": ("Bonne", [("lat_1", "standard_parallel_1")]),
    "loxim": ("Loximuthal", [("lat_1", "standard_parallel_1")]),
    "wintri": ("Winkel_Tripel", [("lat_1", "standard_parallel_1")]),
    "ortho": ("Orthographic", [("lat_0", "latitude_of_origin")]),
    "gnom": ("Gnomonic", []),
    "nzmg": ("New_Zealand_Map_Grid",
             [("lat_0", "latitude_of_origin")]),
    "eck1": ("Eckert_I", []),
    "eck2": ("Eckert_II", []),
    "eck3": ("Eckert_III", []),
    "eck4": ("Eckert_IV", []),
    "eck5": ("Eckert_V", []),
    "eck6": ("Eckert_VI", []),
    "vandg": ("VanDerGrinten", []),
}


def _wkt_make_parametered(defn: str, parts: dict, p4: str,
                          datum_wgs84: bool) -> str | None:
    """proj4 string WITH parameters → the reference's .prj WKT
    (captured live and matched byte-for-byte in
    tests/test_reference_cli_parity.py).  Returns None for families
    the reference's mproj cannot emit either (oblique stere crashes
    there — parity includes writing NO .prj)."""
    from ..sources.jsnum import js_number_str
    skip = {"proj", "datum", "ellps", "units", "no_defs", "south",
            "zone", "a", "b", "rf", "towgs84"}
    if p4 == "merc":
        name = "Mercator_2SP" if "lat_ts" in parts else "Mercator_1SP"
        rules = [("lat_ts", "standard_parallel_1")]
    elif p4 == "stere":
        if "lat_ts" not in parts:
            return None   # reference mproj fails on oblique stere too
        name = "Polar_Stereographic"
        rules = [("lat_ts", "latitude_of_origin"), ("lat_0", None)]
    elif p4 == "omerc":
        # mproj: +no_uoff/+no_off (variant A, natural origin) emits
        # Hotine_Oblique_Mercator; the offset form (variant B) emits
        # Oblique_Mercator — both with the azimuth parameter set
        name = ("Hotine_Oblique_Mercator"
                if ("no_uoff" in parts or "no_off" in parts)
                else "Oblique_Mercator")
        rules = [("lonc", "central_meridian"),
                 ("alpha", "azimuth"),
                 ("gamma", "rectified_grid_angle")]
    elif p4 == "aeqd" and "guam" in parts:
        # WKT has no guam-mode parameter; writing plain
        # Azimuthal_Equidistant would silently round-trip to the
        # (unsupported oblique) non-guam projection — emit no .prj
        return None
    elif p4 in _WKT_MAKER:
        name, rules = _WKT_MAKER[p4]
    else:
        return None
    rules = rules + _WKT_COMMON_RULES
    params_out = []
    for key, val in parts.items():
        if key in skip:
            continue
        rule = next((r for r in rules if r[0] == key), None)
        if rule is None or rule[1] is None:
            continue
        params_out.append(
            f'PARAMETER["{rule[1]}",{js_number_str(float(val))}]')
    if not params_out:
        return None       # bare +proj falls back to the alias shape
    geog, title = (_GEOGCS_WGS84, "WGS84") if datum_wgs84 else \
        (_GEOGCS_UNK, "UNK")
    return (f'PROJCS["{title} / {name}",{geog},'
            f'PROJECTION["{name}"],' + ",".join(params_out) +
            ',UNIT["Meter",1]]')


# ---------------------------------------------------------------------------
# round-4 long-tail batch: the remaining mproj spherical families
# (pseudocylindricals + misc-spherical), ported from the public mproj /
# PROJ.4 formulas (mproj pj_* kernels; PROJ PJ_*.c) as vectorized numpy.
# Same conventions as the round-3 batch: degrees in/out, R (= a of
# WGS84; mproj forces es=0 on these families but keeps a) scaling,
# _wrap_lam for pj_fwd's adjlon, per-element iteration via _pel so
# results are partition-invariant.

def _aasin(v):
    """mproj aasin: clamp |v| slightly past 1 instead of NaN."""
    return np.arcsin(np.clip(v, -1.0, 1.0))


def _pel_fail(cur, step, tol, iters, consts=()):
    """_pel + mproj's ``if (!i)`` fallback detection: returns
    (result, failed) where ``failed`` marks elements whose delta was
    still >= tol after the full iteration budget (the reference then
    substitutes a pole value, family-specific)."""
    arr = np.atleast_1d(np.asarray(cur, dtype=float)).copy()
    shp = arr.shape
    flat = arr.ravel()
    cs = [np.broadcast_to(np.asarray(c), shp).ravel() for c in consts]
    act = np.arange(flat.size)
    for _ in range(iters):
        if act.size == 0:
            break
        d = step(flat[act], *[c[act] for c in cs])
        flat[act] = flat[act] + d
        act = act[np.abs(d) >= tol]
    failed = np.zeros(flat.size, dtype=bool)
    failed[act] = True
    return flat.reshape(shp), failed.reshape(shp)


def _ll(lon, lat, lon0):
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    return lam, phi


# --- closed-form pseudocylindricals (pj_putp3/putp5, pj_wag3, pj_wink1,
#     pj_crast, pj_denoy, pj_gins8, pj_wag2, pj_urmfps/pj_wag1, pj_sts
#     family, pj_putp4p/pj_weren, pj_mbt_fpp) -------------------------

def _putp3_fwd(lon, lat, A, lon0=0.0, x0=0.0, y0=0.0):
    C = 0.79788456
    lam, phi = _ll(lon, lat, lon0)
    return (x0 + R * C * lam * (1 - A * phi * phi), y0 + R * C * phi)


def _putp3_inv(x, y, A, lon0=0.0, x0=0.0, y0=0.0):
    C = 0.79788456
    phi = (np.asarray(y, float) - y0) / R / C
    lam = (np.asarray(x, float) - x0) / R / (C * (1 - A * phi * phi))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


_RPISQ = 0.1013211836


def putp3_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    return _putp3_fwd(lon, lat, 4 * _RPISQ, lon0, x0, y0)


def putp3_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    return _putp3_inv(x, y, 4 * _RPISQ, lon0, x0, y0)


def putp3p_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    return _putp3_fwd(lon, lat, 2 * _RPISQ, lon0, x0, y0)


def putp3p_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    return _putp3_inv(x, y, 2 * _RPISQ, lon0, x0, y0)


def _putp5_fwd(lon, lat, A, B, lon0=0.0, x0=0.0, y0=0.0):
    C, D = 1.01346, 1.2158542
    lam, phi = _ll(lon, lat, lon0)
    return (x0 + R * C * lam * (A - B * np.sqrt(1 + D * phi * phi)),
            y0 + R * C * phi)


def _putp5_inv(x, y, A, B, lon0=0.0, x0=0.0, y0=0.0):
    C, D = 1.01346, 1.2158542
    phi = (np.asarray(y, float) - y0) / R / C
    lam = (np.asarray(x, float) - x0) / R / \
        (C * (A - B * np.sqrt(1 + D * phi * phi)))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def putp5_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    return _putp5_fwd(lon, lat, 2.0, 1.0, lon0, x0, y0)


def putp5_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    return _putp5_inv(x, y, 2.0, 1.0, lon0, x0, y0)


def putp5p_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    return _putp5_fwd(lon, lat, 1.5, 0.5, lon0, x0, y0)


def putp5p_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    return _putp5_inv(x, y, 1.5, 0.5, lon0, x0, y0)


def wag3_fwd(lon, lat, lat_ts=0.0, lon0=0.0, x0=0.0, y0=0.0):
    ts = np.deg2rad(lat_ts)
    cx = np.cos(ts) / np.cos(2 * ts / 3)
    lam, phi = _ll(lon, lat, lon0)
    return (x0 + R * cx * lam * np.cos(2.0 / 3.0 * phi), y0 + R * phi)


def wag3_inv(x, y, lat_ts=0.0, lon0=0.0, x0=0.0, y0=0.0):
    ts = np.deg2rad(lat_ts)
    cx = np.cos(ts) / np.cos(2 * ts / 3)
    phi = (np.asarray(y, float) - y0) / R
    lam = (np.asarray(x, float) - x0) / R / \
        (cx * np.cos(2.0 / 3.0 * phi))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def wink1_fwd(lon, lat, lat_ts=0.0, lon0=0.0, x0=0.0, y0=0.0):
    c1 = np.cos(np.deg2rad(lat_ts))
    lam, phi = _ll(lon, lat, lon0)
    return (x0 + R * 0.5 * lam * (c1 + np.cos(phi)), y0 + R * phi)


def wink1_inv(x, y, lat_ts=0.0, lon0=0.0, x0=0.0, y0=0.0):
    c1 = np.cos(np.deg2rad(lat_ts))
    phi = (np.asarray(y, float) - y0) / R
    lam = 2 * (np.asarray(x, float) - x0) / R / (c1 + np.cos(phi))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def crast_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    XM, YM = 0.97720502380583984317, 3.06998012383946546542
    lam, phi = _ll(lon, lat, lon0)
    phi = phi / 3.0
    return (x0 + R * XM * lam * (2 * np.cos(phi + phi) - 1),
            y0 + R * YM * np.sin(phi))


def crast_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    RXM, RYM = 1.02332670794648848847, 0.32573500793527994772
    phi = 3 * np.arcsin(np.clip((np.asarray(y, float) - y0)
                                / R * RYM, -1, 1))
    lam = (np.asarray(x, float) - x0) / R * RXM / \
        (2 * np.cos((phi + phi) / 3.0) - 1)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def denoy_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    C0, C1, C3 = 0.95, -0.08333333333333333333, 0.00166666666666666666
    D1, D5 = 0.9, 0.03
    lam, phi = _ll(lon, lat, lon0)
    al = np.abs(lam)
    x = lam * np.cos((C0 + al * (C1 + al * al * C3)) *
                     (phi * (D1 + D5 * phi ** 4)))
    return x0 + R * x, y0 + R * phi


def gins8_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    Cl, Cp, C12 = 0.000952426, 0.162388, 0.08333333333333333
    lam, phi = _ll(lon, lat, lon0)
    t = phi * phi
    y = phi * (1 + t * C12)
    x = lam * (1 - Cp * t)
    t = lam * lam
    x = x * (0.87 - Cl * t * t)
    return x0 + R * x, y0 + R * y


def wag2_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    C_x, C_y, C_p1, C_p2 = 0.92483, 1.38725, 0.88022, 0.88550
    lam, phi = _ll(lon, lat, lon0)
    phi = _aasin(C_p1 * np.sin(C_p2 * phi))
    return (x0 + R * C_x * lam * np.cos(phi), y0 + R * C_y * phi)


def wag2_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    C_x, C_y, C_p1, C_p2 = 0.92483, 1.38725, 0.88022, 0.88550
    phi = (np.asarray(y, float) - y0) / R / C_y
    lam = (np.asarray(x, float) - x0) / R / (C_x * np.cos(phi))
    phi = _aasin(np.sin(phi) / C_p1) / C_p2
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def _urmfps_fwd(lon, lat, n, lon0=0.0, x0=0.0, y0=0.0):
    C_x, C_y = 0.8773826753, 1.139753528477 / n
    lam, phi = _ll(lon, lat, lon0)
    phi = _aasin(n * np.sin(phi))
    return (x0 + R * C_x * lam * np.cos(phi), y0 + R * C_y * phi)


def _urmfps_inv(x, y, n, lon0=0.0, x0=0.0, y0=0.0):
    C_x, C_y = 0.8773826753, 1.139753528477 / n
    ys = (np.asarray(y, float) - y0) / R / C_y
    phi = _aasin(np.sin(ys) / n)
    lam = (np.asarray(x, float) - x0) / R / (C_x * np.cos(ys))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def urmfps_fwd(lon, lat, n=None, lon0=0.0, x0=0.0, y0=0.0):
    if n is None or not (0 < n <= 1):
        raise ValueError("+proj=urmfps requires +n= in (0, 1]")
    return _urmfps_fwd(lon, lat, n, lon0, x0, y0)


def urmfps_inv(x, y, n=None, lon0=0.0, x0=0.0, y0=0.0):
    if n is None or not (0 < n <= 1):
        raise ValueError("+proj=urmfps requires +n= in (0, 1]")
    return _urmfps_inv(x, y, n, lon0, x0, y0)


_WAG1_N = 0.8660254037844386467637231707


def wag1_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    return _urmfps_fwd(lon, lat, _WAG1_N, lon0, x0, y0)


def wag1_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    return _urmfps_inv(x, y, _WAG1_N, lon0, x0, y0)


def urm5_fwd(lon, lat, n=None, q=None, alpha=None,
             lon0=0.0, x0=0.0, y0=0.0):
    """pj_urm5 (fwd only): requires +n, +q, +alpha."""
    if n is None or not (0 < n <= 1):
        raise ValueError("+proj=urm5 requires +n= in (0, 1]")
    q3 = (q or 0.0) / 3.0
    al = np.deg2rad(alpha or 0.0)
    t = n * np.sin(al)
    m = np.cos(al) / np.sqrt(1 - t * t)
    rmn = 1.0 / (m * n)
    lam, phi = _ll(lon, lat, lon0)
    phi = _aasin(n * np.sin(phi))
    t2 = phi * phi
    return (x0 + R * m * lam * np.cos(phi),
            y0 + R * phi * (1 + t2 * q3) * rmn)


def _sts_fwd(lon, lat, p, q, tan_mode, lon0=0.0, x0=0.0, y0=0.0):
    """pj_sts shared kernel (kav5 / qua_aut / fouc / mbt_s)."""
    C_x, C_y, C_p = q / p, p, 1.0 / q
    lam, phi = _ll(lon, lat, lon0)
    x = C_x * lam * np.cos(phi)
    phi = phi * C_p
    c = np.cos(phi)
    if tan_mode:
        x = x * c * c
        y = C_y * np.tan(phi)
    else:
        x = x / c
        y = C_y * np.sin(phi)
    return x0 + R * x, y0 + R * y


def _sts_inv(x, y, p, q, tan_mode, lon0=0.0, x0=0.0, y0=0.0):
    C_x, C_y, C_p = q / p, p, 1.0 / q
    ys = (np.asarray(y, float) - y0) / R / C_y
    phi = np.arctan(ys) if tan_mode else _aasin(ys)
    c = np.cos(phi)
    phi = phi / C_p
    lam = (np.asarray(x, float) - x0) / R / (C_x * np.cos(phi))
    lam = lam / (c * c) if tan_mode else lam * c
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def kav5_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    return _sts_fwd(lon, lat, 1.50488, 1.35439, False, lon0, x0, y0)


def kav5_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    return _sts_inv(x, y, 1.50488, 1.35439, False, lon0, x0, y0)


def qua_aut_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    return _sts_fwd(lon, lat, 2.0, 2.0, False, lon0, x0, y0)


def qua_aut_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    return _sts_inv(x, y, 2.0, 2.0, False, lon0, x0, y0)


def fouc_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    return _sts_fwd(lon, lat, 2.0, 2.0, True, lon0, x0, y0)


def fouc_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    return _sts_inv(x, y, 2.0, 2.0, True, lon0, x0, y0)


def mbt_s_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    return _sts_fwd(lon, lat, 1.48875, 1.36509, False, lon0, x0, y0)


def mbt_s_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    return _sts_inv(x, y, 1.48875, 1.36509, False, lon0, x0, y0)


def _putp4p_fwd(lon, lat, C_x, C_y, lon0=0.0, x0=0.0, y0=0.0):
    lam, phi = _ll(lon, lat, lon0)
    phi = _aasin(0.883883476 * np.sin(phi))
    x = C_x * lam * np.cos(phi)
    phi = phi * 0.333333333333333
    x = x / np.cos(phi)
    return x0 + R * x, y0 + R * C_y * np.sin(phi)


def _putp4p_inv(x, y, C_x, C_y, lon0=0.0, x0=0.0, y0=0.0):
    phi = _aasin((np.asarray(y, float) - y0) / R / C_y)
    lam = (np.asarray(x, float) - x0) / R * np.cos(phi) / C_x
    phi = phi * 3
    lam = lam / np.cos(phi)
    phi = _aasin(1.13137085 * np.sin(phi))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def putp4p_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    return _putp4p_fwd(lon, lat, 0.874038744, 3.883251825, lon0, x0, y0)


def putp4p_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    return _putp4p_inv(x, y, 0.874038744, 3.883251825, lon0, x0, y0)


def weren_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    return _putp4p_fwd(lon, lat, 1.0, 4.442882938, lon0, x0, y0)


def weren_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    return _putp4p_inv(x, y, 1.0, 4.442882938, lon0, x0, y0)


def mbt_fpp_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    CS, FXC, FYC = 0.95257934441568037152, 0.92582009977255146156, \
        3.40168025708304504493
    lam, phi = _ll(lon, lat, lon0)
    phi = np.arcsin(np.clip(CS * np.sin(phi), -1, 1))
    return (x0 + R * FXC * lam * (2 * np.cos(2.0 / 3.0 * phi) - 1),
            y0 + R * FYC * np.sin(phi / 3.0))


def mbt_fpp_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    CS, FXC, FYC = 0.95257934441568037152, 0.92582009977255146156, \
        3.40168025708304504493
    phi = _aasin((np.asarray(y, float) - y0) / R / FYC)
    phi = phi * 3
    lam = (np.asarray(x, float) - x0) / R / \
        (FXC * (2 * np.cos(2.0 / 3.0 * phi) - 1))
    phi = _aasin(np.sin(phi) / CS)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


putp1_fwd, putp1_inv = _eck3_family(1.89490, 0.94745, -0.5,
                                    0.30396355092701331433)


def _moll_family(C_x, C_y, C_p):
    """pj_moll_init generic kernel (wag4 via pj_moll_init_Q(pi/3),
    wag5 with literal constants)."""
    def fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
        lam, phi = _ll(lon, lat, lon0)
        k = C_p * np.sin(phi)
        th, failed = _pel_fail(
            phi, lambda t, kk: -((t + np.sin(t) - kk) /
                                 (1 + np.cos(t))),
            1e-7, 10, consts=(k,))
        th = np.where(failed,
                      np.where(th < 0, -np.pi / 2, np.pi / 2),
                      th * 0.5)
        return (x0 + R * C_x * lam * np.cos(th),
                y0 + R * C_y * np.sin(th))

    def inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
        th = _aasin((np.asarray(y, float) - y0) / R / C_y)
        lam = (np.asarray(x, float) - x0) / R / (C_x * np.cos(th))
        th = th + th
        phi = _aasin((th + np.sin(th)) / C_p)
        return np.rad2deg(lam) + lon0, np.rad2deg(phi)
    return fwd, inv


def _moll_q(p):
    sp = np.sin(p)
    p2 = p + p
    r = np.sqrt(2 * np.pi * sp / (p2 + np.sin(p2)))
    return 2 * r / np.pi, r / sp, p2 + np.sin(p2)


wag4_fwd, wag4_inv = _moll_family(*_moll_q(np.pi / 3))
wag5_fwd, wag5_inv = _moll_family(0.90977, 1.65014, 3.00896)


# --- iterative pseudocylindricals (pj_boggs, pj_hatano, pj_nell,
#     pj_nell_h, pj_putp2, pj_putp6, pj_wink2, pj_mbt_fpq, pj_mbt_fps,
#     pj_sinu_init generalization for mbtfps / gn_sinu) ---------------

def boggs_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    EPS, FXC, FXC2, FYC = 1e-7, 2.00276, 1.11072, 0.49931
    lam, phi = _ll(lon, lat, lon0)
    c = np.sin(phi) * np.pi
    theta = _pel(phi, lambda t, cc: -((t + np.sin(t) - cc) /
                                      (1 + np.cos(t))),
                 EPS, 20, consts=(c,))
    pole = np.abs(np.abs(phi) - np.pi / 2) < EPS
    th_half = np.where(pole, phi, theta * 0.5)
    x = np.where(pole, 0.0,
                 FXC * lam / (1 / np.cos(phi) +
                              FXC2 / np.cos(theta * 0.5)))
    return (x0 + R * x,
            y0 + R * FYC * (phi + np.sqrt(2) * np.sin(th_half)))


def hatano_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    EPS, CN, CS = 1e-7, 2.67595, 2.43763
    FYCN, FYCS, FXC = 1.75859, 1.93052, 0.85
    lam, phi = _ll(lon, lat, lon0)
    c = np.sin(phi) * np.where(phi < 0, CS, CN)
    th = _pel(phi, lambda t, cc: -((t + np.sin(t) - cc) /
                                   (1 + np.cos(t))),
              EPS, 20, consts=(c,))
    th = th * 0.5
    return (x0 + R * FXC * lam * np.cos(th),
            y0 + R * np.sin(th) * np.where(th < 0, FYCS, FYCN))


def hatano_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    RCN, RCS = 0.37369906014686373063, 0.41023453108141924738
    RYCN, RYCS = 0.56863737426006061674, 0.51799515156538134803
    RXC = 1.17647058823529411764
    ys = (np.asarray(y, float) - y0) / R
    xs = (np.asarray(x, float) - x0) / R
    th = _aasin(ys * np.where(ys < 0, RYCS, RYCN))
    lam = RXC * xs / np.cos(th)
    th = th + th
    phi = _aasin(np.clip((th + np.sin(th)) *
                         np.where(ys < 0, RCS, RCN), -1, 1))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def nell_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    lam, phi = _ll(lon, lat, lon0)
    k = 2 * np.sin(phi)
    V = phi * phi
    p0 = phi * (1.00371 + V * (-0.0935382 + V * -0.011412))
    phi = _pel(p0, lambda t, kk: -((t + np.sin(t) - kk) /
                                   (1 + np.cos(t))),
               1e-7, 10, consts=(k,))
    return (x0 + R * 0.5 * lam * (1 + np.cos(phi)), y0 + R * phi)


def nell_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    ys = (np.asarray(y, float) - y0) / R
    lam = 2 * (np.asarray(x, float) - x0) / R / (1 + np.cos(ys))
    phi = _aasin(0.5 * (ys + np.sin(ys)))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def nell_h_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    lam, phi = _ll(lon, lat, lon0)
    return (x0 + R * 0.5 * lam * (1 + np.cos(phi)),
            y0 + R * 2.0 * (phi - np.tan(0.5 * phi)))


def nell_h_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    EPS = 1e-7
    ys = (np.asarray(y, float) - y0) / R
    xs = (np.asarray(x, float) - x0) / R
    p = 0.5 * ys

    def step(phi, pp):
        c = np.cos(0.5 * phi)
        return -((phi - np.tan(phi / 2) - pp) / (1 - 0.5 / (c * c)))

    phi0 = np.zeros_like(np.atleast_1d(p), dtype=float)
    phi, failed = _pel_fail(phi0 + 0.0, step, EPS, 9, consts=(p,))
    phi = np.where(failed,
                   np.where(p < 0, -np.pi / 2, np.pi / 2), phi)
    lam = np.where(failed, 2 * xs, 2 * xs / (1 + np.cos(phi)))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def putp2_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    C_x, C_y, C_p = 1.89490, 1.71848, 0.6141848493043784
    EPS, PI_DIV_3 = 1e-10, 1.0471975511965977
    lam, phi = _ll(lon, lat, lon0)
    p = C_p * np.sin(phi)
    s = phi * phi
    p0 = phi * (0.615709 + s * (0.00909953 + s * 0.0046292))

    def step(t, pp):
        c = np.cos(t)
        sn = np.sin(t)
        return -((t + sn * (c - 1) - pp) / (1 + c * (c - 1) - sn * sn))

    phi, failed = _pel_fail(p0, step, EPS, 10, consts=(p,))
    phi = np.where(failed,
                   np.where(phi < 0, -PI_DIV_3, PI_DIV_3), phi)
    return (x0 + R * C_x * lam * (np.cos(phi) - 0.5),
            y0 + R * C_y * np.sin(phi))


def putp2_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    C_x, C_y, C_p = 1.89490, 1.71848, 0.6141848493043784
    phi = _aasin((np.asarray(y, float) - y0) / R / C_y)
    c = np.cos(phi)
    lam = (np.asarray(x, float) - x0) / R / (C_x * (c - 0.5))
    phi = _aasin((phi + np.sin(phi) * (c - 1)) / C_p)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def _putp6_fwd(lon, lat, prime, lon0=0.0, x0=0.0, y0=0.0):
    EPS, CON_POLE = 1e-10, 1.732050807568877
    if prime:
        C_x, C_y, A, B, D = 0.44329, 0.80404, 6.0, 5.61125, 3.0
    else:
        C_x, C_y, A, B, D = 1.01346, 0.91910, 4.0, \
            2.1471437182129378784, 2.0
    lam, phi = _ll(lon, lat, lon0)
    p = B * np.sin(phi)
    p0 = phi * 1.10265779

    def step(t, pp):
        r = np.sqrt(1 + t * t)
        return -(((A - r) * t - np.log(t + r) - pp) / (A - 2 * r))

    phi, failed = _pel_fail(p0, step, EPS, 10, consts=(p,))
    phi = np.where(failed,
                   np.where(p < 0, -CON_POLE, CON_POLE), phi)
    return (x0 + R * C_x * lam * (D - np.sqrt(1 + phi * phi)),
            y0 + R * C_y * phi)


def _putp6_inv(x, y, prime, lon0=0.0, x0=0.0, y0=0.0):
    if prime:
        C_x, C_y, A, B, D = 0.44329, 0.80404, 6.0, 5.61125, 3.0
    else:
        C_x, C_y, A, B, D = 1.01346, 0.91910, 4.0, \
            2.1471437182129378784, 2.0
    phi = (np.asarray(y, float) - y0) / R / C_y
    r = np.sqrt(1 + phi * phi)
    lam = (np.asarray(x, float) - x0) / R / (C_x * (D - r))
    phi = _aasin(((A - r) * phi - np.log(phi + r)) / B)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def putp6_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    return _putp6_fwd(lon, lat, False, lon0, x0, y0)


def putp6_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    return _putp6_inv(x, y, False, lon0, x0, y0)


def putp6p_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    return _putp6_fwd(lon, lat, True, lon0, x0, y0)


def putp6p_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    return _putp6_inv(x, y, True, lon0, x0, y0)


def wink2_fwd(lon, lat, lat1=0.0, lon0=0.0, x0=0.0, y0=0.0):
    cosphi1 = np.cos(np.deg2rad(lat1))
    LOOP_TOL = 1e-7
    lam, phi = _ll(lon, lat, lon0)
    ybase = phi * 2.0 / np.pi
    k = np.pi * np.sin(phi)
    p0 = phi * 1.8
    phi2, failed = _pel_fail(
        p0, lambda t, kk: -((t + np.sin(t) - kk) / (1 + np.cos(t))),
        LOOP_TOL, 10, consts=(k,))
    phi2 = np.where(failed,
                    np.where(phi2 < 0, -np.pi / 2, np.pi / 2),
                    phi2 * 0.5)
    return (x0 + R * 0.5 * lam * (np.cos(phi2) + cosphi1),
            y0 + R * np.pi / 4 * (np.sin(phi2) + ybase))


def mbt_fpq_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    EPS, C = 1e-7, 1.70710678118654752440
    FYC, FXC = 1.87475828462269495505, 0.31245971410378249250
    lam, phi = _ll(lon, lat, lon0)
    c = C * np.sin(phi)

    def step(t, cc):
        return -((np.sin(0.5 * t) + np.sin(t) - cc) /
                 (0.5 * np.cos(0.5 * t) + np.cos(t)))

    phi = _pel(phi, step, EPS, 20, consts=(c,))
    return (x0 + R * FXC * lam *
            (1.0 + 2 * np.cos(phi) / np.cos(0.5 * phi)),
            y0 + R * FYC * np.sin(0.5 * phi))


def mbt_fpq_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    RC, RYC = 0.58578643762690495119, 0.53340209679417701685
    RXC = 3.20041258076506210122
    ys = (np.asarray(y, float) - y0) / R
    xs = (np.asarray(x, float) - x0) / R
    t = np.clip(RYC * ys, -1, 1)
    phi = 2 * np.arcsin(t)
    lam = RXC * xs / (1 + 2 * np.cos(phi) / np.cos(0.5 * phi))
    phi = _aasin(RC * (t + np.sin(phi)))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def mbt_fps_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    LOOP_TOL, C1, C2, C3 = 1e-7, 0.45503, 1.36509, 1.41546
    C_x, C_y, C1_2 = 0.22248, 1.44492, 1.0 / 3.0
    lam, phi = _ll(lon, lat, lon0)
    k = C3 * np.sin(phi)

    def step(t, kk):
        tt = t / C2
        return -((C1 * np.sin(tt) + np.sin(t) - kk) /
                 (C1_2 * np.cos(tt) + np.cos(t)))

    phi = _pel(phi, step, LOOP_TOL, 10, consts=(k,))
    t = phi / C2
    return (x0 + R * C_x * lam * (1 + 3 * np.cos(phi) / np.cos(t)),
            y0 + R * C_y * np.sin(t))


def mbt_fps_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    C1, C2, C3 = 0.45503, 1.36509, 1.41546
    C_x, C_y = 0.22248, 1.44492
    t = _aasin((np.asarray(y, float) - y0) / R / C_y)
    phi = C2 * t
    lam = (np.asarray(x, float) - x0) / R / \
        (C_x * (1 + 3 * np.cos(phi) / np.cos(t)))
    phi = _aasin((C1 * np.sin(t) + np.sin(phi)) / C3)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def _gn_sinu_fwd(lon, lat, m, n, lon0=0.0, x0=0.0, y0=0.0):
    """pj_sinu_init shared kernel (mbtfps; gn_sinu with +m +n)."""
    C_y = np.sqrt((m + 1) / n)
    C_x = C_y / (m + 1)
    lam, phi = _ll(lon, lat, lon0)
    if not m:
        phi = _aasin(n * np.sin(phi)) if n != 1 else phi
    else:
        k = n * np.sin(phi)
        phi, failed = _pel_fail(
            phi, lambda t, kk: -((m * t + np.sin(t) - kk) /
                                 (m + np.cos(t))),
            1e-7, 8, consts=(k,))
        if np.any(failed):
            raise ValueError("gn_sinu: phi iteration did not converge")
    return (x0 + R * C_x * lam * (m + np.cos(phi)),
            y0 + R * C_y * phi)


def _gn_sinu_inv(x, y, m, n, lon0=0.0, x0=0.0, y0=0.0):
    C_y = np.sqrt((m + 1) / n)
    C_x = C_y / (m + 1)
    ys = (np.asarray(y, float) - y0) / R / C_y
    if m:
        phi = _aasin((m * ys + np.sin(ys)) / n)
    else:
        phi = _aasin(np.sin(ys) / n) if n != 1 else ys
    lam = (np.asarray(x, float) - x0) / R / (C_x * (m + np.cos(ys)))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def gn_sinu_fwd(lon, lat, m=None, n=None, lon0=0.0, x0=0.0, y0=0.0):
    if m is None or n is None or n <= 0:
        raise ValueError("+proj=gn_sinu requires +m= and +n= (n > 0)")
    return _gn_sinu_fwd(lon, lat, m, n, lon0, x0, y0)


def gn_sinu_inv(x, y, m=None, n=None, lon0=0.0, x0=0.0, y0=0.0):
    if m is None or n is None or n <= 0:
        raise ValueError("+proj=gn_sinu requires +m= and +n= (n > 0)")
    return _gn_sinu_inv(x, y, m, n, lon0, x0, y0)


_MBTFPS_N = 1.785398163397448309615660845


def mbtfps_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    return _gn_sinu_fwd(lon, lat, 0.5, _MBTFPS_N, lon0, x0, y0)


def mbtfps_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    return _gn_sinu_inv(x, y, 0.5, _MBTFPS_N, lon0, x0, y0)


# --- misc spherical, forward-only (pj_august, pj_bacon/apian/ortel,
#     pj_wag7, pj_vandg2/3/4, pj_gilbert) -----------------------------

def august_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    M = 4.0 / 3.0
    lam, phi = _ll(lon, lat, lon0)
    t = np.tan(0.5 * phi)
    c1 = np.sqrt(1 - t * t)
    lam = lam * 0.5
    c = 1 + c1 * np.cos(lam)
    x1 = np.sin(lam) * c1 / c
    y1 = t / c
    x12, y12 = x1 * x1, y1 * y1
    return (x0 + R * M * x1 * (3 + x12 - 3 * y12),
            y0 + R * M * y1 * (3 + 3 * x12 - y12))


def _bacon_fwd(lon, lat, bacn, ortl, lon0=0.0, x0=0.0, y0=0.0):
    HLFPI2, EPS = 2.46740110027233965467, 1e-10
    lam, phi = _ll(lon, lat, lon0)
    y = np.pi / 2 * np.sin(phi) if bacn else phi
    ax = np.abs(lam)
    with np.errstate(divide="ignore", invalid="ignore"):
        f = 0.5 * (HLFPI2 / ax + ax)
        x_main = ax - f + np.sqrt(np.maximum(f * f - y * y, 0))
        x_ortl = np.sqrt(np.maximum(HLFPI2 - phi * phi + EPS, 0)) \
            + ax - np.pi / 2
    x = np.where(ax >= EPS,
                 np.where(ortl & (ax >= np.pi / 2), x_ortl, x_main)
                 if ortl else x_main, 0.0)
    x = np.where(lam < 0, -x, x)
    return x0 + R * x, y0 + R * y


def bacon_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    return _bacon_fwd(lon, lat, True, False, lon0, x0, y0)


def apian_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    return _bacon_fwd(lon, lat, False, False, lon0, x0, y0)


def ortel_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    return _bacon_fwd(lon, lat, False, True, lon0, x0, y0)


def wag7_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    lam, phi = _ll(lon, lat, lon0)
    ysin = 0.90630778703664996 * np.sin(phi)
    theta = np.arcsin(np.clip(ysin, -1, 1))
    ct = np.cos(theta)
    lam = lam / 3.0
    D = 1 / np.sqrt(0.5 * (1 + ct * np.cos(lam)))
    return (x0 + R * 2.66723 * ct * np.sin(lam) * D,
            y0 + R * ysin * 1.24104 * D)


def _vandg2_fwd(lon, lat, vdg3, lon0=0.0, x0=0.0, y0=0.0):
    TOL = 1e-10
    lam, phi = _ll(lon, lat, lon0)
    bt = np.abs(2.0 / np.pi * phi)
    ct = np.sqrt(np.maximum(1 - bt * bt, 0))
    with np.errstate(divide="ignore", invalid="ignore"):
        at = 0.5 * np.abs(np.pi / lam - lam / np.pi)
        if vdg3:
            x1 = bt / (1 + ct)
            x = np.pi * (np.sqrt(at * at + 1 - x1 * x1) - at)
            y = np.pi * x1
        else:
            x1 = (ct * np.sqrt(1 + at * at) - at * ct * ct) / \
                (1 + at * at * bt * bt)
            x = np.pi * x1
            y = np.pi * np.sqrt(np.maximum(1 - x1 * (x1 + 2 * at)
                                           + TOL, 0))
    small = np.abs(lam) < TOL
    x = np.where(small, 0.0, np.where(lam < 0, -x, x))
    y = np.where(small, np.pi * np.where(phi < 0, -bt, bt) / (1 + ct),
                 np.where(phi < 0, -y, y))
    return x0 + R * x, y0 + R * y


def vandg2_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    return _vandg2_fwd(lon, lat, False, lon0, x0, y0)


def vandg3_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    return _vandg2_fwd(lon, lat, True, lon0, x0, y0)


def vandg4_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    TOL = 1e-10
    lam, phi = _ll(lon, lat, lon0)
    with np.errstate(divide="ignore", invalid="ignore"):
        bt = np.abs(2.0 / np.pi * phi)
        bt2 = bt * bt
        ct = 0.5 * (bt * (8 - bt * (2 + bt2)) - 5) / (bt2 * (bt - 1))
        ct2 = ct * ct
        dt_ = 2.0 / np.pi * lam
        dt_ = dt_ + 1 / dt_
        dt_ = np.sqrt(np.maximum(dt_ * dt_ - 4, 0))
        dt_ = np.where((np.abs(lam) - np.pi / 2) < 0, -dt_, dt_)
        dt2 = dt_ * dt_
        x1 = bt + ct
        x1 = x1 * x1
        t = bt + 3 * ct
        ft = x1 * (bt2 + ct2 * dt2 - 1) + (1 - bt2) * (
            bt2 * (t * t + 4 * ct2) + ct2 * (12 * bt * ct + 4 * ct2))
        x1 = (dt_ * (x1 + ct2 - 1) + 2 * np.sqrt(np.maximum(ft, 0))) \
            / (4 * x1 + dt2)
        x = np.pi / 2 * x1
        y = np.pi / 2 * np.sqrt(
            np.maximum(1 + dt_ * np.abs(x1) - x1 * x1, 0))
        x = np.where(lam < 0, -x, x)
        y = np.where(phi < 0, -y, y)
    eq = np.abs(phi) < TOL
    axis = (np.abs(lam) < TOL) | (np.abs(np.abs(phi) - np.pi / 2)
                                  < TOL)
    x = np.where(eq, lam, np.where(axis, 0.0, x))
    y = np.where(eq, 0.0, np.where(axis, phi, y))
    return x0 + R * x, y0 + R * y


def gilbert_fwd(lon, lat, lat1=0.0, lon0=0.0, x0=0.0, y0=0.0):
    """pj_gilbert (fwd only): two-world conformal sphere view;
    back-hemisphere points error in mproj — here they return NaN
    (the layer pipeline drops non-finite samples)."""
    phi1 = _aasin(np.tan(0.5 * np.deg2rad(lat1)))
    sp1, cp1 = np.sin(phi1), np.cos(phi1)
    lam, phi = _ll(lon, lat, lon0)
    lam = lam * 0.5
    phi = _aasin(np.tan(0.5 * phi))
    sp, cp, cl = np.sin(phi), np.cos(phi), np.cos(lam)
    front = (sp1 * sp + cp1 * cp * cl) >= 0
    x = np.where(front, cp * np.sin(lam), np.nan)
    y = np.where(front, cp1 * sp - sp1 * cp * cl, np.nan)
    return x0 + R * x, y0 + R * y



# ---------------------------------------------------------------------------
# round-4 batch 2: FULL mproj family coverage.  The remaining pj_*
# kernels the reference's mproj bundle dispatches (simple conics,
# airy, perspective, ocea/tpeqd/chamb, qsc, healpix/rhealpix, the
# modified-stereographic polynomial grids, ob_tran), ported from the
# public mproj / PROJ.4 formulas as vectorized numpy.  Same
# conventions as batch 1: degrees in/out, R scaling, _wrap_lam for
# pj_fwd's adjlon.  `geocent` is a 3D coordinate conversion, not a
# planar projection, so it lives outside this (lon,lat)->(x,y)
# registry as geocent_fwd/geocent_inv/geocent_points below — with
# that, every mproj pj_list name is covered.

def _aacos(v):
    return np.arccos(np.clip(v, -1.0, 1.0))


# --- simple conics (mproj pj_sconic; PROJ PJ_sconics.c): euler,
#     murd1/2/3, pconic, tissot, vitk1 — one setup, shared fwd/inv ---

def _sconic_setup(type_, lat1, lat2, lat0):
    EPS = 1e-10
    p1, p2 = np.deg2rad(lat1), np.deg2rad(lat2)
    d = 0.5 * (p2 - p1)
    sig = 0.5 * (p2 + p1)
    if abs(d) < EPS or abs(sig) < EPS:
        raise ValueError(f"+proj={type_.lower()}: lat_1 == +-lat_2 "
                         "or lat_1 + lat_2 == 0")
    phi0 = np.deg2rad(lat0)
    c1 = c2 = rho_c = None
    if type_ == "TISSOT":
        n = np.sin(sig)
        cs = np.cos(d)
        rho_c = n / cs + cs / n
        rho_0 = np.sqrt((rho_c - 2 * np.sin(phi0)) / n)
    elif type_ == "MURD1":
        rho_c = np.sin(d) / (d * np.tan(sig)) + sig
        rho_0 = rho_c - phi0
        n = np.sin(sig)
    elif type_ == "MURD2":
        cs = np.sqrt(np.cos(d))
        rho_c = cs / np.tan(sig)
        rho_0 = rho_c + np.tan(sig - phi0)
        n = np.sin(sig) * cs
    elif type_ == "MURD3":
        rho_c = d / (np.tan(sig) * np.tan(d)) + sig
        rho_0 = rho_c - phi0
        n = np.sin(sig) * np.sin(d) * np.tan(d) / (d * d)
    elif type_ == "EULER":
        n = np.sin(sig) * np.sin(d) / d
        d *= 0.5
        rho_c = d / (np.tan(d) * np.tan(sig)) + sig
        rho_0 = rho_c - phi0
    elif type_ == "PCONIC":
        n = np.sin(sig)
        c2 = np.cos(d)
        c1 = 1.0 / np.tan(sig)
        if abs(phi0 - sig) - EPS >= np.pi / 2:
            raise ValueError("+proj=pconic: |lat_0 - sig| >= 90")
        rho_0 = c2 * (c1 - np.tan(phi0 - sig))
    elif type_ == "VITK1":
        cs = np.tan(d)
        n = cs * np.sin(sig) / d
        rho_c = d / (cs * np.tan(sig)) + sig
        rho_0 = rho_c - phi0
    else:  # pragma: no cover
        raise ValueError(type_)
    return n, rho_c, rho_0, sig, c1, c2


def _sconic_family(type_):
    low = type_.lower()

    def fwd(lon, lat, lat1=None, lat2=None, lat0=0.0, lon0=0.0,
            x0=0.0, y0=0.0):
        if lat1 is None or lat2 is None:
            raise ValueError(f"+proj={low} requires +lat_1= and +lat_2=")
        n, rho_c, rho_0, sig, c1, c2 = _sconic_setup(type_, lat1, lat2,
                                                     lat0)
        lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
        phi = np.deg2rad(np.asarray(lat, float))
        if type_ == "MURD2":
            rho = rho_c + np.tan(sig - phi)
        elif type_ == "PCONIC":
            rho = c2 * (c1 - np.tan(phi - sig))
        else:
            rho = rho_c - phi
        lamn = lam * n
        return (x0 + R * rho * np.sin(lamn),
                y0 + R * (rho_0 - rho * np.cos(lamn)))

    def inv(x, y, lat1=None, lat2=None, lat0=0.0, lon0=0.0,
            x0=0.0, y0=0.0):
        if lat1 is None or lat2 is None:
            raise ValueError(f"+proj={low} requires +lat_1= and +lat_2=")
        n, rho_c, rho_0, sig, c1, c2 = _sconic_setup(type_, lat1, lat2,
                                                     lat0)
        xx = (np.asarray(x, float) - x0) / R
        yy = rho_0 - (np.asarray(y, float) - y0) / R
        rho = np.hypot(xx, yy)
        if n < 0:
            rho = -rho
            xx, yy = -xx, -yy
        lam = np.arctan2(xx, yy) / n
        if type_ == "PCONIC":
            phi = np.arctan(c1 - rho / c2) + sig
        elif type_ == "MURD2":
            phi = sig - np.arctan(rho - rho_c)
        else:
            phi = rho_c - rho
        return np.rad2deg(lam) + lon0, np.rad2deg(phi)

    return fwd, inv


euler_fwd, euler_inv = _sconic_family("EULER")
murd1_fwd, murd1_inv = _sconic_family("MURD1")
murd2_fwd, murd2_inv = _sconic_family("MURD2")
murd3_fwd, murd3_inv = _sconic_family("MURD3")
pconic_fwd, pconic_inv = _sconic_family("PCONIC")
tissot_fwd, tissot_inv = _sconic_family("TISSOT")
vitk1_fwd, vitk1_inv = _sconic_family("VITK1")


# --- leac: Lambert equal-area conic = pj_aea with phi2 = +-90
#     (mproj pj_leac) ---

def leac_fwd(lon, lat, lat1=0.0, south=False, lat0=0.0, lon0=0.0,
             x0=0.0, y0=0.0):
    x, y = albers_fwd(lon, lat, lat1=lat1,
                      lat2=-90.0 if south else 90.0, lat0=lat0,
                      lon0=lon0)
    return x + x0, y + y0


def leac_inv(x, y, lat1=0.0, south=False, lat0=0.0, lon0=0.0,
             x0=0.0, y0=0.0):
    return albers_inv(np.asarray(x, float) - x0,
                      np.asarray(y, float) - y0, lat1=lat1,
                      lat2=-90.0 if south else 90.0, lat0=lat0,
                      lon0=lon0)


# --- airy (mproj pj_airy; fwd only) ---

def airy_fwd(lon, lat, lat_b=0.0, no_cut=False, lat0=0.0, lon0=0.0,
             x0=0.0, y0=0.0):
    EPS = 1e-10
    beta = 0.5 * (np.pi / 2 - np.deg2rad(lat_b))
    if abs(beta) < EPS:
        Cb = -0.5
    else:
        Cb = 1.0 / np.tan(beta)
        Cb *= Cb * np.log(np.cos(beta))
    phi0 = np.deg2rad(lat0)
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    sinlam, coslam = np.sin(lam), np.cos(lam)
    if abs(abs(phi0) - np.pi / 2) < EPS:        # polar
        p_halfpi = -np.pi / 2 if phi0 < 0 else np.pi / 2
        ph = np.abs(p_halfpi - phi)
        bad = (~np.asarray(no_cut)) & ((ph - EPS) > np.pi / 2)
        ph = ph * 0.5
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.tan(ph)
            Krho = np.where(ph > EPS,
                            -2 * (np.log(np.cos(ph)) / np.where(t == 0, 1, t)
                                  + t * Cb), 0.0)
        x = Krho * sinlam
        yv = Krho * coslam
        if phi0 > 0:                             # N_POLE
            yv = -yv
        x = np.where(bad, np.nan, x)
        yv = np.where(bad, np.nan, yv)
        return x0 + R * x, y0 + R * yv
    sinphi, cosphi = np.sin(phi), np.cos(phi)
    if abs(phi0) < EPS:                          # equatorial
        cosz = cosphi * coslam
        ynum = sinphi
    else:                                        # oblique
        sinph0, cosph0 = np.sin(phi0), np.cos(phi0)
        cosz = sinph0 * sinphi + cosph0 * cosphi * coslam
        ynum = cosph0 * sinphi - sinph0 * cosphi * coslam
    bad = (not no_cut) & (cosz < -EPS)
    s = 1 - cosz
    with np.errstate(divide="ignore", invalid="ignore"):
        t = 0.5 * (1 + cosz)
        Krho = np.where(np.abs(s) > EPS,
                        -np.log(np.where(t <= 0, 1, t))
                        / np.where(s == 0, 1, s)
                        - Cb / np.where(t == 0, 1, t),
                        0.5 - Cb)
    x = np.where(bad, np.nan, Krho * cosphi * sinlam)
    yv = np.where(bad, np.nan, Krho * ynum)
    return x0 + R * x, y0 + R * yv


# --- wag6 (mproj pj_wag6: the eck3 closed form with its constants) ---

wag6_fwd, wag6_inv = _eck3_family(0.94745, 0.94745, 0.0,
                                  0.30396355092701331433)


# --- natearth2 (mproj pj_natearth2) ---

_NE2_A = (0.84719, -0.13063, -0.04515, 0.05494, -0.02326, 0.00331)
_NE2_B = (1.01183, -0.02625, 0.01926, -0.00396)
_NE2_MAX_Y = 0.84719 * 0.535117535153096 * np.pi


def natearth2_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    A0, A1, A2, A3, A4, A5 = _NE2_A
    B0, B1, B2, B3 = _NE2_B
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    p2 = phi * phi
    p4 = p2 * p2
    p6 = p2 * p4
    x = lam * (A0 + A1 * p2 + p6 * p6 * (A2 + A3 * p2 + A4 * p4
                                         + A5 * p6))
    y = phi * (B0 + p4 * p4 * (B1 + B2 * p2 + B3 * p4))
    return x0 + R * x, y0 + R * y


def natearth2_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    A0, A1, A2, A3, A4, A5 = _NE2_A
    B0, B1, B2, B3 = _NE2_B
    C0, C1, C2, C3 = B0, 9 * B1, 11 * B2, 13 * B3
    xx = (np.asarray(x, float) - x0) / R
    yy = np.clip((np.asarray(y, float) - y0) / R, -_NE2_MAX_Y,
                 _NE2_MAX_Y)

    def step(yc, yv):
        y2 = yc * yc
        y4 = y2 * y2
        f = yc * (B0 + y4 * y4 * (B1 + B2 * y2 + B3 * y4)) - yv
        fder = C0 + y4 * y4 * (C1 + C2 * y2 + C3 * y4)
        return -f / fder

    phi = _pel(yy, step, 1e-11, 100, consts=(yy,))
    y2 = phi * phi
    y4 = y2 * y2
    y6 = y2 * y4
    lam = xx / (A0 + A1 * y2 + y6 * y6 * (A2 + A3 * y2 + A4 * y4
                                          + A5 * y6))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


# --- nsper / tpers (mproj pj_tpers_init; spherical perspective) ---

def _tpers_core(lon, lat, h, tilt_r, azi_r, tilted, lat0, lon0, x0, y0):
    if h is None or h <= 0:
        raise ValueError("+proj=nsper/tpers requires +h= > 0")
    phi0 = np.deg2rad(lat0)
    pn1 = h / R
    p = 1 + pn1
    rp = 1 / p
    hh = 1 / pn1
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    sinphi, cosphi = np.sin(phi), np.cos(phi)
    coslam = np.cos(lam)
    if abs(abs(phi0) - np.pi / 2) < 1e-10:
        cosz = -sinphi if phi0 < 0 else sinphi
    elif abs(phi0) < 1e-10:
        cosz = cosphi * coslam
    else:
        sinph0, cosph0 = np.sin(phi0), np.cos(phi0)
        cosz = sinph0 * sinphi + cosph0 * cosphi * coslam
    bad = cosz < rp
    yk = pn1 / (p - cosz)
    x = yk * cosphi * np.sin(lam)
    if abs(abs(phi0) - np.pi / 2) < 1e-10:
        yv = yk * cosphi * (-coslam if phi0 > 0 else coslam)
    elif abs(phi0) < 1e-10:
        yv = yk * sinphi
    else:
        yv = yk * (cosph0 * sinphi - sinph0 * cosphi * coslam)
    if tilted:
        cg, sg = np.cos(azi_r), np.sin(azi_r)
        cw, sw = np.cos(tilt_r), np.sin(tilt_r)
        yt = yv * cg + x * sg
        ba = 1.0 / (yt * sw * hh + cw)
        x, yv = (x * cg - yv * sg) * cw * ba, yt * ba
    x = np.where(bad, np.nan, x)
    yv = np.where(bad, np.nan, yv)
    return x0 + R * x, y0 + R * yv


def _tpers_core_inv(x, y, h, tilt_r, azi_r, tilted, lat0, lon0, x0, y0):
    if h is None or h <= 0:
        raise ValueError("+proj=nsper/tpers requires +h= > 0")
    phi0 = np.deg2rad(lat0)
    pn1 = h / R
    p = 1 + pn1
    hh = 1 / pn1
    pfact = (p + 1) * hh
    xx = (np.asarray(x, float) - x0) / R
    yy = (np.asarray(y, float) - y0) / R
    if tilted:
        cg, sg = np.cos(azi_r), np.sin(azi_r)
        cw, sw = np.cos(tilt_r), np.sin(tilt_r)
        yt = 1.0 / (pn1 - yy * sw)
        bm = pn1 * xx * yt
        bq = pn1 * yy * cw * yt
        xx = bm * cg + bq * sg
        yy = bq * cg - bm * sg
    rh = np.hypot(xx, yy)
    sinz2 = 1 - rh * rh * pfact
    bad = sinz2 < 0
    with np.errstate(divide="ignore", invalid="ignore"):
        sinz = (p - np.sqrt(np.where(bad, 0, sinz2))) / \
            (pn1 / np.where(rh == 0, 1, rh) + rh / pn1)
    cosz = np.sqrt(np.maximum(1 - sinz * sinz, 0))
    small = np.abs(rh) <= 1e-10
    if abs(abs(phi0) - np.pi / 2) < 1e-10:   # polar
        phi = _aasin(cosz)
        if phi0 < 0:
            phi = -phi
            yv = yy
        else:
            yv = -yy
        lam = np.arctan2(xx, yv)
    elif abs(phi0) < 1e-10:                  # equatorial
        with np.errstate(invalid="ignore"):
            phi = _aasin(np.where(small, 0, yy * sinz
                                  / np.where(rh == 0, 1, rh)))
        yv = cosz * rh
        lam = np.arctan2(xx * sinz, yv)
    else:                                    # oblique
        sinph0, cosph0 = np.sin(phi0), np.cos(phi0)
        with np.errstate(invalid="ignore"):
            phi = _aasin(np.where(small, np.sin(phi0),
                                  cosz * sinph0 + yy * sinz * cosph0
                                  / np.where(rh == 0, 1, rh)))
        yv = (cosz - sinph0 * np.sin(phi)) * rh
        lam = np.arctan2(xx * sinz * cosph0, yv)
    lam = np.where(small, 0.0, lam)
    phi = np.where(small, phi0, phi)
    lam = np.where(bad, np.nan, lam)
    phi = np.where(bad, np.nan, phi)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def nsper_fwd(lon, lat, h=None, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
    return _tpers_core(lon, lat, h, 0.0, 0.0, False, lat0, lon0, x0, y0)


def nsper_inv(x, y, h=None, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
    return _tpers_core_inv(x, y, h, 0.0, 0.0, False, lat0, lon0, x0, y0)


def tpers_fwd(lon, lat, h=None, tilt=0.0, azi=0.0, lat0=0.0, lon0=0.0,
              x0=0.0, y0=0.0):
    return _tpers_core(lon, lat, h, np.deg2rad(tilt), np.deg2rad(azi),
                       True, lat0, lon0, x0, y0)


def tpers_inv(x, y, h=None, tilt=0.0, azi=0.0, lat0=0.0, lon0=0.0,
              x0=0.0, y0=0.0):
    return _tpers_core_inv(x, y, h, np.deg2rad(tilt), np.deg2rad(azi),
                           True, lat0, lon0, x0, y0)


# --- ocea (mproj pj_ocea; Oblique Cylindrical Equal Area) ---

def _ocea_setup(k0, alpha, lonc, lat1, lat2, lon1, lon2):
    if alpha is not None:
        al = np.deg2rad(alpha)
        lonz = np.deg2rad(lonc or 0.0)
        # phi_0 = 0 in mproj: -sin(0)*sin(alpha) is IEEE signed zero,
        # so atan(+-inf) = +-pi/2 exactly as the JS evaluates it
        with np.errstate(divide="ignore"):
            singam = float(np.arctan(np.divide(
                -np.cos(al), -0.0 * np.sin(al)))) + lonz
        sinphi = float(np.arcsin(np.sin(al)))
    else:
        if None in (lat1, lat2, lon1, lon2):
            raise ValueError("+proj=ocea requires +alpha=+lonc= or "
                             "+lat_1/lat_2/lon_1/lon_2")
        p1, p2 = np.deg2rad(lat1), np.deg2rad(lat2)
        l1, l2 = np.deg2rad(lon1), np.deg2rad(lon2)
        singam = float(np.arctan2(
            np.cos(p1) * np.sin(p2) * np.cos(l1)
            - np.sin(p1) * np.cos(p2) * np.cos(l2),
            np.sin(p1) * np.cos(p2) * np.sin(l2)
            - np.cos(p1) * np.sin(p2) * np.sin(l1)))
        if l1 == -np.pi / 2:
            singam = -singam
        sinphi = float(np.arctan(-np.cos(singam - l1) / np.tan(p1)))
    lam0 = singam + np.pi / 2
    return (np.cos(sinphi), np.sin(sinphi), lam0, 1.0 / k0, k0)


def ocea_fwd(lon, lat, k0=1.0, alpha=None, lonc=None, lat1=None,
             lat2=None, lon1=None, lon2=None, x0=0.0, y0=0.0):
    cosphi, sinphi, lam0, rok, rtk = _ocea_setup(k0, alpha, lonc, lat1,
                                                 lat2, lon1, lon2)
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float)) - lam0)
    phi = np.deg2rad(np.asarray(lat, float))
    ys = np.sin(lam)
    t = np.cos(lam)
    with np.errstate(divide="ignore", invalid="ignore"):
        x = np.arctan((np.tan(phi) * cosphi + sinphi * ys) / t)
    x = np.where(t < 0, x + np.pi, x) * rtk
    y = rok * (sinphi * np.sin(phi) - cosphi * np.cos(phi) * ys)
    return x0 + R * x, y0 + R * y


def ocea_inv(x, y, k0=1.0, alpha=None, lonc=None, lat1=None,
             lat2=None, lon1=None, lon2=None, x0=0.0, y0=0.0):
    cosphi, sinphi, lam0, rok, rtk = _ocea_setup(k0, alpha, lonc, lat1,
                                                 lat2, lon1, lon2)
    yy = (np.asarray(y, float) - y0) / R / rok
    xx = (np.asarray(x, float) - x0) / R / rtk
    t = np.sqrt(np.maximum(1 - yy * yy, 0))
    s = np.sin(xx)
    phi = _aasin(yy * sinphi + t * cosphi * s)
    lam = np.arctan2(t * sinphi * s - yy * cosphi, t * np.cos(xx))
    return np.rad2deg(_wrap_lam(lam + lam0)), np.rad2deg(phi)


# --- tpeqd (mproj pj_tpeqd; two-point equidistant) ---

def _tpeqd_setup(lat1, lon1, lat2, lon2):
    p1, p2 = np.deg2rad(lat1), np.deg2rad(lat2)
    l1, l2 = np.deg2rad(lon1), np.deg2rad(lon2)
    if p1 == p2 and l1 == l2:
        raise ValueError("+proj=tpeqd: control points coincide")
    lam0 = float(_wrap_lam(0.5 * (l1 + l2)))
    dlam2 = float(_wrap_lam(l2 - l1))
    cp1, cp2 = np.cos(p1), np.cos(p2)
    sp1, sp2 = np.sin(p1), np.sin(p2)
    cs = cp1 * sp2
    sc = sp1 * cp2
    ccs = cp1 * cp2 * np.sin(dlam2)
    z02 = float(_aacos(sp1 * sp2 + cp1 * cp2 * np.cos(dlam2)))
    hz0 = 0.5 * z02
    A12 = np.arctan2(cp2 * np.sin(dlam2),
                     cp1 * sp2 - sp1 * cp2 * np.cos(dlam2))
    pp = float(_aasin(cp1 * np.sin(A12)))
    ca, sa = np.cos(pp), np.sin(pp)
    lamp = float(_wrap_lam(np.arctan2(cp1 * np.cos(A12), sp1) - hz0))
    dlam2 *= 0.5
    lamc = np.pi / 2 - np.arctan2(np.sin(A12) * sp1, np.cos(A12)) - dlam2
    thz0 = np.tan(hz0)
    rhshz0 = 0.5 / np.sin(hz0)
    r2z0 = 0.5 / z02
    z02 *= z02
    return (cp1, sp1, cp2, sp2, ccs, cs, sc, r2z0, z02, dlam2, hz0,
            thz0, rhshz0, ca, sa, lamp, lamc, lam0)


def tpeqd_fwd(lon, lat, lat1=None, lon1=None, lat2=None, lon2=None,
              x0=0.0, y0=0.0):
    if None in (lat1, lon1, lat2, lon2):
        raise ValueError("+proj=tpeqd requires +lat_1/+lon_1/+lat_2/"
                         "+lon_2")
    (cp1, sp1, cp2, sp2, ccs, cs, sc, r2z0, z02, dlam2, hz0, thz0,
     rhshz0, ca, sa, lamp, lamc, lam0) = _tpeqd_setup(lat1, lon1, lat2,
                                                      lon2)
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float)) - lam0)
    phi = np.deg2rad(np.asarray(lat, float))
    sp, cp = np.sin(phi), np.cos(phi)
    dl1 = lam + dlam2
    dl2 = lam - dlam2
    z1 = _aacos(sp1 * sp + cp1 * cp * np.cos(dl1))
    z2 = _aacos(sp2 * sp + cp2 * cp * np.cos(dl2))
    z1 *= z1
    z2 *= z2
    t = z1 - z2
    x = r2z0 * t
    t = z02 - t
    y = r2z0 * np.sqrt(np.maximum(4 * z02 * z2 - t * t, 0))
    y = np.where(ccs * sp - cp * (cs * np.sin(dl1)
                                  - sc * np.sin(dl2)) < 0, -y, y)
    return x0 + R * x, y0 + R * y


def tpeqd_inv(x, y, lat1=None, lon1=None, lat2=None, lon2=None,
              x0=0.0, y0=0.0):
    if None in (lat1, lon1, lat2, lon2):
        raise ValueError("+proj=tpeqd requires +lat_1/+lon_1/+lat_2/"
                         "+lon_2")
    (cp1, sp1, cp2, sp2, ccs, cs, sc, r2z0, z02, dlam2, hz0, thz0,
     rhshz0, ca, sa, lamp, lamc, lam0) = _tpeqd_setup(lat1, lon1, lat2,
                                                      lon2)
    xx = (np.asarray(x, float) - x0) / R
    yy = (np.asarray(y, float) - y0) / R
    cz1 = np.cos(np.hypot(yy, xx + hz0))
    cz2 = np.cos(np.hypot(yy, xx - hz0))
    s = cz1 + cz2
    d = cz1 - cz2
    lam = -np.arctan2(d, s * thz0)
    phi = _aacos(np.hypot(thz0 * s, d) * rhshz0)
    phi = np.where(yy < 0, -phi, phi)
    sp, cp = np.sin(phi), np.cos(phi)
    lam = lam - lamp
    cl = np.cos(lam)
    phi2 = _aasin(sa * sp + ca * cp * cl)
    lam2 = np.arctan2(cp * np.sin(lam), sa * cp * cl - ca * sp) + lamc
    return np.rad2deg(_wrap_lam(lam2 + lam0)), np.rad2deg(phi2)


# --- chamb (mproj pj_chamb; Chamberlin trimetric, fwd only) ---

def chamb_fwd(lon, lat, lat1=0.0, lon1=0.0, lat2=0.0, lon2=0.0,
              lat3=0.0, lon3=0.0, lon0=0.0, x0=0.0, y0=0.0):
    TOL = 1e-9
    lam0 = np.deg2rad(lon0)

    def vect(dphi, c1, s1, c2, s2, dlam):
        cdl = np.cos(dlam)
        big = (np.abs(dphi) > 1) | (np.abs(dlam) > 1)
        dp = np.sin(0.5 * dphi)
        dl = np.sin(0.5 * dlam)
        r_small = 2 * _aasin(np.sqrt(dp * dp + c1 * c2 * dl * dl))
        r_big = _aacos(s1 * s2 + c1 * c2 * cdl)
        r = np.where(big, r_big, r_small)
        az = np.where(np.abs(r) > TOL,
                      np.arctan2(c2 * np.sin(dlam),
                                 c1 * s2 - s1 * c2 * cdl), 0.0)
        r = np.where(np.abs(r) > TOL, r, 0.0)
        return r, az

    def lc(b, c, a):
        return _aacos(0.5 * (b * b + c * c - a * a) / (b * c))

    cP = []
    for la, lo in ((lat1, lon1), (lat2, lon2), (lat3, lon3)):
        phi = np.deg2rad(la)
        lam = float(_wrap_lam(np.deg2rad(lo) - lam0))
        cP.append(dict(phi=phi, lam=lam, cosphi=np.cos(phi),
                       sinphi=np.sin(phi)))
    for i in range(3):
        j = 0 if i == 2 else i + 1
        r, az = vect(cP[j]["phi"] - cP[i]["phi"], cP[i]["cosphi"],
                     cP[i]["sinphi"], cP[j]["cosphi"], cP[j]["sinphi"],
                     cP[j]["lam"] - cP[i]["lam"])
        if not float(r):
            raise ValueError("+proj=chamb: control points coincide")
        cP[i]["vr"], cP[i]["vaz"] = float(r), float(az)
    beta_0 = float(lc(cP[0]["vr"], cP[2]["vr"], cP[1]["vr"]))
    beta_1 = float(lc(cP[0]["vr"], cP[1]["vr"], cP[2]["vr"]))
    beta_2 = np.pi - beta_0
    cP[0]["py"] = cP[1]["py"] = cP[2]["vr"] * np.sin(beta_0)
    y_0 = 2 * cP[0]["py"]
    cP[2]["py"] = 0.0
    cP[1]["px"] = 0.5 * cP[0]["vr"]
    cP[0]["px"] = -cP[1]["px"]
    x_0 = cP[2]["px"] = cP[0]["px"] + cP[2]["vr"] * np.cos(beta_0)

    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float)) - lam0)
    phi = np.deg2rad(np.asarray(lat, float))
    sinphi, cosphi = np.sin(phi), np.cos(phi)
    vr, vaz = [], []
    at_ctl = np.zeros(np.shape(lam), dtype=bool)
    ctl_x = np.zeros(np.shape(lam))
    ctl_y = np.zeros(np.shape(lam))
    for i in range(3):
        r, az = vect(phi - cP[i]["phi"], cP[i]["cosphi"],
                     cP[i]["sinphi"], cosphi, sinphi,
                     lam - cP[i]["lam"])
        hit = (r == 0) & ~at_ctl
        ctl_x = np.where(hit, cP[i]["px"], ctl_x)
        ctl_y = np.where(hit, cP[i]["py"], ctl_y)
        at_ctl |= (r == 0)
        vr.append(r)
        vaz.append(_wrap_lam(az - cP[i]["vaz"]))
    x = np.full(np.shape(lam), x_0, dtype=float)
    y = np.full(np.shape(lam), y_0, dtype=float)
    for i in range(3):
        j = 0 if i == 2 else i + 1
        with np.errstate(divide="ignore", invalid="ignore"):
            a = lc(cP[i]["vr"], vr[i], vr[j])
        a = np.where(vaz[i] < 0, -a, a)
        if i == 0:
            x = x + vr[i] * np.cos(a)
            y = y - vr[i] * np.sin(a)
        elif i == 1:
            a = beta_1 - a
            x = x - vr[i] * np.cos(a)
            y = y - vr[i] * np.sin(a)
        else:
            a = beta_2 - a
            x = x + vr[i] * np.cos(a)
            y = y + vr[i] * np.sin(a)
    x = np.where(at_ctl, ctl_x, x / 3.0)
    y = np.where(at_ctl, ctl_y, y / 3.0)
    return x0 + R * x, y0 + R * y



# --- qsc (mproj pj_qsc; Quadrilateralized Spherical Cube, ellipsoidal
#     via the geocentric-latitude shift of [LK12]) ---

_QSC_FORTPI = np.pi / 4
_QSC_HALFPI = np.pi / 2


def _qsc_shift(lon, off):
    s = lon + off
    s = np.where(s < -np.pi, s + 2 * np.pi, s)
    return np.where(s > np.pi, s - 2 * np.pi, s)


def _qsc_face(lat0, lon0):
    phi0 = np.deg2rad(lat0)
    lam0 = np.deg2rad(lon0)
    if phi0 >= _QSC_HALFPI - _QSC_FORTPI / 2:
        return 4                     # top
    if phi0 <= -(_QSC_HALFPI - _QSC_FORTPI / 2):
        return 5                     # bottom
    if abs(lam0) <= _QSC_FORTPI:
        return 0                     # front
    if abs(lam0) <= _QSC_HALFPI + _QSC_FORTPI:
        return 1 if lam0 > 0 else 3  # right / left
    return 2                         # back


def _qsc_equat_theta(phi, yv, xv):
    """qsc_fwd_equat_face_theta, vectorized: returns (area, theta)."""
    theta = np.arctan2(yv, xv)
    a0 = np.abs(theta) <= _QSC_FORTPI
    a1 = (theta > _QSC_FORTPI) & (theta <= _QSC_HALFPI + _QSC_FORTPI)
    a2 = (theta > _QSC_HALFPI + _QSC_FORTPI) | \
        (theta <= -(_QSC_HALFPI + _QSC_FORTPI))
    area = np.select([a0, a1, a2], [0, 1, 2], 3)
    th = np.select(
        [a0, a1, a2],
        [theta, theta - _QSC_HALFPI,
         np.where(theta >= 0, theta - np.pi, theta + np.pi)],
        theta + _QSC_HALFPI)
    tiny = phi < 1e-10
    return np.where(tiny, 0, area), np.where(tiny, 0.0, th)


def qsc_fwd(lon, lat, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
    face = _qsc_face(lat0, lon0)
    one_minus_f = 1.0 - (1.0 - np.sqrt(ONE_ES))
    omf2 = one_minus_f * one_minus_f
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    latv = np.arctan(omf2 * np.tan(np.deg2rad(np.asarray(lat, float))))
    if face == 4:      # top
        phi = _QSC_HALFPI - latv
        c0 = (lam >= _QSC_FORTPI) & (lam <= _QSC_HALFPI + _QSC_FORTPI)
        c1 = (lam > _QSC_HALFPI + _QSC_FORTPI) | \
            (lam <= -(_QSC_HALFPI + _QSC_FORTPI))
        c2 = (lam > -(_QSC_HALFPI + _QSC_FORTPI)) & (lam <= -_QSC_FORTPI)
        area = np.select([c0, c1, c2], [0, 1, 2], 3)
        theta = np.select(
            [c0, c1, c2],
            [lam - _QSC_HALFPI,
             np.where(lam > 0, lam - np.pi, lam + np.pi),
             lam + _QSC_HALFPI], lam)
    elif face == 5:    # bottom
        phi = _QSC_HALFPI + latv
        c0 = (lam >= _QSC_FORTPI) & (lam <= _QSC_HALFPI + _QSC_FORTPI)
        c1 = (lam < _QSC_FORTPI) & (lam >= -_QSC_FORTPI)
        c2 = (lam < -_QSC_FORTPI) & (lam >= -(_QSC_HALFPI + _QSC_FORTPI))
        area = np.select([c0, c1, c2], [0, 1, 2], 3)
        theta = np.select(
            [c0, c1, c2],
            [-lam + _QSC_HALFPI, -lam, -lam - _QSC_HALFPI],
            np.where(lam > 0, -lam + np.pi, -lam - np.pi))
    else:
        if face == 1:
            lam = _qsc_shift(lam, _QSC_HALFPI)
        elif face == 2:
            lam = _qsc_shift(lam, np.pi)
        elif face == 3:
            lam = _qsc_shift(lam, -_QSC_HALFPI)
        sl, cl = np.sin(latv), np.cos(latv)
        sn, cn = np.sin(lam), np.cos(lam)
        q = cl * cn
        r_ = cl * sn
        s_ = sl
        if face == 0:
            phi = _aacos(q)
            area, theta = _qsc_equat_theta(phi, s_, r_)
        elif face == 1:
            phi = _aacos(r_)
            area, theta = _qsc_equat_theta(phi, s_, -q)
        elif face == 2:
            phi = _aacos(-q)
            area, theta = _qsc_equat_theta(phi, s_, -r_)
        else:
            phi = _aacos(-r_)
            area, theta = _qsc_equat_theta(phi, s_, q)
    mu = np.arctan(12.0 / np.pi * (theta + _aacos(np.sin(theta)
                   * np.cos(_QSC_FORTPI)) - _QSC_HALFPI))
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.sqrt(np.maximum(
            (1.0 - np.cos(phi))
            / (np.cos(mu) ** 2)
            / (1.0 - np.cos(np.arctan(1.0 / np.cos(theta)))), 0))
    mu = mu + np.select([area == 1, area == 2, area == 3],
                        [_QSC_HALFPI, np.pi, np.pi + _QSC_HALFPI], 0.0)
    return x0 + R * t * np.cos(mu), y0 + R * t * np.sin(mu)


def qsc_inv(x, y, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
    face = _qsc_face(lat0, lon0)
    b = np.sqrt(ONE_ES)              # b/a on the unit ellipse
    one_minus_f = 1.0 - (1.0 - b)
    omf2 = one_minus_f * one_minus_f
    xx = (np.asarray(x, float) - x0) / R
    yy = (np.asarray(y, float) - y0) / R
    nu = np.arctan(np.hypot(xx, yy))
    mu = np.arctan2(yy, xx)
    a0 = (xx >= 0) & (xx >= np.abs(yy))
    a1 = (yy >= 0) & (yy >= np.abs(xx))
    a2 = (xx < 0) & (-xx >= np.abs(yy))
    area = np.select([a0, a1, a2], [0, 1, 2], 3)
    mu = np.select([a0, a1, a2],
                   [mu, mu - _QSC_HALFPI,
                    np.where(mu < 0, mu + np.pi, mu - np.pi)],
                   mu + _QSC_HALFPI)
    t = np.pi / 12 * np.tan(mu)
    theta = np.arctan(np.sin(t) / (np.cos(t) - 1 / np.sqrt(2)))
    cosphi = np.clip(1.0 - np.cos(mu) ** 2 * np.tan(nu) ** 2
                     * (1.0 - np.cos(np.arctan(1.0 / np.cos(theta)))),
                     -1.0, 1.0)
    if face == 4:      # top
        phi = np.arccos(cosphi)
        lp_phi = _QSC_HALFPI - phi
        lp_lam = np.select(
            [area == 0, area == 1, area == 2],
            [theta + _QSC_HALFPI,
             np.where(theta < 0, theta + np.pi, theta - np.pi),
             theta - _QSC_HALFPI], theta)
    elif face == 5:    # bottom
        phi = np.arccos(cosphi)
        lp_phi = phi - _QSC_HALFPI
        lp_lam = np.select(
            [area == 0, area == 1, area == 2],
            [-theta + _QSC_HALFPI, -theta, -theta - _QSC_HALFPI],
            np.where(theta < 0, -theta - np.pi, -theta + np.pi))
    else:
        q = cosphi
        t2 = q * q
        s_ = np.where(t2 >= 1, 0.0,
                      np.sqrt(np.maximum(1 - t2, 0)) * np.sin(theta))
        t2 = t2 + s_ * s_
        r_ = np.where(t2 >= 1, 0.0, np.sqrt(np.maximum(1 - t2, 0)))
        # rotate into area
        r1 = np.where(area == 1, -s_,
                      np.where(area == 2, -r_,
                               np.where(area == 3, s_, r_)))
        s1 = np.where(area == 1, r_,
                      np.where(area == 2, -s_,
                               np.where(area == 3, -r_, s_)))
        r_, s_ = r1, s1
        # rotate into face
        if face == 1:
            q, r_ = -r_, q
        elif face == 2:
            q, r_ = -q, -r_
        elif face == 3:
            q, r_ = r_, -q
        lp_phi = np.arccos(-s_) - _QSC_HALFPI
        lp_lam = np.arctan2(r_, q)
        if face == 1:
            lp_lam = _qsc_shift(lp_lam, -_QSC_HALFPI)
        elif face == 2:
            lp_lam = _qsc_shift(lp_lam, -np.pi)
        elif face == 3:
            lp_lam = _qsc_shift(lp_lam, _QSC_HALFPI)
    # sphere -> ellipsoid shift
    inv_sign = lp_phi < 0
    tanphi = np.tan(lp_phi)
    xa = b / np.sqrt(tanphi * tanphi + omf2)
    phi_e = np.arctan(np.sqrt(np.maximum(1.0 - xa * xa, 0))
                      / (one_minus_f * xa))
    lp_phi = np.where(inv_sign, -phi_e, phi_e)
    return np.rad2deg(lp_lam) + lon0, np.rad2deg(lp_phi)


# --- healpix / rhealpix (mproj pj_healpix; ellipsoidal via authalic
#     latitude, P.a scaled to the authalic radius) ---

_HPX_ROT = [np.array(m, float) for m in (
    [[1, 0], [0, 1]], [[0, -1], [1, 0]], [[-1, 0], [0, -1]],
    [[0, 1], [-1, 0]], [[0, 1], [-1, 0]], [[-1, 0], [0, -1]],
    [[0, -1], [1, 0]])]


def _hpx_sphere(lam, phi):
    phi0 = np.arcsin(2.0 / 3.0)
    eq = np.abs(phi) <= phi0
    sigma = np.sqrt(np.maximum(3 * (1 - np.abs(np.sin(phi))), 0))
    cn = np.minimum(np.floor(2 * lam / np.pi + 2), 3)
    lamc = -3 * _QSC_FORTPI + _QSC_HALFPI * cn
    x = np.where(eq, lam, lamc + (lam - lamc) * sigma)
    y = np.where(eq, 3 * np.pi / 8 * np.sin(phi),
                 np.sign(phi) * _QSC_FORTPI * (2 - sigma))
    return x, y


def _hpx_sphere_inv(x, y):
    eq = np.abs(y) <= _QSC_FORTPI
    polar = (np.abs(y) < _QSC_HALFPI) & ~eq
    cn = np.minimum(np.floor(2 * x / np.pi + 2), 3)
    xc = -3 * _QSC_FORTPI + _QSC_HALFPI * cn
    tau = 2.0 - 4 * np.abs(y) / np.pi
    with np.errstate(divide="ignore", invalid="ignore"):
        lam_p = xc + (x - xc) / np.where(tau == 0, 1, tau)
    phi_p = np.sign(y) * _aasin(1.0 - tau ** 2 / 3.0)
    lam = np.select([eq, polar], [x, lam_p], -np.pi)
    phi = np.select([eq, polar],
                    [_aasin(8 * y / (3 * np.pi)), phi_p],
                    np.sign(y) * _QSC_HALFPI)
    return lam, phi


def _hpx_combine_caps(x, y, north_square, south_square, inverse):
    """mproj combine_caps, vectorized (matches the JS exactly,
    including its translate-to-square-0 forward `a` vector)."""
    north = y > _QSC_FORTPI
    south = y < -_QSC_FORTPI
    polar = north | south
    c_pole = np.where(north, _QSC_HALFPI, -_QSC_HALFPI)
    if not inverse:
        cn = np.select(
            [x < -_QSC_HALFPI, x < 0, x < _QSC_HALFPI], [0, 1, 2], 3)
        cx = np.select([cn == 0, cn == 1, cn == 2],
                       [-3 * _QSC_FORTPI, -_QSC_FORTPI, _QSC_FORTPI],
                       3 * _QSC_FORTPI)
        cy = c_pole
        pole = np.where(north, north_square, south_square)
        ridx = np.where(north, (cn - pole) % 4, (-(cn - pole)) % 4)
    else:
        sq = np.where(north, north_square, south_square)
        cx = -3 * _QSC_FORTPI + sq * _QSC_HALFPI
        cy = c_pole
        xs = x - sq * _QSC_HALFPI
        EPS = 1e-15
        n1 = (y >= -xs - _QSC_FORTPI - EPS) & \
            (y < xs + 5 * _QSC_FORTPI - EPS)
        n2 = (y > -xs - _QSC_FORTPI + EPS) & \
            (y >= xs + 5 * _QSC_FORTPI - EPS)
        n3 = (y <= -xs - _QSC_FORTPI + EPS) & \
            (y > xs + 5 * _QSC_FORTPI + EPS)
        s1 = (y <= xs + _QSC_FORTPI + EPS) & \
            (y > -xs - 5 * _QSC_FORTPI + EPS)
        s2 = (y < xs + _QSC_FORTPI - EPS) & \
            (y <= -xs - 5 * _QSC_FORTPI + EPS)
        s3 = (y >= xs + _QSC_FORTPI - EPS) & \
            (y < -xs - 5 * _QSC_FORTPI - EPS)
        cn_n = np.select([n1, n2, n3],
                         [(north_square + 1) % 4, (north_square + 2) % 4,
                          (north_square + 3) % 4], north_square)
        cn_s = np.select([s1, s2, s3],
                         [(south_square + 1) % 4, (south_square + 2) % 4,
                          (south_square + 3) % 4], south_square)
        cn = np.where(north, cn_n, cn_s)
        pole = np.where(north, north_square, south_square)
        ridx = np.where(north, (-(cn - pole)) % 4, (cn - pole) % 4)
    # rot index mapping: JS get_rotate_index maps 0..3 -> 0..3 and
    # -1/-2/-3 -> 4/5/6; (k % 4) with k in -3..3 gives the same matrix
    # because rot[4..6] mirror rot[3..1]: rot[(-1)%4=3]==rot[4], etc.
    vx = x - cx
    vy = y - cy
    rx = np.empty_like(np.asarray(x, float))
    ry = np.empty_like(rx)
    for k in range(4):
        m = _HPX_ROT[k]
        sel = ridx == k
        rx = np.where(sel, m[0, 0] * vx + m[0, 1] * vy, rx)
        ry = np.where(sel, m[1, 0] * vx + m[1, 1] * vy, ry)
    ax = -3 * _QSC_FORTPI + (cn if inverse else 0) * _QSC_HALFPI
    ay = _QSC_HALFPI
    ox = np.where(polar, rx + ax, x)
    oy = np.where(polar, ry + ay, y)
    return ox, oy


def _hpx_auth_consts():
    qp = float(_qsfn(1.0))
    ra = np.sqrt(0.5 * qp)           # authalic radius / a
    return qp, ra


def healpix_fwd(lon, lat, lon0=0.0, x0=0.0, y0=0.0):
    qp, ra = _hpx_auth_consts()
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    phi = np.arcsin(np.clip(_qsfn(np.sin(phi)) / qp, -1, 1))
    x, y = _hpx_sphere(lam, phi)
    return x0 + R * ra * x, y0 + R * ra * y


def healpix_inv(x, y, lon0=0.0, x0=0.0, y0=0.0):
    qp, ra = _hpx_auth_consts()
    xx = (np.asarray(x, float) - x0) / (R * ra)
    yy = (np.asarray(y, float) - y0) / (R * ra)
    lam, phi = _hpx_sphere_inv(xx, yy)
    phi = _authlat(phi)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def rhealpix_fwd(lon, lat, north_square=0, south_square=0, lon0=0.0,
                 x0=0.0, y0=0.0):
    ns, ss = int(north_square), int(south_square)
    if not (0 <= ns <= 3 and 0 <= ss <= 3):
        raise ValueError("+proj=rhealpix: north_square/south_square "
                         "must be 0..3")
    qp, ra = _hpx_auth_consts()
    lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
    phi = np.deg2rad(np.asarray(lat, float))
    phi = np.arcsin(np.clip(_qsfn(np.sin(phi)) / qp, -1, 1))
    x, y = _hpx_sphere(lam, phi)
    x, y = _hpx_combine_caps(x, y, ns, ss, False)
    return x0 + R * ra * x, y0 + R * ra * y


def rhealpix_inv(x, y, north_square=0, south_square=0, lon0=0.0,
                 x0=0.0, y0=0.0):
    ns, ss = int(north_square), int(south_square)
    qp, ra = _hpx_auth_consts()
    xx = (np.asarray(x, float) - x0) / (R * ra)
    yy = (np.asarray(y, float) - y0) / (R * ra)
    xx, yy = _hpx_combine_caps(xx, yy, ns, ss, True)
    lam, phi = _hpx_sphere_inv(xx, yy)
    phi = _authlat(phi)
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


# --- modified-stereographic polynomial grids (mproj pj_mod_ster):
#     mil_os, lee_os, gs48, alsk, gs50 ---

def _zpoly1c(z, C):
    """pj_zpoly1: z * sum_k C[k] z^k (complex Horner)."""
    r = np.full_like(z, C[-1])
    for k in range(len(C) - 2, -1, -1):
        r = C[k] + z * r
    return z * r


def _zpolyd1c(z, C):
    """Value and derivative of _zpoly1 (d/dz [z*a(z)])."""
    v = _zpoly1c(z, C)
    Cd = [(k + 1) * C[k] for k in range(len(C))]
    d = np.full_like(z, Cd[-1])
    for k in range(len(Cd) - 2, -1, -1):
        d = Cd[k] + z * d
    return v, d


def _mod_ster_family(AB, lam0_deg, phi0_deg, a, es, e=None):
    """pj_mod_ster with the family's fixed coefficients / datum.

    mproj quirk preserved: mil_os/lee_os/gs48 set ``P.es = 0`` (so the
    setup's chio branch takes the sphere path, chio = phi0) but leave
    ``P.e`` at the value pj_init derived from the default WGS84
    ellipsoid — and e_fwd/e_inv apply the conformal-latitude formula
    with ``P.e`` unconditionally.  So ``es`` only gates chio while
    ``e`` always shapes chi."""
    C = [complex(r, i) for r, i in AB]
    e = float(np.sqrt(es)) if e is None else float(e)
    phi0 = np.deg2rad(phi0_deg)
    esphi = e * np.sin(phi0)
    if es != 0:
        chio = 2 * np.arctan(np.tan((np.pi / 2 + phi0) * 0.5)
                             * ((1 - esphi) / (1 + esphi)) ** (e * 0.5)) \
            - np.pi / 2
    else:
        chio = phi0
    schio, cchio = np.sin(chio), np.cos(chio)

    def fwd(lon, lat, x0=0.0, y0=0.0):
        lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lam0_deg))
        phi = np.deg2rad(np.asarray(lat, float))
        esphi = e * np.sin(phi)
        chi = 2 * np.arctan(
            np.tan((np.pi / 2 + phi) * 0.5)
            * ((1 - esphi) / (1 + esphi)) ** (e * 0.5)) - np.pi / 2
        schi, cchi = np.sin(chi), np.cos(chi)
        s = 2 / (1 + schio * schi + cchio * cchi * np.cos(lam))
        z = (s * cchi * np.sin(lam)
             + 1j * s * (cchio * schi - schio * cchi * np.cos(lam)))
        p = _zpoly1c(z.astype(complex), C)
        return x0 + a * p.real, y0 + a * p.imag

    def inv(x, y, x0=0.0, y0=0.0):
        EPSLN = 1e-12
        xx = (np.asarray(x, float) - x0) / a
        yy = (np.asarray(y, float) - y0) / a
        z = (xx + 1j * yy).astype(complex)
        p = z.copy()
        for _ in range(20):
            f, fp = _zpolyd1c(p, C)
            f = f - z
            dp = -f * np.conj(fp) / (fp.real ** 2 + fp.imag ** 2)
            p = p + dp
            if np.all(np.abs(dp.real) + np.abs(dp.imag) <= EPSLN):
                break
        rh = np.abs(p)
        zz = 2 * np.arctan(0.5 * rh)
        sinz, cosz = np.sin(zz), np.cos(zz)
        small = np.abs(rh) <= EPSLN
        with np.errstate(divide="ignore", invalid="ignore"):
            chi = _aasin(cosz * schio
                         + p.imag * sinz * cchio
                         / np.where(rh == 0, 1, rh))
        phi = chi
        for _ in range(20):
            esphi = e * np.sin(phi)
            dphi = 2 * np.arctan(
                np.tan((np.pi / 2 + chi) * 0.5)
                * ((1 + esphi) / (1 - esphi)) ** (e * 0.5)) \
                - np.pi / 2 - phi
            phi = phi + dphi
            if np.all(np.abs(dphi) <= EPSLN):
                break
        lam = np.arctan2(p.real * sinz,
                         rh * cchio * cosz - p.imag * schio * sinz)
        lam = np.where(small, 0.0, lam)
        phi = np.where(small, phi0, phi)
        # pj_inv wraps AFTER adding lam0 (adjlon), so e.g. lee_os
        # round-trips 175 deg back to 175, not -185
        return (np.rad2deg(_wrap_lam(lam + np.deg2rad(lam0_deg))),
                np.rad2deg(phi))

    return fwd, inv


mil_os_fwd, mil_os_inv = _mod_ster_family(
    [(0.924500, 0), (0, 0), (0.019430, 0)], 20.0, 18.0, 6378137.0, 0.0,
    e=E)
lee_os_fwd, lee_os_inv = _mod_ster_family(
    [(0.721316, 0), (0, 0), (-0.0088162, -0.00617325)], -165.0, -10.0,
    6378137.0, 0.0, e=E)
gs48_fwd, gs48_inv = _mod_ster_family(
    [(0.98879, 0), (0, 0), (-0.050909, 0), (0, 0), (0.075528, 0)],
    -96.0, 39.0, 6370997.0, 0.0, e=E)
alsk_fwd, alsk_inv = _mod_ster_family(
    [(0.9945303, 0), (0.0052083, -0.0027404), (0.0072721, 0.0048181),
     (-0.0151089, -0.1932526), (0.0642675, -0.1381226),
     (0.3582802, -0.2884586)], -152.0, 64.0, 6378206.4, 0.00676866)
gs50_fwd, gs50_inv = _mod_ster_family(
    [(0.9827497, 0), (0.0210669, 0.0053804), (-0.1031415, -0.0571664),
     (-0.0323337, -0.0322847), (0.0502303, 0.1211983),
     (0.0251805, 0.0895678), (-0.0012315, -0.1416121),
     (0.0072202, -0.1317091), (-0.0194029, 0.0759677),
     (-0.0210072, 0.0834037)], -120.0, 45.0, 6378206.4, 0.00676866)


# --- ob_tran (mproj pj_ob_tran; general oblique transformation of a
#     base spherical projection) ---

def _ob_tran_pole(parts):
    TOL = 1e-10
    get = lambda k: np.deg2rad(float(parts[k]))
    if "o_alpha" in parts:
        lamc = get("o_lon_c")
        phic = get("o_lat_c")
        alpha = get("o_alpha")
        if abs(abs(phic) - np.pi / 2) <= TOL:
            raise ValueError("+proj=ob_tran: |o_lat_c| == 90")
        lamp = lamc + np.arctan2(-np.cos(alpha),
                                 -np.sin(alpha) * np.sin(phic))
        phip = _aasin(np.cos(phic) * np.sin(alpha))
    elif "o_lat_p" in parts:
        lamp = get("o_lon_p") if "o_lon_p" in parts else 0.0
        phip = get("o_lat_p")
    else:
        l1, p1 = get("o_lon_1"), get("o_lat_1")
        l2, p2 = get("o_lon_2"), get("o_lat_2")
        con = abs(p1)
        if (abs(p1 - p2) <= TOL or con <= TOL
                or abs(con - np.pi / 2) <= TOL
                or abs(abs(p2) - np.pi / 2) <= TOL):
            raise ValueError("+proj=ob_tran: bad o_lat_1/o_lat_2")
        lamp = np.arctan2(
            np.cos(p1) * np.sin(p2) * np.cos(l1)
            - np.sin(p1) * np.cos(p2) * np.cos(l2),
            np.sin(p1) * np.cos(p2) * np.sin(l2)
            - np.cos(p1) * np.sin(p2) * np.sin(l1))
        phip = np.arctan(-np.cos(lamp - l1) / np.tan(p1))
    return float(lamp), float(phip)


def _ob_tran_make(sub_fwd, sub_inv, lamp, phip, lon0):
    TOL = 1e-10
    oblique = abs(phip) > TOL
    cphip, sphip = np.cos(phip), np.sin(phip)

    def fwd(lon, lat, x0=0.0, y0=0.0):
        lam = _wrap_lam(np.deg2rad(np.asarray(lon, float) - lon0))
        phi = np.deg2rad(np.asarray(lat, float))
        cosphi, sinphi = np.cos(phi), np.sin(phi)
        coslam = np.cos(lam)
        if oblique:
            lam2 = _wrap_lam(np.arctan2(
                cosphi * np.sin(lam),
                sphip * cosphi * coslam + cphip * sinphi) + lamp)
            phi2 = _aasin(sphip * sinphi - cphip * cosphi * coslam)
        else:
            lam2 = _wrap_lam(np.arctan2(cosphi * np.sin(lam), sinphi)
                             + lamp)
            phi2 = _aasin(-cosphi * coslam)
        x, y = sub_fwd(np.rad2deg(lam2), np.rad2deg(phi2))
        return x + x0, y + y0

    def inv(x, y, x0=0.0, y0=0.0):
        lo, la = sub_inv(np.asarray(x, float) - x0,
                         np.asarray(y, float) - y0)
        lam = np.deg2rad(lo) - lamp
        phi = np.deg2rad(la)
        cosphi, sinphi = np.cos(phi), np.sin(phi)
        if oblique:
            coslam = np.cos(lam)
            phi2 = _aasin(sphip * sinphi + cphip * cosphi * coslam)
            lam2 = np.arctan2(cosphi * np.sin(lam),
                              sphip * cosphi * coslam - cphip * sinphi)
        else:
            phi2 = _aasin(cosphi * np.cos(lam))
            lam2 = np.arctan2(cosphi * np.sin(lam), -sinphi)
        return (np.rad2deg(_wrap_lam(lam2 + np.deg2rad(lon0))),
                np.rad2deg(phi2))

    return fwd, (inv if sub_inv is not None else None)


# alias index (reference src/geom/mapshaper-projections.js:4-9 plus the
# proj4 family names its tests use)
PROJECTIONS = {
    "webmercator": (webmercator_fwd, webmercator_inv),
    # proj4's +proj=merc defaults to the WGS84 ELLIPSOID (spherical
    # web-mercator is the separate webmercator alias, +a=+b)
    "merc": (merc_ell_fwd, merc_ell_inv),
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
    "tmerc": (tmerc_fwd, tmerc_inv),
    "etmerc": (etmerc_fwd, etmerc_inv),
    "stere": (stere_fwd, stere_inv),
    "laea": (laea_fwd, laea_inv),
    "eqdc": (eqdc_fwd, eqdc_inv),
    "cass": (cass_fwd, cass_inv),
    "aeqd": (aeqd_fwd, aeqd_inv),
    "moll": (moll_fwd, moll_inv),
    "mill": (mill_fwd, mill_inv),
    "gall": (gall_fwd, gall_inv),
    "cea": (cea_fwd, cea_inv),
    # round-3 wide batch (world + national-grid families)
    "ortho": (ortho_fwd, ortho_inv),
    "gnom": (gnom_fwd, gnom_inv),
    "natearth": (natearth_fwd, natearth_inv),
    "eck1": (eck1_fwd, eck1_inv),
    "eck2": (eck2_fwd, eck2_inv),
    "eck3": (eck3_fwd, eck3_inv),
    "eck4": (eck4_fwd, eck4_inv),
    "eck5": (eck5_fwd, eck5_inv),
    "eck6": (eck6_fwd, eck6_inv),
    "kav7": (kav7_fwd, kav7_inv),
    "hammer": (hammer_fwd, hammer_inv),
    "aitoff": (aitoff_fwd, aitoff_inv),
    "wintri": (wintri_fwd, wintri_inv),
    "vandg": (vandg_fwd, vandg_inv),
    "loxim": (loxim_fwd, loxim_inv),
    "times": (times_fwd, times_inv),
    "tcea": (tcea_fwd, tcea_inv),
    "goode": (goode_fwd, goode_inv),
    "sterea": (sterea_fwd, sterea_inv),
    "somerc": (somerc_fwd, somerc_inv),
    "krovak": (krovak_fwd, krovak_inv),
    "poly": (poly_fwd, poly_inv),
    "bonne": (bonne_fwd, bonne_inv),
    "omerc": (omerc_fwd, omerc_inv),
    "nzmg": (nzmg_fwd, nzmg_inv),
    # round-4 batch 2: remaining mproj families (full coverage of the
    # reference's pj_list except 3D geocent)
    "euler": (euler_fwd, euler_inv),
    "murd1": (murd1_fwd, murd1_inv),
    "murd2": (murd2_fwd, murd2_inv),
    "murd3": (murd3_fwd, murd3_inv),
    "pconic": (pconic_fwd, pconic_inv),
    "tissot": (tissot_fwd, tissot_inv),
    "vitk1": (vitk1_fwd, vitk1_inv),
    "leac": (leac_fwd, leac_inv),
    "airy": (airy_fwd, None),
    "wag6": (wag6_fwd, wag6_inv),
    "natearth2": (natearth2_fwd, natearth2_inv),
    "nsper": (nsper_fwd, nsper_inv),
    "tpers": (tpers_fwd, tpers_inv),
    "ocea": (ocea_fwd, ocea_inv),
    "tpeqd": (tpeqd_fwd, tpeqd_inv),
    "chamb": (chamb_fwd, None),
    "qsc": (qsc_fwd, qsc_inv),
    "healpix": (healpix_fwd, healpix_inv),
    "rhealpix": (rhealpix_fwd, rhealpix_inv),
    "mil_os": (mil_os_fwd, mil_os_inv),
    "lee_os": (lee_os_fwd, lee_os_inv),
    "gs48": (gs48_fwd, gs48_inv),
    "alsk": (alsk_fwd, alsk_inv),
    "gs50": (gs50_fwd, gs50_inv),
    # round-4 long-tail batch 1: remaining spherical pseudocylindricals
    # + misc-spherical (mproj pj_* kernels; fwd-only where the
    # reference has no inverse either)
    "lonlat": (_identity, _identity),
    "latlon": (_identity, _identity),
    "latlong": (_identity, _identity),
    "putp1": (putp1_fwd, putp1_inv),
    "putp2": (putp2_fwd, putp2_inv),
    "putp3": (putp3_fwd, putp3_inv),
    "putp3p": (putp3p_fwd, putp3p_inv),
    "putp4p": (putp4p_fwd, putp4p_inv),
    "weren": (weren_fwd, weren_inv),
    "putp5": (putp5_fwd, putp5_inv),
    "putp5p": (putp5p_fwd, putp5p_inv),
    "putp6": (putp6_fwd, putp6_inv),
    "putp6p": (putp6p_fwd, putp6p_inv),
    "wag1": (wag1_fwd, wag1_inv),
    "wag2": (wag2_fwd, wag2_inv),
    "wag3": (wag3_fwd, wag3_inv),
    "wag4": (wag4_fwd, wag4_inv),
    "wag5": (wag5_fwd, wag5_inv),
    "wag7": (wag7_fwd, None),
    "wink1": (wink1_fwd, wink1_inv),
    "wink2": (wink2_fwd, None),
    "urm5": (urm5_fwd, None),
    "urmfps": (urmfps_fwd, urmfps_inv),
    "kav5": (kav5_fwd, kav5_inv),
    "qua_aut": (qua_aut_fwd, qua_aut_inv),
    "fouc": (fouc_fwd, fouc_inv),
    "mbt_s": (mbt_s_fwd, mbt_s_inv),
    "mbt_fpp": (mbt_fpp_fwd, mbt_fpp_inv),
    "mbt_fpq": (mbt_fpq_fwd, mbt_fpq_inv),
    "mbt_fps": (mbt_fps_fwd, mbt_fps_inv),
    "mbtfps": (mbtfps_fwd, mbtfps_inv),
    "gn_sinu": (gn_sinu_fwd, gn_sinu_inv),
    "nell": (nell_fwd, nell_inv),
    "nell_h": (nell_h_fwd, nell_h_inv),
    "hatano": (hatano_fwd, hatano_inv),
    "boggs": (boggs_fwd, None),
    "crast": (crast_fwd, crast_inv),
    "denoy": (denoy_fwd, None),
    "gins8": (gins8_fwd, None),
    "august": (august_fwd, None),
    "bacon": (bacon_fwd, None),
    "apian": (apian_fwd, None),
    "ortel": (ortel_fwd, None),
    "vandg2": (vandg2_fwd, None),
    "vandg3": (vandg3_fwd, None),
    "vandg4": (vandg4_fwd, None),
    "gilbert": (gilbert_fwd, None),
}

# +ellps= shorthand table (mproj pj_ellps entries used by the fixtures)
_ELLPS = {"krass": (6378245.0, 298.3),
          "GRS80": (6378137.0, 298.257222101),
          "WGS84": (6378137.0, 298.257223563),
          "intl": (6378388.0, 297.0),
          "bessel": (6377397.155, 299.1528128),
          "clrk66": (6378206.4, 294.9786982),
          "clrk80": (6378249.145, 293.4663),
          "airy": (6377563.396, 299.3249646),
          "GRS67": (6378160.0, 298.2471674270),
          "aust_SA": (6378160.0, 298.25),
          "sphere": (6370997.0, float("inf"))}


def _resolve_ellps(parts, kw):
    """+ellps= / +a=+rf= → kw a/rf; UNKNOWN ellps names error instead
    of silently projecting on WGS84."""
    if "ellps" in parts:
        if parts["ellps"] not in _ELLPS:
            raise ValueError(f"unknown +ellps={parts['ellps']!r}; "
                             f"known: {sorted(_ELLPS)}")
        a, rf = _ELLPS[parts["ellps"]]
        kw.setdefault("a", a)
        kw.setdefault("rf", rf)
    return kw

_PARAM_KEYS = {"lat_1": "lat1", "lat_2": "lat2", "lat_0": "lat0",
               "lon_0": "lon0", "lat_ts": "lat_ts", "k": "k0",
               "k_0": "k0", "x_0": "x0", "y_0": "y0", "a": "a",
               "rf": "rf", "lonc": "lonc", "alpha": "alpha",
               "gamma": "gamma", "lon_1": "lon1", "lon_2": "lon2",
               "W": "W", "M": "M", "n": "n", "m": "m", "q": "q",
               "h": "h", "tilt": "tilt", "azi": "azi",
               "lat_3": "lat3", "lon_3": "lon3", "lat_b": "lat_b",
               "north_square": "north_square",
               "south_square": "south_square"}

# PROJ4's zero defaults, applied to '+proj=' strings only (the alias
# kernels keep the reference aliases' bound parameters, e.g. 'albers'
# = AlbersNYT's 29.5/45.5/37.5/-96)
_PROJ4_PARAM_DEFAULTS = {
    "aea": dict(lat1=0.0, lat2=0.0, lat0=0.0, lon0=0.0),
    "albers": dict(lat1=0.0, lat2=0.0, lat0=0.0, lon0=0.0),
    "lcc": dict(lat1=0.0, lat2=0.0, lat0=0.0, lon0=0.0),
    "eqdc": dict(lat1=0.0, lat2=0.0, lat0=0.0, lon0=0.0),
    "laea": dict(lat0=0.0, lon0=0.0),
    "stere": dict(lat0=0.0, lon0=0.0),
    "eqc": dict(lat_ts=0.0),
    "sinu": dict(lon0=0.0),
    "sinusoidal": dict(lon0=0.0),
    "robin": dict(lon0=0.0),
    "robinson": dict(lon0=0.0),
    "cass": dict(lat0=0.0, lon0=0.0),
    "aeqd": dict(lat0=0.0, lon0=0.0),
    "moll": dict(lon0=0.0),
    "mill": dict(lon0=0.0),
    "gall": dict(lon0=0.0),
    "cea": dict(lat_ts=0.0, lon0=0.0),
}


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
        if name == "utm":
            # UTM zone = tmerc with fixed constants (pj_utm):
            # lon0 = zone*6 - 183, k0 = 0.9996, x0 = 500 km,
            # y0 = 10000 km in the southern hemisphere
            zone = int(parts["zone"])
            kw = dict(lon0=zone * 6.0 - 183.0, k0=0.9996, x0=500000.0,
                      y0=1e7 if "south" in parts else 0.0)
            _resolve_ellps(parts, kw)
            return (functools.partial(etmerc_fwd, **kw),
                    functools.partial(etmerc_inv, **kw))
        if name == "ups":
            # pj_ups: polar stereographic with fixed constants
            # (lat_0 = +-90, k0 = 0.994, false easting/northing 2e6)
            kw = dict(lat0=-90.0 if "south" in parts else 90.0,
                      k0=0.994, x0=2e6, y0=2e6)
            _resolve_ellps(parts, kw)
            return (functools.partial(stere_fwd, **kw),
                    functools.partial(stere_inv, **kw))
        if name == "ob_tran":
            # pj_ob_tran: rotate the sphere, delegate to o_proj's
            # kernel (spherical base, default params)
            o_name = parts.get("o_proj", "")
            if not o_name or o_name == "ob_tran" \
                    or o_name not in PROJECTIONS:
                raise ValueError("+proj=ob_tran requires a supported "
                                 "+o_proj= family")
            lamp, phip = _ob_tran_pole(parts)
            sub_fwd, sub_inv = PROJECTIONS[o_name]
            lon0 = float(parts.get("lon_0", 0) or 0)
            return _ob_tran_make(sub_fwd, sub_inv, lamp, phip, lon0)
        if name not in PROJECTIONS:
            raise ValueError(f"unsupported +proj={name!r}; "
                             f"available: {sorted(PROJECTIONS)}")
        kw = {dst: float(parts[src]) for src, dst in _PARAM_KEYS.items()
              if src in parts and parts[src] != ""}
        _resolve_ellps(parts, kw)
        # valueless proj4 flags (mproj pj_param 't'/'b' lookups)
        if name == "omerc":
            for flag in ("no_rot", "no_off", "no_uoff"):
                if flag in parts:
                    kw["no_off" if flag == "no_uoff" else flag] = True
        if name == "krovak" and "czech" in parts:
            kw["czech"] = True
        if name == "aeqd" and "guam" in parts:
            kw["guam"] = True
        if name == "leac" and "south" in parts:
            kw["south"] = True
        if name == "airy" and "no_cut" in parts:
            kw["no_cut"] = True
        # '+proj=' strings take PROJ4's zero defaults, NOT the alias
        # kernels' reference-alias defaults (mproj: bare +proj=aea
        # projects at lat_0=0/lon_0=0; bare +proj=lcc errors) —
        # verified live against the reference CLI
        for k, v in _PROJ4_PARAM_DEFAULTS.get(name, {}).items():
            kw.setdefault(k, v)
        if name in ("aea", "albers", "lcc", "eqdc") and \
                kw.get("lat1", 0.0) == -kw.get("lat2", 0.0):
            raise ValueError(
                f"Unable to use projection +proj={name} "
                f"(conic lat_1 = -lat_2)")
        fwd, inv = PROJECTIONS[name]
        # drop kwargs the family's kernel doesn't model (e.g. +ellps=
        # on a spherical-only family — mproj forces es=0 there too),
        # but reject explicit user params the kernel can't honor
        import inspect
        accepted = set(inspect.signature(fwd).parameters)
        derived = {"a", "rf"} if "ellps" in parts else set()
        bad = {k for k in kw if k not in accepted} - derived
        if bad:
            raise ValueError(f"+proj={name} does not support "
                             f"parameter(s) {sorted(bad)}")
        kw = {k: v for k, v in kw.items() if k in accepted}
        bfwd = functools.partial(fwd, **kw) if kw and fwd else fwd
        binv = functools.partial(inv, **kw) if kw and inv else inv
        return bfwd, binv
    raise ValueError(f"unknown projection {defn!r}; "
                     f"available: {sorted(PROJECTIONS)}")


def _compose(proj, from_proj):
    """fwd(lon,lat) for to-CRS, optionally preceded by inverse of the
    source CRS (the -proj from= option; match= callers pass the other
    layer's recorded CRS string here)."""
    fwd, _ = resolve_projection(proj) if isinstance(proj, str) \
        else proj
    if fwd is None:
        raise ValueError(f"projection {proj!r} has no forward transform")
    if from_proj is None or (isinstance(from_proj, str) and
                             from_proj in ("wgs84", "longlat")):
        return fwd
    _, inv = resolve_projection(from_proj) \
        if isinstance(from_proj, str) else from_proj
    if inv is None:
        raise ValueError(f"projection {from_proj!r} has no inverse; "
                         "cannot use as from=")

    def composed(x, y):
        lon, lat = inv(x, y)
        return fwd(lon, lat)
    return composed


def geocent_fwd(lon, lat, h=None, a=6378137.0,
                f=1.0 / 298.257223563):
    """mproj `geocent` (the one pj_list name outside the planar
    registry — it is a 3D coordinate conversion): geodetic lon/lat
    [+ ellipsoidal height h, default 0] → ECEF x/y/z metres on the
    WGS84 ellipsoid.  Public PROJ geocent.c math:
    N = a/sqrt(1 - e² sin²φ); x = (N+h)cosφcosλ; y = (N+h)cosφsinλ;
    z = (N(1-e²)+h)sinφ."""
    lam = np.deg2rad(np.asarray(lon, np.float64))
    phi = np.deg2rad(np.asarray(lat, np.float64))
    e2 = f * (2.0 - f)
    sphi, cphi = np.sin(phi), np.cos(phi)
    N = a / np.sqrt(1.0 - e2 * sphi * sphi)
    hh = 0.0 if h is None else np.asarray(h, np.float64)
    return ((N + hh) * cphi * np.cos(lam),
            (N + hh) * cphi * np.sin(lam),
            (N * (1.0 - e2) + hh) * sphi)


def geocent_inv(x, y, z, a=6378137.0, f=1.0 / 298.257223563):
    """ECEF → geodetic lon/lat/h via Bowring's closed-form (public):
    sub-millimetre for terrestrial points, no iteration."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    b = a * (1.0 - f)
    e2 = f * (2.0 - f)
    ep2 = e2 / (1.0 - e2)
    p = np.hypot(x, y)
    th = np.arctan2(z * a, p * b)
    phi = np.arctan2(z + ep2 * b * np.sin(th) ** 3,
                     p - e2 * a * np.cos(th) ** 3)
    sphi = np.sin(phi)
    N = a / np.sqrt(1.0 - e2 * sphi * sphi)
    with np.errstate(divide="ignore", invalid="ignore"):
        h = np.where(np.abs(np.cos(phi)) > 1e-12,
                     p / np.cos(phi) - N,
                     np.abs(z) - b)
    return np.rad2deg(np.arctan2(y, x)), np.rad2deg(phi), h


def geocent_points(ds, lon_col="lon", lat_col="lat", h_col=None,
                   x_col="x", y_col="y", z_col="z"):
    """Flat lon/lat[/h] columns → ECEF x/y/z columns (zero-copy
    Arrow) — the 3D sibling of project_points for the mproj
    `geocent` surface."""
    def go(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        h = batch[h_col].to_numpy(zero_copy_only=False) \
            if h_col else None
        x, y, z = geocent_fwd(lon, lat, h)
        batch = batch.append_column(x_col,
                                    pa.array(x, type=pa.float64()))
        batch = batch.append_column(y_col,
                                    pa.array(y, type=pa.float64()))
        return batch.append_column(z_col,
                                   pa.array(z, type=pa.float64()))
    return ds.map_batches(go, batch_format="pyarrow")


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


def project_layer(ds, proj="webmercator", from_proj=None,
                  densify=False):
    """Layer-model Dataset (rings/parts/points) → projected coordinates,
    same schema (the -proj in-place semantics).  ``densify`` applies
    the reference's projectAndDensifyArcs
    (src/commands/mapshaper-proj.js:152-201): unprojected midpoints are
    recursively bisected and their projections inserted wherever a
    long projected segment deviates from the projected chord by more
    than half the default interval (the projected size of the average
    segment at the layer center)."""
    fwd = _compose(proj, from_proj)
    from ..ops.features import _map_coords
    if not densify:
        return _map_coords(ds, lambda x, y: fwd(x, y)[0],
                           lambda x, y: fwd(x, y)[1])
    interval = _default_densify_interval(ds, fwd)
    return _densify_project(ds, fwd, interval)


def _default_densify_interval(ds, fwd) -> float:
    """getDefaultDensifyInterval (mapshaper-proj.js:152-158): project
    the layer-bbox center and center+avg-segment; their 2-D distance is
    the interval.  Avg segment = mean |dx|, mean |dy| over every path
    segment (getAvgSegment2) — computed as one distributed partial
    pass."""
    import pandas as pd

    from ..sources.layers import geom_type_of, nz

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        gt = geom_type_of(list(df.columns))
        cols = ("rings_x", "rings_y") if gt == "polygon" else \
            ("part_x", "part_y")
        sdx = sdy = 0.0
        n = 0
        xmin = ymin = np.inf
        xmax = ymax = -np.inf
        for xs, ys in zip(df[cols[0]], df[cols[1]]):
            for x, y in zip(nz(xs), nz(ys)):
                x = np.asarray(x, float)
                y = np.asarray(y, float)
                if len(x) == 0:
                    continue
                sdx += np.abs(np.diff(x)).sum()
                sdy += np.abs(np.diff(y)).sum()
                n += len(x) - 1
                xmin = min(xmin, x.min()); xmax = max(xmax, x.max())
                ymin = min(ymin, y.min()); ymax = max(ymax, y.max())
        return pd.DataFrame([{"sdx": sdx, "sdy": sdy, "n": n,
                              "xmin": xmin, "ymin": ymin,
                              "xmax": xmax, "ymax": ymax}])

    t = ds.map_batches(partial, batch_format="pandas").to_pandas()
    n = max(int(t["n"].sum()), 1)
    ax, ay = t["sdx"].sum() / n, t["sdy"].sum() / n
    cx = (t["xmin"].min() + t["xmax"].max()) / 2
    cy = (t["ymin"].min() + t["ymax"].max()) / 2
    pa = fwd(np.array([cx]), np.array([cy]))
    pb = fwd(np.array([cx + ax]), np.array([cy + ay]))
    return float(np.hypot(pb[0][0] - pa[0][0], pb[1][0] - pa[1][0]))


def _densify_segment(lng0, lat0, x0, y0, lng2, lat2, x2, y2, fwd,
                     interval, out):
    """densifySegment (mapshaper-proj.js:163-184): bisect while the
    projected midpoint deviates from the projected chord by more than
    interval/2, guarding tiny unprojected segments."""
    lng1 = (lng0 + lng2) / 2
    lat1 = (lat0 + lat2) / 2
    p = fwd(np.array([lng1]), np.array([lat1]))
    px, py = float(p[0][0]), float(p[1][0])
    # pointSegDistSq
    dx, dy = x2 - x0, y2 - y0
    d2 = dx * dx + dy * dy
    if d2 > 0:
        t = ((px - x0) * dx + (py - y0) * dy) / d2
        t = min(max(t, 0.0), 1.0)
    else:
        t = 0.0
    qx, qy = x0 + t * dx, y0 + t * dy
    dist_sq = (px - qx) ** 2 + (py - qy) ** 2
    if dist_sq > interval * interval * 0.25 and \
            np.hypot(lng2 - lng0, lat2 - lat0) > 0.01:
        _densify_segment(lng0, lat0, x0, y0, lng1, lat1, px, py, fwd,
                         interval, out)
        out.append((px, py))
        _densify_segment(lng1, lat1, px, py, lng2, lat2, x2, y2, fwd,
                         interval, out)


def _densify_project(ds, fwd, interval: float):
    import pandas as pd

    from ..sources.layers import geom_type_of, nz
    thresh = interval * interval * 25

    def go(df: pd.DataFrame) -> pd.DataFrame:
        gt = geom_type_of(list(df.columns))
        df = df.copy()
        if gt == "point":
            nx, ny = [], []
            for xs, ys in zip(df["px"], df["py"]):
                p = fwd(np.asarray(nz(xs), float),
                        np.asarray(nz(ys), float))
                nx.append(list(map(float, p[0])))
                ny.append(list(map(float, p[1])))
            df["px"], df["py"] = nx, ny
            return df
        cols = ("rings_x", "rings_y") if gt == "polygon" else \
            ("part_x", "part_y")
        new_x, new_y = [], []
        for xs, ys in zip(df[cols[0]], df[cols[1]]):
            rxs, rys = [], []
            for x, y in zip(nz(xs), nz(ys)):
                x = np.asarray(x, float)
                y = np.asarray(y, float)
                px, py = fwd(x, y)
                ox = [float(px[0])]
                oy = [float(py[0])]
                for i in range(1, len(x)):
                    if (px[i] - px[i - 1]) ** 2 + \
                            (py[i] - py[i - 1]) ** 2 > thresh:
                        mids: list = []
                        _densify_segment(
                            x[i - 1], y[i - 1], float(px[i - 1]),
                            float(py[i - 1]), x[i], y[i],
                            float(px[i]), float(py[i]), fwd,
                            interval, mids)
                        for mx, my in mids:
                            ox.append(mx)
                            oy.append(my)
                    ox.append(float(px[i]))
                    oy.append(float(py[i]))
                rxs.append(ox)
                rys.append(oy)
            new_x.append(rxs)
            new_y.append(rys)
        df[cols[0]] = new_x
        df[cols[1]] = new_y
        return df
    return ds.map_batches(go, batch_format="pandas")
