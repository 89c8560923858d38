"""Planar + spherical geometry kernels.

Vectorized numpy re-implementations of the scalar primitives in the
reference's ``src/geom/mapshaper-geom.js`` and
``src/geom/mapshaper-shape-geom.js`` (cited per function).  All functions
accept scalars or numpy arrays and broadcast; semantics (including exact
float formulas and edge-case rules) follow the reference so that
simplification thresholds and point-in-polygon verdicts are reproducible.
"""

from __future__ import annotations

import numpy as np

R = 6378137.0  # spherical earth radius, src/geom/mapshaper-geom.js:3
D2R = np.pi / 180.0


# ---------------------------------------------------------------------------
# distances

def distance_sq(ax, ay, bx, by):
    """src/geom/mapshaper-geom.js:18-22"""
    dx = ax - bx
    dy = ay - by
    return dx * dx + dy * dy


def distance2d(ax, ay, bx, by):
    return np.sqrt(distance_sq(ax, ay, bx, by))


def distance_sq_3d(ax, ay, az, bx, by, bz):
    dx = ax - bx
    dy = ay - by
    dz = az - bz
    return dx * dx + dy * dy + dz * dz


def distance3d(ax, ay, az, bx, by, bz):
    return np.sqrt(distance_sq_3d(ax, ay, az, bx, by, bz))


def great_circle_distance(lng1, lat1, lng2, lat2):
    """Haversine, meters.  src/geom/mapshaper-geom.js:185-199"""
    lam1, phi1 = np.asarray(lng1) * D2R, np.asarray(lat1) * D2R
    lam2, phi2 = np.asarray(lng2) * D2R, np.asarray(lat2) * D2R
    dlam = lam2 - lam1
    dphi = phi2 - phi1
    a = (np.sin(dphi / 2) ** 2 +
         np.cos(phi1) * np.cos(phi2) * np.sin(dlam / 2) ** 2)
    return 2 * np.arctan2(np.sqrt(a), np.sqrt(1 - a)) * R


def lnglat_to_xyz(lng, lat):
    """Unit-sphere (scaled by R) coords.  src/geom/mapshaper-geom.js:171-178"""
    lng = np.asarray(lng, dtype=np.float64) * D2R
    lat = np.asarray(lat, dtype=np.float64) * D2R
    cos_lat = np.cos(lat)
    return (np.cos(lng) * cos_lat * R,
            np.sin(lng) * cos_lat * R,
            np.sin(lat) * R)


# ---------------------------------------------------------------------------
# triangle metrics (Visvalingam)

def triangle_area(ax, ay, bx, by, cx, cy):
    """src/geom/mapshaper-geom.js:243-246"""
    return np.abs(((ay - cy) * (bx - cx) + (by - cy) * (cx - ax)) / 2)


def _det_sq(ax, ay, bx, by, cx, cy):
    det = ax * by - ax * cy + bx * cy - bx * ay + cx * ay - cx * by
    return det * det


def triangle_area_3d(ax, ay, az, bx, by, bz, cx, cy, cz):
    """src/geom/mapshaper-geom.js:284-288"""
    return 0.5 * np.sqrt(_det_sq(ax, ay, bx, by, cx, cy) +
                         _det_sq(ax, az, bx, bz, cx, cz) +
                         _det_sq(ay, az, by, bz, cy, cz))


def cosine(ax, ay, bx, by, cx, cy):
    """Cosine of angle abc, clamped.  src/geom/mapshaper-geom.js:253-263"""
    den = distance2d(ax, ay, bx, by) * distance2d(bx, by, cx, cy)
    with np.errstate(invalid="ignore", divide="ignore"):
        cos = np.where(den > 0,
                       ((ax - bx) * (cx - bx) + (ay - by) * (cy - by)) / np.where(den > 0, den, 1.0),
                       0.0)
    return np.clip(cos, -1.0, 1.0)


def cosine3d(ax, ay, az, bx, by, bz, cx, cy, cz):
    den = distance3d(ax, ay, az, bx, by, bz) * distance3d(bx, by, bz, cx, cy, cz)
    with np.errstate(invalid="ignore", divide="ignore"):
        cos = np.where(
            den > 0,
            ((ax - bx) * (cx - bx) + (ay - by) * (cy - by) + (az - bz) * (cz - bz))
            / np.where(den > 0, den, 1.0),
            0.0)
    return np.clip(cos, -1.0, 1.0)


# ---------------------------------------------------------------------------
# point-segment distance (Douglas-Peucker metric)

def _apex_dist_sq(ab2, bc2, ac2):
    """src/geom/mapshaper-geom.js:297-313 (same arg roles as reference)."""
    ab2 = np.asarray(ab2, dtype=np.float64)
    bc2 = np.asarray(bc2, dtype=np.float64)
    ac2 = np.asarray(ac2, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        dval = ab2 + ac2 - bc2
        interior = ab2 - dval * dval / np.where(ac2 != 0, ac2, 1.0) * 0.25
    dist2 = np.where(ac2 == 0, ab2,
                     np.where(ab2 >= bc2 + ac2, bc2,
                              np.where(bc2 >= ab2 + ac2, ab2, interior)))
    return np.maximum(dist2, 0.0)


def point_seg_dist_sq(px, py, ax, ay, bx, by):
    """Squared distance from point p to segment ab.
    src/geom/mapshaper-geom.js:331-336 (pointSegDistSq)."""
    pa2 = distance_sq(px, py, ax, ay)
    pb2 = distance_sq(px, py, bx, by)
    ab2 = distance_sq(ax, ay, bx, by)
    return _apex_dist_sq(pa2, pb2, ab2)


def point_seg_dist_sq_3d(px, py, pz, ax, ay, az, bx, by, bz):
    pa2 = distance_sq_3d(px, py, pz, ax, ay, az)
    pb2 = distance_sq_3d(px, py, pz, bx, by, bz)
    ab2 = distance_sq_3d(ax, ay, az, bx, by, bz)
    return _apex_dist_sq(pa2, pb2, ab2)


# ---------------------------------------------------------------------------
# ring / path metrics

def planar_ring_area(x, y):
    """Signed area of a closed ring (first point relatively translated to
    reduce float error, like src/geom/mapshaper-shape-geom.js:263-280).
    Positive = clockwise in screen coords / mapshaper convention."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if len(x) < 3:
        return 0.0
    ax = x - x[0]
    ay = y - y[0]
    # sum of cross products b x a over consecutive pairs (matches reference loop)
    s = np.sum(ax[1:] * ay[:-1] - ax[:-1] * ay[1:])
    return s / 2.0


def spherical_ring_area(lng, lat):
    """Signed spherical ring area, m^2.  src/geom/mapshaper-shape-geom.js:225-245"""
    x = np.asarray(lng, dtype=np.float64) * D2R
    y = np.sin(np.asarray(lat, dtype=np.float64) * D2R)
    if len(x) < 3:
        return 0.0
    s = np.sum((x[1:] - x[:-1]) * (2 + y[1:] + y[:-1]))
    return s / 2.0 * R * R


def ring_bounds(x, y):
    return (float(np.min(x)), float(np.min(y)), float(np.max(x)), float(np.max(y)))


def path_length(x, y):
    return float(np.sum(np.sqrt(np.diff(np.asarray(x, dtype=np.float64)) ** 2 +
                                np.diff(np.asarray(y, dtype=np.float64)) ** 2)))


def ring_centroid(x, y):
    """Area-weighted centroid of a closed ring.
    src/points/mapshaper-polygon-centroid.js:11-35 semantics."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    ax, ay = x - x[0], y - y[0]
    cross = ax[:-1] * ay[1:] - ax[1:] * ay[:-1]
    area = np.sum(cross) / 2.0
    if area == 0:
        return float(np.mean(x[:-1])), float(np.mean(y[:-1]))
    sx = np.sum((ax[:-1] + ax[1:]) * cross) / (6.0 * area)
    sy = np.sum((ay[:-1] + ay[1:]) * cross) / (6.0 * area)
    return float(sx + x[0]), float(sy + y[0])


# ---------------------------------------------------------------------------
# point-in-ring (vectorized over many points vs one ring)

def points_in_ring(px, py, rx, ry, chunk=4096):
    """Test many points against one closed ring.

    Returns int8 array: 0 outside, 1 inside, -1 on boundary.
    Port of the vertical-ray crossing rules of
    ``src/geom/mapshaper-shape-geom.js:145-223`` (testPointInRing /
    getRayIntersection): a segment whose x-interval is treated half-open
    ``(xmin, xmax]`` scores a crossing when the upward ray hits it; exact
    float equality with the interpolated y-intercept, a vertex, or a
    vertical segment reports "on boundary".
    """
    px = np.atleast_1d(np.asarray(px, dtype=np.float64))
    py = np.atleast_1d(np.asarray(py, dtype=np.float64))
    rx = np.asarray(rx, dtype=np.float64)
    ry = np.asarray(ry, dtype=np.float64)
    ax, ay = rx[:-1], ry[:-1]
    bx, by = rx[1:], ry[1:]
    out = np.zeros(len(px), dtype=np.int8)
    seg_xmin = np.minimum(ax, bx)
    seg_xmax = np.maximum(ax, bx)
    vertical = ax == bx
    seg_ymin = np.minimum(ay, by)
    seg_ymax = np.maximum(ay, by)
    nondegen = ~vertical
    # precompute slope for y-intercept
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = np.where(nondegen, (by - ay) / np.where(nondegen, bx - ax, 1.0), 0.0)
    for s in range(0, len(px), chunk):
        X = px[s:s + chunk, None]
        Y = py[s:s + chunk, None]
        in_x = (X > seg_xmin) & (X <= seg_xmax) & nondegen
        y_int = ay + (X - ax) * slope
        crossing = in_x & (y_int > Y)
        on_edge = in_x & (y_int == Y)
        # vertical segments: on if x matches and y within [ymin, ymax]
        on_vert = vertical & (X == ax) & (Y >= seg_ymin) & (Y <= seg_ymax)
        # vertex coincidence (covers left-endpoint alignment excluded by half-open rule)
        on_vtx = (X == ax) & (Y == ay)
        on = (on_edge | on_vert | on_vtx).any(axis=1)
        inside = (crossing.sum(axis=1) & 1).astype(bool)
        res = np.where(on, -1, np.where(inside, 1, 0)).astype(np.int8)
        out[s:s + chunk] = res
    return out


def points_in_shape(px, py, rings):
    """Even-odd test of points against a multi-ring shape.

    ``rings``: iterable of (rx, ry) closed rings.  Port of
    ``geom.testPointInPolygon`` (src/geom/mapshaper-shape-geom.js:68-82):
    inside flips per containing ring; on-boundary counts as inside.
    Returns bool array.
    """
    px = np.atleast_1d(np.asarray(px, dtype=np.float64))
    is_in = np.zeros(len(px), dtype=bool)
    is_on = np.zeros(len(px), dtype=bool)
    for rx, ry in rings:
        r = points_in_ring(px, py, rx, ry)
        is_in ^= (r == 1)
        is_on |= (r == -1)
    return is_on | is_in


def segment_intersection(ax, ay, bx, by, cx, cy, dx, dy):
    """Proper-crossing point of segments ab and cd (or None).

    Simplified port of ``findCrossIntersection``
    (src/geom/mapshaper-segment-geom.js:17-112): returns the intersection
    point when the segments cross at interior points or touch at a shared
    endpoint-interior; collinear overlap returns None.
    """
    def orient(px_, py_, qx, qy, rx_, ry_):
        return (qy - py_) * (rx_ - qx) - (qx - px_) * (ry_ - qy)

    o1 = orient(ax, ay, bx, by, cx, cy)
    o2 = orient(ax, ay, bx, by, dx, dy)
    o3 = orient(cx, cy, dx, dy, ax, ay)
    o4 = orient(cx, cy, dx, dy, bx, by)
    strict = (o1 > 0) != (o2 > 0) and o1 != 0 and o2 != 0 and \
             (o3 > 0) != (o4 > 0) and o3 != 0 and o4 != 0
    touching = ((o1 > 0) != (o2 > 0) or o1 == 0 or o2 == 0) and \
               ((o3 > 0) != (o4 > 0) or o3 == 0 or o4 == 0)
    if strict or touching:
        den = (bx - ax) * (dy - cy) - (by - ay) * (dx - cx)
        if den == 0:
            return None  # collinear / parallel
        t = ((cx - ax) * (dy - cy) - (cy - ay) * (dx - cx)) / den
        if t < 0 or t > 1:
            return None
        x = ax + t * (bx - ax)
        y = ay + t * (by - ay)
        if strict:
            # both orientation pairs strictly flip: the crossing is
            # mathematically interior to both segments — an exact bbox
            # re-check can reject it on 1-ULP rounding of t along AB
            # (measured: lost a true crossing, dropping a mosaic face)
            return (x, y)
        # endpoint-touch cases: confirm the hit lies within cd's bbox
        if min(cx, dx) <= x <= max(cx, dx) and min(cy, dy) <= y <= max(cy, dy):
            return (x, y)
    return None
