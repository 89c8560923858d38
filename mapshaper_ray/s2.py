"""Vectorized S2 cell ids + conservative polygon cell covers.

Implements the public S2 Geometry Library cell-id scheme
(s2geometry.io/devguide/s2cell_hierarchy; the Apache-2.0 s2geometry
sources define the constants) as pure-numpy kernels:

    lon/lat -> unit-sphere XYZ -> cube face (u,v) -> quadratic (s,t)
            -> 30-level Hilbert curve position packed in a uint64

Nothing here touches Ray — cell assignment is a plain vectorized call
inside ``map_batches``.  The engine's default partitioning scheme stays
the equirect quadkey grid (``cells.py`` — SQL-expressible, so the
oracle gate can check assignments value-exactly); this module is the
north-star "H3/S2 cell covers" path: uniform-area cells with no polar
row blowup, ``parent``/``range_min``/``range_max`` prefix algebra for
cell joins, Hilbert locality (contiguous id ranges are spatially
local, so range-sharding by id is a spatial partition), and
conservative polygon covers (``polygon_cover``) for tiling the
polygon side of a spatial join.

Layout of a cell id (S2 convention): 3 face bits, then 2 bits per
level of Hilbert child position (most-significant first), then a
single trailing 1 marker, zero-padded to 64 bits.  A level-L id's
descendants occupy the contiguous range [range_min, range_max] — the
basis for prefix joins and covers.

Curve tables kIJtoPos / kPosToIJ / kPosToOrientation and the
quadratic ST<->UV transform follow the published s2coords.h values.
"""

from __future__ import annotations

import numpy as np

from .geom.kernels import points_in_shape

MAX_LEVEL = 30
_LIMIT = 1 << MAX_LEVEL

_SWAP = 1   # kSwapMask
_INVERT = 2  # kInvertMask

_POS_TO_IJ = np.array([[0, 1, 3, 2],
                       [0, 2, 3, 1],
                       [3, 2, 0, 1],
                       [3, 1, 0, 2]], dtype=np.uint8)
_IJ_TO_POS = np.array([[0, 1, 3, 2],
                       [0, 3, 1, 2],
                       [2, 3, 1, 0],
                       [2, 1, 3, 0]], dtype=np.uint8)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT + _SWAP], dtype=np.uint8)


# ---------------------------------------------------------------------------
# coordinate chain

def _lonlat_to_xyz(lon, lat):
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    f = np.where((az >= ax) & (az >= ay), 2,
                 np.where(ay >= ax, 1, 0)).astype(np.int64)
    major = np.choose(f, [x, y, z])
    face = np.where(major < 0, f + 3, f)
    # every face's u/v denominator is its major-axis component, so two
    # numerator gathers + two divisions replace twelve masked divisions
    un = np.choose(face, [y, -x, -x, z, z, -y])
    vn = np.choose(face, [z, z, -y, y, -x, -x])
    with np.errstate(divide="ignore", invalid="ignore"):
        u = un / major
        v = vn / major
    return face, u, v


def _face_uv_to_xyz(face, u, v):
    one = np.ones_like(u)
    x = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [one, -u, -u, -one, v], default=v)
    y = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [u, one, -v, -v, -one], default=u)
    z = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [v, v, one, -u, -u], default=-one)
    return x, y, z


def _uv_to_st(u):
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u),
                        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def _st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0),
                    (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def _st_to_ij(s, limit=_LIMIT):
    return np.clip((np.asarray(s) * limit).astype(np.int64), 0, limit - 1)


# ---------------------------------------------------------------------------
# Hilbert encode / decode

def _build_lookup(r: int) -> np.ndarray:
    """Block lookup table: (i_bits << (r+2)) | (j_bits << 2) | orient
    -> (pos_bits << 2) | orient', advancing the curve r levels at once
    (the s2geometry lookup_pos construction, r=4 there).  Built by the
    trusted per-bit walk, so the tables and the bit algorithm can be
    regression-checked against each other."""
    out = np.zeros(1 << (2 * r + 2), dtype=np.uint16)
    for ib in range(1 << r):
        for jb in range(1 << r):
            for orient in range(4):
                o, pos = orient, 0
                for k in range(r - 1, -1, -1):
                    ij = (((ib >> k) & 1) << 1) | ((jb >> k) & 1)
                    p = int(_IJ_TO_POS[o, ij])
                    pos = (pos << 2) | p
                    o ^= int(_POS_TO_ORIENT[p])
                out[(ib << (r + 2)) | (jb << 2) | orient] = (pos << 2) | o
    return out


_LOOKUP = {r: _build_lookup(r) for r in (1, 2, 3, 4)}


def _encode(face, i, j, level):
    """uint64 cell ids from level-local (face, i, j) in [0, 2^level).
    Walks the curve 4 levels per lookup gather (top partial block
    first), ~4x fewer vector ops than the per-bit loop."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    orient = (face & 1).astype(np.int64)
    pos = np.zeros(face.shape, dtype=np.uint64)
    rem = level
    while rem > 0:
        r = rem % 4 or 4
        rem -= r
        mask = (1 << r) - 1
        idx = ((((i >> rem) & mask) << (r + 2))
               | (((j >> rem) & mask) << 2) | orient)
        val = _LOOKUP[r][idx]
        pos = (pos << np.uint64(2 * r)) | (val >> 2).astype(np.uint64)
        orient = (val & 3).astype(np.int64)
    ids = ((face.astype(np.uint64) << np.uint64(61))
           | (pos << np.uint64(61 - 2 * level))
           | (np.uint64(1) << np.uint64(60 - 2 * level)))
    return ids


def _encode_bitwise(face, i, j, level):
    """Reference per-bit encoder (kept for the table regression test)."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    orient = (face & 1).astype(np.uint8)
    pos = np.zeros(face.shape, dtype=np.uint64)
    for k in range(level - 1, -1, -1):
        ij = ((((i >> k) & 1) << 1) | ((j >> k) & 1)).astype(np.uint8)
        p = _IJ_TO_POS[orient, ij]
        pos = (pos << np.uint64(2)) | p.astype(np.uint64)
        orient = orient ^ _POS_TO_ORIENT[p]
    ids = ((face.astype(np.uint64) << np.uint64(61))
           | (pos << np.uint64(61 - 2 * level))
           | (np.uint64(1) << np.uint64(60 - 2 * level)))
    return ids


def lonlat_to_cell_id(lon, lat, level=MAX_LEVEL):
    """S2 cell ids (uint64) at ``level`` for lon/lat degree arrays."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    x, y, z = _lonlat_to_xyz(lon, lat)
    face, u, v = _xyz_to_face_uv(x, y, z)
    n = 1 << level
    i = _st_to_ij(_uv_to_st(u), n)
    j = _st_to_ij(_uv_to_st(v), n)
    return _encode(face, i, j, level)


def cell_id_level(ids):
    """Level of each id (mixed-level arrays fine)."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & (~ids + np.uint64(1))
    exp = np.frexp(lsb.astype(np.float64))[1] - 1
    return (MAX_LEVEL - exp // 2).astype(np.int64)


def decode(ids):
    """(face, i, j, level) with i/j level-local, inverse of _encode."""
    ids = np.asarray(ids, dtype=np.uint64)
    level = cell_id_level(ids)
    face = (ids >> np.uint64(61)).astype(np.int64)
    orient = (face & 1).astype(np.uint8)
    i = np.zeros(ids.shape, dtype=np.int64)
    j = np.zeros(ids.shape, dtype=np.int64)
    for k in range(int(level.max()) if ids.size else 0):
        act = k < level
        p = ((ids >> np.uint64(59 - 2 * k)) & np.uint64(3)).astype(np.uint8)
        ij = _POS_TO_IJ[orient, p]
        i = np.where(act, (i << 1) | (ij >> 1), i)
        j = np.where(act, (j << 1) | (ij & 1), j)
        orient = np.where(act, orient ^ _POS_TO_ORIENT[p], orient)
    return face, i, j, level


def parent(ids, level):
    """Ancestor of each id at ``level`` (must be <= each id's level)."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (ids & ~(lsb - np.uint64(1))) | lsb


def range_min(ids):
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & (~ids + np.uint64(1))
    return ids - (lsb - np.uint64(1))


def range_max(ids):
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & (~ids + np.uint64(1))
    return ids + (lsb - np.uint64(1))


def children(ids):
    """(n, 4) child ids in Hilbert order."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & (~ids + np.uint64(1))
    nl = lsb >> np.uint64(2)
    if np.any(nl == 0):
        raise ValueError("leaf cells have no children")
    base = ids - lsb
    ks = np.arange(4, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    return base[:, None] + nl[:, None] * ks[None, :]


def cell_center_lonlat(ids):
    """(lon, lat) degree arrays of each cell's ST center."""
    face, i, j, level = decode(ids)
    n = (np.int64(1) << level).astype(np.float64)
    u = _st_to_uv((i + 0.5) / n)
    v = _st_to_uv((j + 0.5) / n)
    x, y, z = _face_uv_to_xyz(face, u, v)
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    return lon, lat


def token(ids):
    """Canonical S2 tokens: 16-nibble hex, trailing zeros stripped."""
    return np.array([format(int(v), "016x").rstrip("0") or "X"
                     for v in np.asarray(ids, dtype=np.uint64)],
                    dtype=object)


def token_to_id(tokens):
    return np.array([int(str(t).ljust(16, "0"), 16) for t in tokens],
                    dtype=np.uint64)


# ---------------------------------------------------------------------------
# conservative polygon covers

def _cell_lonlat_rects(face, i, j, level):
    """Conservative lon/lat rectangles for cells (level-local i/j).

    Samples the 4 corners + 4 edge midpoints + center, then pads by the
    cell's angular half-diameter (covers edge curvature between
    samples).  Pole-touching cells get the exact polar bound.  Returns
    (x0, y0, x1, y1, full_lon) arrays; a cell whose padded longitude
    span wraps or exceeds 360 sets full_lon (callers treat it as
    [-180, 180]).  Bounds are a superset of the true cell — covers
    built from them are conservative (may be loose, never miss).
    """
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    m = len(face)
    n = float(1 << level)
    fr = np.array([0.0, 0.5, 1.0])
    fs, ft = [a.ravel() for a in np.meshgrid(fr, fr)]  # 9 samples
    s = (i[:, None] + fs[None, :]) / n
    t = (j[:, None] + ft[None, :]) / n
    u = _st_to_uv(s)
    v = _st_to_uv(t)
    x, y, z = _face_uv_to_xyz(face[:, None], u, v)
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))

    pad = np.degrees(1.3 * (np.pi / 2) / n)  # > half the max cell extent
    lat0 = lat.min(axis=1) - pad
    lat1 = lat.max(axis=1) + pad

    # longitude: recenter on the center sample to handle wrap
    ref = lon[:, 4]
    d = (lon - ref[:, None] + 540.0) % 360.0 - 180.0
    abs_lat_max = np.minimum(np.maximum(np.abs(lat0), np.abs(lat1)), 89.9)
    lon_pad = pad / np.cos(np.radians(abs_lat_max))
    lon0 = ref + d.min(axis=1) - lon_pad
    lon1 = ref + d.max(axis=1) + lon_pad
    full_lon = (lon1 - lon0) >= 360.0

    # pole-touching cells: the ST center of faces 2 (north) / 5 (south)
    half = (1 << level) >> 1 if level > 0 else 0
    if level == 0:
        touches = (face == 2) | (face == 5)
    else:
        touches = (((face == 2) | (face == 5))
                   & (np.abs(i - half) <= 1) & (np.abs(j - half) <= 1))
    lat1 = np.where(touches & (face == 2), 90.0, lat1)
    lat0 = np.where(touches & (face == 5), -90.0, lat0)
    full_lon = full_lon | touches | (np.abs(lat1) >= 89.9) \
        | (np.abs(lat0) >= 89.9)
    lat0 = np.clip(lat0, -90.0, 90.0)
    lat1 = np.clip(lat1, -90.0, 90.0)
    return lon0, lat0, lon1, lat1, full_lon


def _segs_hit_rect(ax, ay, bx, by, x0, y0, x1, y1):
    """True if any segment (a->b) intersects the rect [x0,x1]x[y0,y1].

    Exact SAT for segment-vs-AABB: reject when both endpoints are
    outside one slab, or all four rect corners lie strictly on one
    side of the segment's line.
    """
    alive = ~(((ax < x0) & (bx < x0)) | ((ax > x1) & (bx > x1))
              | ((ay < y0) & (by < y0)) | ((ay > y1) & (by > y1)))
    if not alive.any():
        return False
    dx, dy = bx - ax, by - ay

    def side(cx, cy):
        return dx * (cy - ay) - dy * (cx - ax)

    s1, s2 = side(x0, y0), side(x1, y0)
    s3, s4 = side(x1, y1), side(x0, y1)
    same = (((s1 > 0) & (s2 > 0) & (s3 > 0) & (s4 > 0))
            | ((s1 < 0) & (s2 < 0) & (s3 < 0) & (s4 < 0)))
    return bool((alive & ~same).any())


def _segs_hit_rects(ax, ay, bx, by, x0, y0, x1, y1):
    """Vectorized ``_segs_hit_rect`` over MANY rects at once: the
    same exact SAT, broadcast to (rects, segments) — rect bounds
    arrive as (m, 1) columns, segment endpoints as 1-D arrays.
    Returns an (m,) bool: any segment intersects each rect."""
    a_x, a_y = ax[None, :], ay[None, :]
    b_x, b_y = bx[None, :], by[None, :]
    alive = ~(((a_x < x0) & (b_x < x0)) | ((a_x > x1) & (b_x > x1))
              | ((a_y < y0) & (b_y < y0)) | ((a_y > y1) & (b_y > y1)))
    dx, dy = b_x - a_x, b_y - a_y

    def side(cx, cy):
        return dx * (cy - a_y) - dy * (cx - a_x)

    s1, s2 = side(x0, y0), side(x1, y0)
    s3, s4 = side(x1, y1), side(x0, y1)
    same = (((s1 > 0) & (s2 > 0) & (s3 > 0) & (s4 > 0))
            | ((s1 < 0) & (s2 < 0) & (s3 < 0) & (s4 < 0)))
    return (alive & ~same).any(axis=1)


def polygon_cover(rings, max_level, interior_shortcut=True,
                  return_interior=False):
    """Cell cover of a planar lon/lat polygon (list of closed rings).

    Recursively subdivides from the 6 face cells; a cell is kept when
    its conservative lon/lat rect intersects the polygon (even-odd
    over ``rings``).  With ``interior_shortcut`` cells whose rect lies
    fully inside the polygon are emitted at their (coarser) level —
    the S2RegionCoverer shape; otherwise every emitted cell is at
    ``max_level``.  Returns a sorted uint64 id array (mixed levels
    with the shortcut); with ``return_interior`` also a parallel bool
    array marking cells whose rect lies fully inside the polygon
    (join candidates in those cells need no exact PIP verify).
    Conservative: every polygon point lies in some emitted cell's
    true extent; loose cells possible near edges.
    """
    rings = [(np.asarray(rx, dtype=np.float64),
              np.asarray(ry, dtype=np.float64)) for rx, ry in rings]
    ex = np.concatenate([rx for rx, _ in rings])
    ey = np.concatenate([ry for _, ry in rings])
    bx0, by0 = ex.min(), ey.min()
    bx1, by1 = ex.max(), ey.max()
    seg_a = [(rx[:-1], ry[:-1], rx[1:], ry[1:]) for rx, ry in rings]

    out = []
    face = np.arange(6, dtype=np.int64)
    i = np.zeros(6, dtype=np.int64)
    j = np.zeros(6, dtype=np.int64)
    level = 0
    while len(face):
        x0, y0, x1, y1, full = _cell_lonlat_rects(face, i, j, level)
        x0 = np.where(full, -180.0, x0)
        x1 = np.where(full, 180.0, x1)
        m = len(face)
        # bbox prune
        cand = ~((x1 < bx0) | (x0 > bx1) | (y1 < by0) | (y0 > by1))
        # corner + center containment (one batched PIP call)
        px = np.stack([x0, x1, x1, x0, (x0 + x1) * 0.5], axis=1)
        py = np.stack([y0, y0, y1, y1, (y0 + y1) * 0.5], axis=1)
        inside_pts = np.zeros((m, 5), dtype=bool)
        if cand.any():
            flat = points_in_shape(px[cand].ravel(), py[cand].ravel(),
                                   rings)
            inside_pts[cand] = flat.reshape(-1, 5)
        edge_hit = np.zeros(m, dtype=bool)
        vert_in = np.zeros(m, dtype=bool)
        # vectorized over (candidate cells x vertices/segments) — the
        # per-cell Python loop here cost ~0.5 s per polygon at a
        # level-8 cover (profiled 16.9 s for 32 regions); chunked so
        # the 2-D temporaries stay bounded
        ci = np.flatnonzero(cand)
        if len(ci):
            ch = max(1, int(4_000_000 // max(len(ex), 1)))
            for s in range(0, len(ci), ch):
                cc = ci[s:s + ch]
                rx0, rx1 = x0[cc][:, None], x1[cc][:, None]
                ry0, ry1 = y0[cc][:, None], y1[cc][:, None]
                vert_in[cc] = ((ex[None, :] >= rx0)
                               & (ex[None, :] <= rx1)
                               & (ey[None, :] >= ry0)
                               & (ey[None, :] <= ry1)).any(axis=1)
                hit = np.zeros(len(cc), dtype=bool)
                for ax, ay, bx, by in seg_a:
                    hit |= _segs_hit_rects(ax, ay, bx, by,
                                           rx0, ry0, rx1, ry1)
                edge_hit[cc] = hit
        intersects = cand & (inside_pts.any(axis=1) | edge_hit | vert_in)
        fully_in = intersects & inside_pts.all(axis=1) & ~edge_hit
        if interior_shortcut:
            emit = fully_in | (intersects & (level == max_level))
            descend = intersects & ~emit
        else:
            emit = intersects & (level == max_level)
            descend = intersects & (level < max_level)
        if emit.any():
            out.append((_encode(face[emit], i[emit], j[emit], level),
                        fully_in[emit]))
        if level == max_level or not descend.any():
            break
        face = np.repeat(face[descend], 4)
        i = (np.repeat(i[descend], 4) << 1) \
            + np.tile([0, 0, 1, 1], descend.sum())
        j = (np.repeat(j[descend], 4) << 1) \
            + np.tile([0, 1, 0, 1], descend.sum())
        level += 1
    if not out:
        ids = np.empty(0, dtype=np.uint64)
        interior = np.empty(0, dtype=bool)
    else:
        ids = np.concatenate([o[0] for o in out])
        interior = np.concatenate([o[1] for o in out])
        order = np.argsort(ids)
        ids, interior = ids[order], interior[order]
    return (ids, interior) if return_interior else ids


def cover_contains(cover_ids, point_ids):
    """Membership of leaf/fine ``point_ids`` in a mixed-level cover:
    true when some cover cell's [range_min, range_max] contains the
    id.  Vectorized searchsorted over the sorted cover."""
    cover_ids = np.sort(np.asarray(cover_ids, dtype=np.uint64))
    point_ids = np.asarray(point_ids, dtype=np.uint64)
    if len(cover_ids) == 0:  # degenerate/empty cover: nothing matches
        return np.zeros(len(point_ids), dtype=bool)
    lo = range_min(cover_ids)
    hi = range_max(cover_ids)
    k = np.searchsorted(lo, point_ids, side="right") - 1
    ok = k >= 0
    kc = np.clip(k, 0, len(cover_ids) - 1)
    return ok & (point_ids >= lo[kc]) & (point_ids <= hi[kc])
