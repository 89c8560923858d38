"""Faithful port of the reference's polygon clip/erase machinery.

The mosaic-based overlay (`topo/mosaic.py`) builds a face arrangement,
which breaks on defective real-world input (partially overlapping
collinear segments — e.g. the reference's own two_states fixture, whose
state borders cross each other ~49 times).  The reference never builds
an arrangement: it snaps, cuts arcs at intersections, then REDRAWS each
target polygon with a flag-guarded pathfinder that walks rightmost-turn
routes through the merged arc set.  This module ports that pipeline:

- segment intersection exactly as src/geom/mapshaper-segment-geom.js
  (Shewchuk-reordered line intersection, endpoint snapping/clamping,
  collinear-overlap endpoints, endpoint-only touches filtered)
- snapCoordsByInterval + high-precision snap interval
  (src/paths/mapshaper-snapping.js:7-62)
- insertCutPoints / divideArcs / remap (src/paths/mapshaper-path-
  division.js:20-305) + cleanShapes (mapshaper-polygon-repair.js:5-59)
- NodeCollection.getConnectedArcs over endpoint coordinates
  (src/topology/mapshaper-nodes.js)
- getRightmostArc / chooseRighthandPath / signedAngle / orient2D
  (src/utils/mapshaper-pathfinder-utils.js, mapshaper-geom.js:94-106)
- route flags, getPathFinder, getRingIntersector, getPolygonDissolver,
  getHoleDivider, getSelfIntersectionSplitter, removeSpikesInPath,
  splitPathByIds (mapshaper-pathfinder.js, mapshaper-polygon-
  dissolve2.js, mapshaper-polygon-holes.js, mapshaper-self-
  intersection.js, mapshaper-polygon-repair.js:39-59)
- clipPolygons with clip/route flag interplay, undivided-clip-shape
  insertion and interior-path search
  (src/clipping/mapshaper-polygon-clipping.js:9-227)

Everything operates on a flat vertex model (nn / xx / yy + shapes of
signed arc ids, ~id = reversed) matching the reference's ArcCollection.
"""

from __future__ import annotations

import math

import numpy as np

ABS = lambda i: ~i if i < 0 else i  # noqa: E731  (absArcId)


class RefArcs:
    """Minimal ArcCollection equivalent: flat vertex arrays."""

    def __init__(self, nn, xx, yy):
        self.nn = np.asarray(nn, dtype=np.int64)
        self.xx = np.asarray(xx, dtype=np.float64).copy()
        self.yy = np.asarray(yy, dtype=np.float64).copy()
        self._update_offsets()

    def _update_offsets(self):
        self.ii = np.concatenate([[0], np.cumsum(self.nn[:-1])]) \
            if len(self.nn) else np.empty(0, dtype=np.int64)

    def size(self):
        return len(self.nn)

    def vertex_index(self, arc_id, nth):
        """indexOfVertex: nth (negative = from end) of the DIRECTED arc."""
        a = ABS(arc_id)
        n = int(self.nn[a])
        i = nth if nth >= 0 else n + nth
        if i < 0 or i >= n:
            raise IndexError("vertex index error")
        if arc_id < 0:
            i = n - i - 1
        return int(self.ii[a]) + i

    def vertex(self, arc_id, nth):
        i = self.vertex_index(arc_id, nth)
        return self.xx[i], self.yy[i]

    def arc_coords(self, arc_id):
        a = ABS(arc_id)
        i0 = int(self.ii[a])
        n = int(self.nn[a])
        x = self.xx[i0:i0 + n]
        y = self.yy[i0:i0 + n]
        return (x[::-1], y[::-1]) if arc_id < 0 else (x, y)

    def arc_is_closed(self, arc_id):
        a = ABS(arc_id)
        i0 = int(self.ii[a])
        j = i0 + int(self.nn[a]) - 1
        return self.xx[i0] == self.xx[j] and self.yy[i0] == self.yy[j]

    def arc_is_lollipop(self, arc_id):
        a = ABS(arc_id)
        if int(self.nn[a]) <= 2 or not self.arc_is_closed(arc_id):
            return False
        i = self.vertex_index(arc_id, 1)
        j = self.vertex_index(arc_id, -2)
        return self.xx[i] == self.xx[j] and self.yy[i] == self.yy[j]

    def arc_is_degenerate(self, arc_id):
        a = ABS(arc_id)
        i0 = int(self.ii[a])
        n = int(self.nn[a])
        x = self.xx[i0:i0 + n]
        y = self.yy[i0:i0 + n]
        return bool(np.all(x == x[0]) and np.all(y == y[0]))

    def dedup_coords(self):
        """arcs.dedupCoords: drop consecutive duplicate vertices."""
        nn2, xs, ys = [], [], []
        removed = 0
        for a in range(self.size()):
            i0 = int(self.ii[a])
            n = int(self.nn[a])
            x = self.xx[i0:i0 + n]
            y = self.yy[i0:i0 + n]
            if n > 1:
                keep = np.ones(n, dtype=bool)
                np.logical_or(x[1:] != x[:-1], y[1:] != y[:-1],
                              out=keep[1:])
                removed += int(n - keep.sum())
                x, y = x[keep], y[keep]
            nn2.append(len(x))
            xs.append(x)
            ys.append(y)
        if removed:
            self.nn = np.array(nn2, dtype=np.int64)
            self.xx = np.concatenate(xs) if xs else np.empty(0)
            self.yy = np.concatenate(ys) if ys else np.empty(0)
            self._update_offsets()
        return removed


# ---------------------------------------------------------------------------
# segment intersection (mapshaper-segment-geom.js, faithful)

def _det2(a, b, c, d):
    return a * d - b * c


def orient2d(ax, ay, bx, by, cx, cy):
    return _det2(ax - cx, ay - cy, bx - cx, by - cy)


def _segment_hit(ax, ay, bx, by, cx, cy, dx, dy):
    return (orient2d(ax, ay, bx, by, cx, cy) *
            orient2d(ax, ay, bx, by, dx, dy) <= 0 and
            orient2d(cx, cy, dx, dy, ax, ay) *
            orient2d(cx, cy, dx, dy, bx, by) <= 0)


def _outside_range(a, b, c):
    if b < c:
        return a < b or a > c
    if b > c:
        return a > b or a < c
    return a != b


def _clamp_close(a, b, c):
    if _outside_range(a, b, c):
        a = b if abs(a - b) < abs(a - c) else c
    return a


def _find_endpoint_in_range(ax, ay, bx, by, cx, cy, dx, dy):
    if not _outside_range(ax, cx, dx) and not _outside_range(ay, cy, dy):
        return [ax, ay]
    if not _outside_range(bx, cx, dx) and not _outside_range(by, cy, dy):
        return [bx, by]
    if not _outside_range(cx, ax, bx) and not _outside_range(cy, ay, by):
        return [cx, cy]
    if not _outside_range(dx, ax, bx) and not _outside_range(dy, ay, by):
        return [dx, dy]
    return None


def _line_intersection(ax, ay, bx, by, cx, cy, dx, dy):
    den = _det2(bx - ax, by - ay, dx - cx, dy - cy)
    eps = 1e-18
    if den == 0:
        return None
    m = orient2d(cx, cy, dx, dy, ax, ay) / den
    if -eps <= den <= eps:
        return _find_endpoint_in_range(ax, ay, bx, by, cx, cy, dx, dy)
    return [ax + m * (bx - ax), ay + m * (by - ay)]


def _nearest_point(x, y, *pts):
    best, best_d = -1, math.inf
    for i in range(0, len(pts), 2):
        d = (x - pts[i]) ** 2 + (y - pts[i + 1]) ** 2
        if d < best_d:
            best_d = d
            best = i // 2
    return best


def _cross_intersection(ax, ay, bx, by, cx, cy, dx, dy):
    p = _line_intersection(ax, ay, bx, by, cx, cy, dx, dy)
    if p:
        near = _nearest_point(p[0], p[1], ax, ay, bx, by, cx, cy, dx, dy)
        if near == 1:
            p = _line_intersection(bx, by, ax, ay, cx, cy, dx, dy)
        elif near == 2:
            p = _line_intersection(cx, cy, dx, dy, ax, ay, bx, by)
        elif near == 3:
            p = _line_intersection(dx, dy, cx, cy, ax, ay, bx, by)
    if p:
        x, y = p
        x = _clamp_close(x, ax, bx)
        x = _clamp_close(x, cx, dx)
        y = _clamp_close(y, ay, by)
        y = _clamp_close(y, cy, dy)
        p = [x, y]
    return p


def _inside(a, mn, mx):
    return mn < a < mx


def _collinear_intersection(ax, ay, bx, by, cx, cy, dx, dy):
    min_x = min(ax, bx, cx, dx)
    max_x = max(ax, bx, cx, dx)
    min_y = min(ay, by, cy, dy)
    max_y = max(ay, by, cy, dy)
    use_y = max_y - min_y > max_x - min_x
    coords = []
    for px, py in ((ax, ay), (bx, by), (cx, cy), (dx, dy)):
        if (_inside(py, min_y, max_y) if use_y
                else _inside(px, min_x, max_x)):
            coords.extend([px, py])
    if len(coords) not in (2, 4):
        return None
    return coords


def _endpoint_hit(ax, ay, bx, by, cx, cy, dx, dy):
    return (ax == cx and ay == cy or ax == dx and ay == dy or
            bx == cx and by == cy or bx == dx and by == dy)


def ref_segment_intersection(ax, ay, bx, by, cx, cy, dx, dy):
    """segmentIntersection: None, [x, y] or [x1, y1, x2, y2]."""
    if not _segment_hit(ax, ay, bx, by, cx, cy, dx, dy):
        return None
    p = _cross_intersection(ax, ay, bx, by, cx, cy, dx, dy)
    if not p:
        return _collinear_intersection(ax, ay, bx, by, cx, cy, dx, dy)
    if _endpoint_hit(ax, ay, bx, by, cx, cy, dx, dy):
        return None
    return p


# ---------------------------------------------------------------------------
# stripe sweep over vertex-indexed segments (mapshaper-segment-intersection.js)

def _collect_vertex_segments(arcs: RefArcs):
    """Segments as (i, j) vertex-index pairs with xx[i] <= xx[j]."""
    segs = []
    for a in range(arcs.size()):
        i0 = int(arcs.ii[a])
        n = int(arcs.nn[a])
        for k in range(n - 1):
            i, j = i0 + k, i0 + k + 1
            if arcs.xx[i] <= arcs.xx[j]:
                segs.append((i, j))
            else:
                segs.append((j, i))
    return segs


def find_segment_intersections(arcs: RefArcs, segs=None):
    """Intersections as dicts {x, y, a: (i, j), b: (i, j)} (vertex ids,
    i <= j; endpoint coincidence collapses to (i, i)).  ``segs``
    overrides the segment list (e.g. retained-only segments for
    post-simplify repair); default is every vertex pair."""
    xx, yy = arcs.xx, arcs.yy
    if segs is None:
        segs = _collect_vertex_segments(arcs)
    if not segs:
        return []
    # stripes (count formula: yrange / avg |dy| / 20)
    ys = np.array([[yy[i], yy[j]] for i, j in segs])
    yr = float(arcs.yy.max() - arcs.yy.min()) if len(arcs.yy) else 0.0
    seg_dy = float(np.mean(np.abs(ys[:, 1] - ys[:, 0])))
    n_stripes = max(1, int(math.ceil(yr / seg_dy / 20))) \
        if seg_dy > 0 and yr > 0 else 1
    ymin = float(arcs.yy.min()) if len(arcs.yy) else 0.0
    lo = np.clip(((np.minimum(ys[:, 0], ys[:, 1]) - ymin) / (yr or 1)
                  * n_stripes).astype(int), 0, n_stripes - 1)
    hi = np.clip(((np.maximum(ys[:, 0], ys[:, 1]) - ymin) / (yr or 1)
                  * n_stripes).astype(int), 0, n_stripes - 1)

    out = []
    seen = set()
    for s in range(n_stripes):
        idx = np.nonzero((lo <= s) & (hi >= s))[0]
        if len(idx) < 2:
            continue
        stripe = [segs[k] for k in idx]
        stripe.sort(key=lambda ij: (xx[ij[0]], yy[ij[0]]))
        m = len(stripe)
        for i_ in range(m):
            p1, p2 = stripe[i_]
            x1 = xx[p2]
            for j_ in range(i_ + 1, m):
                q1, q2 = stripe[j_]
                if xx[q1] > x1:
                    break
                if p1 == q1 or p1 == q2 or p2 == q1 or p2 == q2:
                    continue  # adjacent in a path (share a vertex id)
                hit = ref_segment_intersection(
                    xx[p1], yy[p1], xx[p2], yy[p2],
                    xx[q1], yy[q1], xx[q2], yy[q2])
                if hit is None:
                    continue
                for off in range(0, len(hit), 2):
                    o = _format_intersection(
                        hit[off], hit[off + 1], (p1, p2), (q1, q2),
                        xx, yy)
                    key = (o["a"], o["b"])
                    if key not in seen:
                        seen.add(key)
                        out.append(o)
    return out


def _format_intersecting_segment(x, y, id1, id2, xx, yy):
    i, j = (id1, id2) if id1 < id2 else (id2, id1)
    if xx[i] == x and yy[i] == y:
        j = i
    elif xx[j] == x and yy[j] == y:
        i = j
    return (i, j)


def _format_intersection(x, y, s1, s2, xx, yy):
    a = _format_intersecting_segment(x, y, s1[0], s1[1], xx, yy)
    b = _format_intersecting_segment(x, y, s2[0], s2[1], xx, yy)
    if not a < b:
        a, b = b, a
    return {"x": x, "y": y, "a": a, "b": b}


# ---------------------------------------------------------------------------
# snapping (mapshaper-snapping.js)

def high_precision_snap_interval(arcs: RefArcs):
    if not len(arcs.xx):
        return 0.0
    m = max(abs(float(arcs.xx.min())), abs(float(arcs.xx.max())),
            abs(float(arcs.yy.min())), abs(float(arcs.yy.max())))
    return m * 1e-14


def snap_coords_by_interval(arcs: RefArcs, snap_dist):
    """x-sorted sweep; later points within the interval snap to the
    earlier point's (possibly already-snapped) coordinates."""
    if snap_dist <= 0 or not len(arcs.xx):
        return 0
    xx, yy = arcs.xx, arcs.yy
    ids = np.argsort(xx, kind="stable")
    count = 0
    n = len(ids)
    lim2 = snap_dist * snap_dist
    for i in range(n):
        x = xx[ids[i]]
        y = yy[ids[i]]
        j = i
        while j + 1 < n:
            j += 1
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


# ---------------------------------------------------------------------------
# cut insertion (mapshaper-path-division.js:128-305)

def _convert_intersections_to_cut_points(intersections, xx, yy):
    points = []
    for o in intersections:
        for (i, j) in (o["a"], o["b"]):
            if j < i or j > i + 1:
                continue  # endpoint-collapsed pair (i == j) or invalid
            if _outside_range(o["x"], xx[i], xx[j]) or \
                    _outside_range(o["y"], yy[i], yy[j]):
                continue
            points.append({"x": o["x"], "y": o["y"], "i": i})
    return points


def _sort_cut_points(points, xx, yy):
    points.sort(key=lambda p: (p["i"], abs(p["x"] - xx[p["i"]]),
                               abs(p["y"] - yy[p["i"]])))
    return points


def _filter_sorted_cut_points(points, arcs: RefArcs):
    filtered = []
    pid = 0
    for a in range(arcs.size()):
        i0 = int(arcs.ii[a])
        j = i0 + int(arcs.nn[a]) - 1
        x0, y0 = arcs.xx[i0], arcs.yy[i0]
        xn, yn = arcs.xx[j], arcs.yy[j]
        while pid < len(points) and points[pid]["i"] <= j:
            p = points[pid]
            pp = filtered[-1] if filtered else None
            if (p["x"] == x0 and p["y"] == y0) or \
                    (p["x"] == xn and p["y"] == yn):
                pass  # cut point at an arc endpoint: discard
            elif pp and pp["x"] == p["x"] and pp["y"] == p["y"] and \
                    pp["i"] == p["i"]:
                pass  # duplicate
            else:
                filtered.append(p)
            pid += 1
    return filtered


def insert_cut_points(unfiltered, arcs: RefArcs):
    """Returns map: old arc id -> id of its first divided arc."""
    points = _filter_sorted_cut_points(
        _sort_cut_points(unfiltered, arcs.xx, arcs.yy), arcs)
    src_total = arcs.size()
    arc_map = np.zeros(src_total, dtype=np.int64)
    xx1, yy1, nn1 = [], [], []
    points = points[::-1]  # pop from the end
    p = points.pop() if points else None
    i0 = 0
    dest_arc = 0
    for a in range(src_total):
        arc_len = int(arcs.nn[a])
        arc_map[a] = dest_arc
        n1 = 0
        for _ in range(arc_len):
            xx1.append(arcs.xx[i0])
            yy1.append(arcs.yy[i0])
            n1 += 1
            while p is not None and p["i"] == i0:
                xx1.append(p["x"])
                yy1.append(p["y"])
                n1 += 1
                nn1.append(n1)
                dest_arc += 1
                n1 = 0
                xx1.append(p["x"])
                yy1.append(p["y"])
                n1 += 1
                p = points.pop() if points else None
            i0 += 1
        nn1.append(n1)
        dest_arc += 1
    return RefArcs(nn1, xx1, yy1), arc_map


def remap_divided_ids(ids, arc_map, arc_count):
    """getDividedArcUpdater semantics for one path."""
    out = []
    n_src = len(arc_map)
    for arc_id in ids:
        rev = arc_id < 0
        a = ~arc_id if rev else arc_id
        lo = int(arc_map[a])
        hi = (arc_count if a >= n_src - 1 else int(arc_map[a + 1])) - 1
        if rev:
            out.extend(~i for i in range(hi, lo - 1, -1))
        else:
            out.extend(range(lo, hi + 1))
    return out


# ---------------------------------------------------------------------------
# shape cleanup (mapshaper-polygon-repair.js:5-59)

def remove_spikes_in_path(ids):
    n = len(ids)
    if n >= 2:
        if ids[0] == ~ids[-1]:
            ids.pop()
            ids.pop(0)
        else:
            for i in range(1, n):
                if ids[i - 1] == ~ids[i]:
                    del ids[i - 1:i + 1]
                    break
        if len(ids) < n:
            remove_spikes_in_path(ids)


def path_area(ids, arcs: RefArcs):
    """getPlanarPathArea: signed area over the joined path iter (the
    reference ShapeIter skips the first vertex of every arc after the
    first — the shared junction vertex)."""
    s = 0.0
    ax = ay = None
    dx = dy = 0.0
    first = True
    for k, sid in enumerate(ids):
        x, y = arcs.arc_coords(sid)
        start = 1 if k > 0 else 0
        for i in range(start, len(x)):
            if first:
                ax, ay = 0.0, 0.0
                dx, dy = -x[i], -y[i]
                first = False
            else:
                bx, by = ax, ay
                ax = x[i] + dx
                ay = y[i] + dy
                s += ax * by - bx * ay
    return s / 2.0


def path_coords(ids, arcs: RefArcs):
    """Joined coordinates of a path of signed arc ids (junction vertex
    of each subsequent arc skipped, like the reference ShapeIter)."""
    xs, ys = [], []
    for k, sid in enumerate(ids):
        x, y = arcs.arc_coords(sid)
        if k > 0:
            x, y = x[1:], y[1:]
        xs.extend(x.tolist())
        ys.extend(y.tolist())
    return np.asarray(xs), np.asarray(ys)


def clean_shape(shape, arcs: RefArcs, polygon=True):
    out = []
    for path in (shape or []):
        cleaned = [sid for sid in path
                   if not arcs.arc_is_degenerate(sid)]
        if polygon and cleaned:
            remove_spikes_in_path(cleaned)
            if not cleaned or path_area(cleaned, arcs) == 0:
                cleaned = None
        if cleaned:
            out.append(cleaned)
    return out or None


# ---------------------------------------------------------------------------
# nodes (endpoint connectivity)

class Nodes:
    """Connected arcs by endpoint coordinate.  Signed ids 'point into'
    their node: forward id a ends at the node; ~a starts there."""

    def __init__(self, arcs: RefArcs):
        self.arcs = arcs
        self._at: dict = {}
        for a in range(arcs.size()):
            i0 = int(arcs.ii[a])
            j = i0 + int(arcs.nn[a]) - 1
            self._at.setdefault((arcs.xx[j], arcs.yy[j]), []).append(a)
            self._at.setdefault((arcs.xx[i0], arcs.yy[i0]), []).append(~a)

    def connected(self, arc_id, filt=None):
        """getConnectedArcs: other directed ids pointing into the node
        at the end of ``arc_id``."""
        a = ABS(arc_id)
        arcs = self.arcs
        i0 = int(arcs.ii[a])
        j = i0 + int(arcs.nn[a]) - 1
        node = (arcs.xx[j], arcs.yy[j]) if arc_id >= 0 else \
            (arcs.xx[i0], arcs.yy[i0])
        if filt and not filt(a):
            return []
        out = []
        for cand in self._at.get(node, ()):
            if cand == arc_id:
                continue
            if filt and not filt(ABS(cand)):
                continue
            out.append(cand)
        return out


def signed_angle(ax, ay, bx, by, cx, cy):
    if (ax == bx and ay == by) or (bx == cx and by == cy):
        return float("nan")
    abx, aby = ax - bx, ay - by
    cbx, cby = cx - bx, cy - by
    dotp = abx * cbx + aby * cby
    crossp = abx * cby - aby * cbx
    a = math.atan2(crossp, dotp)
    two_pi = math.pi * 2
    while a < 0:
        a += two_pi
    while a >= two_pi:
        a -= two_pi
    return a


def _choose_righthand_vector(ax, ay, bx, by):
    orient = orient2d(ax, ay, 0, 0, bx, by)
    if orient > 0:
        return 2
    if orient < 0:
        return 1
    return 0


def _choose_righthand_path(fx, fy, nx, ny, ax, ay, bx, by):
    angle_a = signed_angle(fx, fy, nx, ny, ax, ay)
    angle_b = signed_angle(fx, fy, nx, ny, bx, by)
    if angle_a <= 0 or angle_b <= 0:
        if angle_a > 0:
            return 1
        if angle_b > 0:
            return 2
        return 0
    if angle_a < angle_b:
        return 1
    if angle_b < angle_a:
        return 2
    if math.isnan(angle_a) or math.isnan(angle_b):
        raise ValueError("invalid node geometry")
    return _choose_righthand_vector(ax - nx, ay - ny, bx - nx, by - ny)


def get_rightmost_arc(arc_id, nodes: Nodes, filt=None):
    ids = nodes.connected(arc_id)
    if filt:
        ids = [i for i in ids if filt(i)]
    if not ids:
        return arc_id
    arcs = nodes.arcs
    nx, ny = arcs.vertex(arc_id, -1)
    fx, fy = arcs.vertex(arc_id, -2)
    to_id = ids[0]
    tx, ty = arcs.vertex(to_id, -2)
    for cand in ids[1:]:
        cx, cy = arcs.vertex(cand, -2)
        if _choose_righthand_path(fx, fy, nx, ny, tx, ty, cx, cy) == 2:
            to_id = cand
            tx, ty = cx, cy
    return to_id


# ---------------------------------------------------------------------------
# route flags (mapshaper-pathfinder.js)

FWD_VISIBLE, FWD_OPEN, FWD_USED = 1, 2, 4
REV_VISIBLE, REV_OPEN, REV_USED = 0x10, 0x20, 0x40


def set_bits(src, flags, mask):
    return (src & ~mask) | (flags & mask)


def get_route_bits(arc_id, flags):
    a = ABS(arc_id)
    bits = int(flags[a])
    if a != arc_id:
        bits >>= 4
    return bits & 7


def set_route_bits(bits, arc_id, flags):
    a = ABS(arc_id)
    if a == arc_id:
        mask = ~3
    else:
        mask = ~0x30
        bits <<= 4
    flags[a] &= (bits | mask) & 0xFF


def _iter_paths(shape_or_shapes):
    """Accept a shape (list of int paths) or a list of shapes."""
    for el in (shape_or_shapes or []):
        if not el:
            continue
        if isinstance(el[0], list):
            for path in el:
                if path:
                    yield path
        else:
            yield el


def open_routes(paths_container, arcs, flags, fwd, rev, dissolve,
                or_bits=0):
    for path in _iter_paths(paths_container):
        for sid in path:
            is_inv = sid < 0
            a = ~sid if is_inv else sid
            new_flag = int(flags[a])
            open_fwd = rev if is_inv else fwd
            open_rev = fwd if is_inv else rev
            if arcs.arc_is_lollipop(sid):
                new_flag = 0
            else:
                if open_fwd:
                    new_flag |= 3
                if open_rev:
                    new_flag |= 0x30
                if or_bits > 0:
                    new_flag |= or_bits
                if dissolve and (new_flag & 0x22) == 0x22:
                    new_flag &= ~0x11
            flags[a] = new_flag & 0xFF


def close_routes(paths_container, arcs, flags, fwd, rev, hide):
    for path in _iter_paths(paths_container):
        for sid in path:
            is_inv = sid < 0
            a = ~sid if is_inv else sid
            mask = 0xFF
            close_fwd = rev if is_inv else fwd
            close_rev = fwd if is_inv else rev
            if close_fwd:
                if hide:
                    mask &= ~1
                mask ^= 0x2
            if close_rev:
                if hide:
                    mask &= ~0x10
                mask ^= 0x20
            flags[a] = int(flags[a]) & mask


def get_path_finder(nodes: Nodes, use_route, route_is_usable=None):
    test_arc = None
    if route_is_usable:
        def test_arc(a):  # noqa: F811
            return route_is_usable(~a)

    def get_next_arc(prev_id):
        return ~get_rightmost_arc(prev_id, nodes, test_arc)

    def find_path(start_id):
        path = []
        cand_id = start_id
        while True:
            if use_route(cand_id):
                path.append(cand_id)
                next_id = cand_id
                cand_id = get_next_arc(next_id)
            else:
                return None
            if cand_id == ~next_id:
                return None  # dead end
            if cand_id == start_id:
                break
        return path or None
    return find_path


def get_ring_intersector(nodes: Nodes, type_, flags=None):
    arcs = nodes.arcs
    if flags is None:
        flags = np.zeros(arcs.size(), dtype=np.int64)

    def route_is_active(arc_id):
        return (get_route_bits(arc_id, flags) & 1) == 1

    def use_route(arc_id):
        if get_route_bits(arc_id, flags) == 3:
            set_route_bits(1, arc_id, flags)
            return True
        return False

    find_path = get_path_finder(nodes, use_route, route_is_active)

    def intersect(rings):
        dissolve = type_ == "dissolve"
        open_fwd = True
        open_rev = type_ == "flatten"
        if not rings:
            return rings
        output = []
        open_routes(rings, arcs, flags, open_fwd, open_rev, dissolve)
        for ids in _iter_paths(rings):
            for sid in ids:
                path = find_path(sid)
                if path:
                    output.append(path)
        close_routes(rings, arcs, flags, open_fwd, open_rev, True)
        return output
    return intersect


def get_self_intersection_splitter(nodes: Nodes):
    def divide_path(path):
        for i in range(len(path) - 1):
            sub = divide_at_node(path, path[i])
            if sub is not None:
                return sub
        path = list(path)
        remove_spikes_in_path(path)
        return [path] if path else []

    def divide_at_node(path, enter_id):
        exit_ids = [~nid for nid in nodes.connected(enter_id)
                    if ~nid in path_set(path)]
        if len(exit_ids) > 1:
            out = None
            for sub in split_path_by_ids(path, exit_ids):
                subs = divide_path(sub)
                out = subs if out is None else out + subs
            return out
        return None

    def path_set(path):
        return set(path)

    return divide_path


def split_path_by_ids(path, ids):
    indexes = sorted(path.index(i) for i in ids)
    sub = []
    if indexes[0] > 0:
        sub.append(path[:indexes[0]])
    for k in range(len(indexes)):
        if k < len(indexes) - 1:
            sub.append(path[indexes[k]:indexes[k + 1]])
        else:
            sub.append(path[indexes[k]:])
    if len(sub) > len(ids):
        sub[0] = sub.pop() + sub[0]
    return sub


def reverse_path(ids):
    ids.reverse()
    for i in range(len(ids)):
        ids[i] = ~ids[i]


def get_hole_divider(nodes: Nodes):
    split = get_self_intersection_splitter(nodes)

    def divide(rings, cw, ccw):
        for ring_ids in _iter_paths(rings):
            for split_ring in split(list(ring_ids)):
                area = path_area(split_ring, nodes.arcs)
                if area > 0:
                    cw.append(split_ring)
                elif area < 0:
                    ccw.append(split_ring)
    return divide


# ---------------------------------------------------------------------------
# PathIndex-lite (pathIsEnclosed / findPathsInsideShape)

class PathIndexLite:
    def __init__(self, shapes, arcs: RefArcs):
        from ..geom.kernels import points_in_ring
        self._pir = points_in_ring
        self.arcs = arcs
        self.rings = []     # (bbox, coords x, coords y, shape_id)
        for si, shape in enumerate(shapes):
            for ids in (shape or []):
                x, y = path_coords(ids, arcs)
                if len(x) < 2:
                    continue
                bb = (x.min(), y.min(), x.max(), y.max())
                self.rings.append((bb, x, y, si, ids))

    def _test_point(self, path):
        arc_id = path[0]
        p0 = self.arcs.vertex(arc_id, 0)
        p1 = self.arcs.vertex(arc_id, 1)
        return ((p0[0] + p1[0]) / 2, (p0[1] + p1[1]) / 2)

    def point_is_enclosed(self, p):
        is_in = False
        for bb, x, y, _, _ in self.rings:
            if not (bb[0] <= p[0] <= bb[2] and bb[1] <= p[1] <= bb[3]):
                continue
            r = self._pir(np.array([p[0]]), np.array([p[1]]), x, y)[0]
            if r == -1:
                return True
            if r == 1:
                is_in = not is_in
        return is_in

    def path_is_enclosed(self, path):
        return self.point_is_enclosed(self._test_point(path))

    def find_enclosed_paths(self, path_ids):
        x, y = path_coords(path_ids, self.arcs)
        bb = (x.min(), y.min(), x.max(), y.max())
        found = []
        for rbb, _, _, _, ids in self.rings:
            if rbb[0] < bb[0] or rbb[1] < bb[1] or rbb[2] > bb[2] or \
                    rbb[3] > bb[3]:
                continue
            p = self._test_point(ids)
            if bb[0] <= p[0] <= bb[2] and bb[1] <= p[1] <= bb[3] and \
                    self._pir(np.array([p[0]]), np.array([p[1]]),
                              x, y)[0] == 1:
                found.append(ids)
        return found or None

    def find_paths_inside_shape(self, shape):
        paths = []
        for ids in (shape or []):
            enclosed = self.find_enclosed_paths(ids)
            if enclosed:
                # the reference's xorArrays (path-index.js:212) is NOT
                # a true xor: its second loop tests membership in the
                # partially-built OUTPUT, so an element present in both
                # lists is re-added.  A clip ring inside a target HOLE
                # therefore stays "interior" — reproduce exactly.
                out = [p for p in paths
                       if not any(p is q for q in enclosed)]
                out += [q for q in enclosed
                        if not any(q is p for p in out)]
                paths = out
        return paths or None


# ---------------------------------------------------------------------------
# polygon dissolver (mapshaper-polygon-dissolve2.js getPolygonDissolver)

def fix_nesting_errors(rings, arcs: RefArcs):
    """Reject rings with the same chirality as their smallest enclosing
    ring (mapshaper-ring-nesting.js:8-29)."""
    if len(rings) <= 1:
        return rings
    from ..geom.kernels import points_in_ring
    data = []
    for ids in rings:
        x, y = path_coords(ids, arcs)
        data.append((x, y, path_area(ids, arcs),
                     (x.min(), y.min(), x.max(), y.max())))

    def smallest_enclosing(i):
        x, y, _, bb = data[i]
        arc_id = rings[i][0]
        p0 = arcs.vertex(arc_id, 0)
        p1 = arcs.vertex(arc_id, 1)
        p = ((p0[0] + p1[0]) / 2, (p0[1] + p1[1]) / 2)
        best, best_area = -1, math.inf
        for j in range(len(rings)):
            if j == i:
                continue
            xj, yj, _, bbj = data[j]
            if bbj == bb:
                continue
            if bbj[0] > bb[0] or bbj[1] > bb[1] or bbj[2] < bb[2] or \
                    bbj[3] < bb[3]:
                continue
            bba = (bbj[2] - bbj[0]) * (bbj[3] - bbj[1])
            if best >= 0 and best_area < bba:
                continue
            if points_in_ring(np.array([p[0]]), np.array([p[1]]),
                              xj, yj)[0] == 1:
                best, best_area = j, bba
        return best

    out = []
    for i, ids in enumerate(rings):
        container = smallest_enclosing(i)
        if container > -1:
            if (data[i][2] > 0) == (data[container][2] > 0):
                continue  # same chirality as container: invalid
        out.append(ids)
    return out


def get_polygon_dissolver(nodes: Nodes):
    flags = np.zeros(nodes.arcs.size(), dtype=np.int64)
    divide = get_hole_divider(nodes)
    flatten = get_ring_intersector(nodes, "flatten", flags)
    dissolve = get_ring_intersector(nodes, "dissolve", flags)

    def dissolve_shape(shp):
        if not shp:
            return None
        cw, ccw = [], []
        divide(shp, cw, ccw)
        cw = flatten(cw)
        for p in ccw:
            reverse_path(p)
        ccw = flatten(ccw)
        for p in ccw:
            reverse_path(p)
        shp2 = cw + ccw
        dissolved = dissolve(shp2)
        if len(dissolved) > 1:
            dissolved = fix_nesting_errors(dissolved, nodes.arcs)
        return dissolved if dissolved else None
    return dissolve_shape


# ---------------------------------------------------------------------------
# clipPolygons (mapshaper-polygon-clipping.js)

def clip_polygons(target_shapes, clip_shapes, arcs: RefArcs,
                  nodes: Nodes, type_):
    clip_flags = np.zeros(arcs.size(), dtype=np.int64)
    route_flags = np.zeros(arcs.size(), dtype=np.int64)
    state = {"touches": 0, "uses": 0}
    used_clip_arcs = []
    dissolve_polygon = get_polygon_dissolver(nodes)

    def route_is_active(sid):
        fw = sid >= 0
        a = sid if fw else ~sid
        visible_bit = 1 if fw else 0x10
        if clip_flags[a] > 0:
            state["touches"] += 1
        return (int(route_flags[a]) & visible_bit) > 0 or \
            (int(clip_flags[a]) & visible_bit) > 0

    def use_route(sid):
        fw = sid >= 0
        a = sid if fw else ~sid
        target_bits = int(route_flags[a])
        clip_bits = int(clip_flags[a])
        t_route = (target_bits if fw else target_bits >> 4) & 3
        c_route = (clip_bits if fw else clip_bits >> 4) & 3
        usable = False
        if t_route == 3:
            if c_route == 1:
                pass
            elif c_route == 2 and type_ == "erase":
                pass
            else:
                usable = True
        elif t_route == 0 and c_route == 3:
            used_clip_arcs.append(sid)
            usable = True
        if usable:
            if c_route == 3:
                state["uses"] += 1
            if fw:
                target_bits = set_bits(target_bits, 1, 3)
            else:
                target_bits = set_bits(target_bits, 0x10, 0x30)
        target_bits |= 4 if fw else 0x40
        route_flags[a] = target_bits & 0xFF
        return usable

    divide_path = get_path_finder(nodes, use_route, route_is_active)

    # clean each target polygon by dissolving its rings
    target_shapes = [dissolve_polygon(shp) if shp else None
                     for shp in target_shapes]
    # merge + dissolve the clip side
    merged = []
    for shp in clip_shapes:
        merged.extend(shp or [])
    clip_shapes = [dissolve_polygon(merged)]

    open_routes(clip_shapes, arcs, clip_flags, type_ == "clip",
                type_ == "erase", True, 0x11)

    index = PathIndexLite(clip_shapes, arcs)

    def clip_polygon(shape):
        divided_shape = []
        clipping = type_ == "clip"
        erasing = type_ == "erase"
        open_routes([shape], arcs, route_flags, True, False, False)
        for ids in shape:
            for sid in ids:
                state["touches"] = 0
                state["uses"] = 0
                path = divide_path(sid)
                if path:
                    if state["touches"] == 0 or state["uses"] == 0:
                        contained = index.path_is_enclosed(path)
                        if (clipping and contained) or \
                                (erasing and not contained):
                            divided_shape.append(path)
                    else:
                        divided_shape.append(path)
        close_routes([shape], arcs, route_flags, True, True, True)
        if used_clip_arcs:
            close_routes([used_clip_arcs], arcs, route_flags, True,
                         True, True)
            del used_clip_arcs[:]
        return divided_shape or None

    clipped = [clip_polygon(shp) if shp else None
               for shp in target_shapes]

    # add undivided clip shapes fully contained in a target polygon
    def arc_is_unused(sid):
        return (int(route_flags[ABS(sid)]) & 0x44) == 0

    def arc_is_visible(sid):
        return (int(clip_flags[ABS(sid)]) & 0x11) > 0

    undivided = []
    for shape in clip_shapes:
        usable = []
        for ids in (shape or []):
            clean = all(arc_is_unused(sid) for sid in ids)
            visible = any(arc_is_visible(sid) for sid in ids)
            if clean and visible:
                usable.append(ids)
        undivided.append(usable or None)

    close_routes(clip_shapes, arcs, route_flags, True, True, False)
    index2 = PathIndexLite(undivided, arcs)

    def find_interior_paths(shape):
        enclosed = index2.find_paths_inside_shape(shape)
        if not enclosed:
            return None
        enclosed = [list(p) for p in enclosed]
        if type_ == "erase":
            for p in enclosed:
                reverse_path(p)
        if len(enclosed) <= 1:
            return enclosed
        dissolved = []
        open_routes(enclosed, arcs, route_flags, True, False, True)
        for ids in enclosed:
            for sid in ids:
                path = divide_path(sid)
                if path:
                    dissolved.append(path)
        return dissolved or None

    for i, shape in enumerate(target_shapes):
        if shape:
            paths = find_interior_paths(shape)
            if paths:
                clipped[i] = (clipped[i] or []) + paths
    return clipped


# ---------------------------------------------------------------------------
# top-level: features -> clipped features

def _features_to_arcs(features):
    """Ring-coordinate features -> (RefArcs, shapes) via the shared-arc
    topology builder."""
    from .build import build_topology
    arcs, shapes = build_topology(features)
    return RefArcs(arcs.nn, arcs.xx, arcs.yy), shapes


def add_intersection_cuts(arcs: RefArcs, shapes, polygon_flags=None):
    """Reference addIntersectionCuts: snap -> dedup -> cut at
    intersections -> clean -> nodes.  Returns (arcs, shapes, nodes).
    ``polygon_flags``: per-shape bool — cleanShape applies the polygon
    spike/zero-area repair only to polygon shapes
    (src/paths/mapshaper-polygon-repair.js:15-26); default all
    polygon."""
    snap_dist = high_precision_snap_interval(arcs)
    snapped = snap_coords_by_interval(arcs, snap_dist)
    duped = arcs.dedup_coords()
    if snapped or duped:
        # rebuild topology on the snapped coordinates
        feats = []
        for shape in shapes:
            if shape is None:
                feats.append(None)
                continue
            rings = []
            for ids in shape:
                x, y = path_coords(ids, arcs)
                rings.append(np.stack([x, y], axis=1))
            feats.append(rings)
        arcs, shapes = _features_to_arcs(feats)
    hits = find_segment_intersections(arcs)
    points = _convert_intersections_to_cut_points(hits, arcs.xx, arcs.yy)
    arcs2, arc_map = insert_cut_points(points, arcs)
    arcs2.dedup_coords()
    shapes2 = []
    for shape in shapes:
        if shape is None:
            shapes2.append(None)
            continue
        shapes2.append([remap_divided_ids(ids, arc_map, arcs2.size())
                        for ids in shape])
    shapes2 = [clean_shape(s, arcs2,
                           polygon=(polygon_flags is None or
                                    polygon_flags[i]))
               if s is not None else None
               for i, s in enumerate(shapes2)]
    # reference cleanArcReferences (path-division.js:51,94): after
    # cutting, remap references to DUPLICATE arcs (same coordinate
    # sequence, forward or reversed) onto one arc — partially
    # overlapping collinear borders between clip and target otherwise
    # stay as twin arcs and the route flags never interact
    dmap = np.arange(arcs2.size(), dtype=np.int64)
    drev = np.zeros(arcs2.size(), dtype=bool)
    seen: dict = {}
    changed = False
    for a in range(arcs2.size()):
        x, y = path_coords([a], arcs2)
        kf = (x.tobytes(), y.tobytes())
        kr = (x[::-1].tobytes(), y[::-1].tobytes())
        if kf in seen:
            dmap[a] = seen[kf]
            changed = True
        elif kr in seen:
            dmap[a] = seen[kr]
            drev[a] = True
            changed = True
        else:
            seen[kf] = a
    if changed:
        def _remap_dupes(ids):
            out = []
            for sid in ids:
                a = sid if sid >= 0 else ~sid
                t = int(dmap[a])
                fwd = (sid >= 0) != bool(drev[a])
                out.append(t if fwd else ~t)
            return out
        shapes2 = [[_remap_dupes(ids) for ids in s]
                   if s is not None else None for s in shapes2]
    return arcs2, shapes2, Nodes(arcs2)


def clip_features(target_feats, clip_feats, type_):
    """target/clip: ring-coordinate feature lists.  Returns clipped
    shapes as ring-coordinate lists per target feature (None for empty).
    """
    all_feats = list(target_feats) + list(clip_feats)
    arcs, shapes = _features_to_arcs(all_feats)
    arcs, shapes, nodes = add_intersection_cuts(arcs, shapes)
    nt = len(target_feats)
    t_shapes = shapes[:nt]
    c_shapes = [s for s in shapes[nt:] if s]
    clipped = clip_polygons(t_shapes, c_shapes, arcs, nodes, type_)
    out = []
    for shp in clipped:
        if not shp:
            out.append(None)
            continue
        rings = []
        for ids in shp:
            x, y = path_coords(ids, arcs)
            if len(x) and (x[0] != x[-1] or y[0] != y[-1]):
                x = np.append(x, x[0])
                y = np.append(y, y[0])
            rings.append((x, y))
        out.append(rings)
    return out


def clip_polyline_features(target_feats, clip_feats, type_):
    """Reference -clip/-erase on POLYLINE targets
    (src/clipping/mapshaper-polyline-clipping.js:7-37): after
    addIntersectionCuts divides every arc at crossings, a divided
    target arc is kept iff its first-segment midpoint is enclosed by
    the clip polygons (clip) / not enclosed (erase); consecutive kept
    arcs merge back into one path.  ``target_feats``: per-feature lists
    of open-path (n,2) arrays; ``clip_feats``: ring-coordinate lists.
    Returns, per target feature, a list of (x, y) open paths or None."""
    all_feats = list(target_feats) + list(clip_feats)
    nt = len(target_feats)
    arcs, shapes = _features_to_arcs(all_feats)
    flags = [i >= nt for i in range(len(all_feats))]
    arcs, shapes, nodes = add_intersection_cuts(arcs, shapes,
                                                polygon_flags=flags)
    t_shapes = shapes[:nt]
    c_shapes = [s for s in shapes[nt:] if s]
    index = PathIndexLite(c_shapes, arcs)

    out = []
    for shp in t_shapes:
        if not shp:
            out.append(None)
            continue
        memo: list[list[int]] = []
        for path in shp:
            cur = None
            for sid in path:
                enclosed = index.point_is_enclosed(
                    index._test_point([sid]))
                if (enclosed and type_ == "clip") or \
                        (not enclosed and type_ == "erase"):
                    if cur is None:
                        cur = []
                        memo.append(cur)
                    cur.append(sid)
                else:
                    cur = None
        if not memo:
            out.append(None)
            continue
        out.append([path_coords(ids, arcs) for ids in memo])
    return out


# ---------------------------------------------------------------------------
# polygon mosaic + dissolve2 (mapshaper-polygon-mosaic.js,
# mapshaper-polygon-dissolve3.js)

class FilteredNodes(Nodes):
    """NodeCollection with an arc-presence filter and acyclic-arc
    detachment (buildPolygonMosaic needs spikes removed)."""

    def __init__(self, arcs: RefArcs, present=None):
        self.arcs = arcs
        self.present = present
        self.detached: set = set()
        self._at = {}
        for a in range(arcs.size()):
            if present is not None and not present[a]:
                continue
            i0 = int(arcs.ii[a])
            j = i0 + int(arcs.nn[a]) - 1
            self._at.setdefault((arcs.xx[j], arcs.yy[j]), []).append(a)
            self._at.setdefault((arcs.xx[i0], arcs.yy[i0]),
                                []).append(~a)

    def connected(self, arc_id, filt=None):
        a = ABS(arc_id)
        if a in self.detached:
            return []
        arcs = self.arcs
        i0 = int(arcs.ii[a])
        j = i0 + int(arcs.nn[a]) - 1
        node = (arcs.xx[j], arcs.yy[j]) if arc_id >= 0 else \
            (arcs.xx[i0], arcs.yy[i0])
        out = []
        for cand in self._at.get(node, ()):
            if cand == arc_id or ABS(cand) in self.detached:
                continue
            if filt and not filt(ABS(cand)):
                continue
            out.append(cand)
        return out

    def detach_acyclic_arcs(self):
        """Iteratively detach arcs dangling at either endpoint
        (detachAcyclicArcs, src/topology/mapshaper-nodes.js:58-76)."""
        changed = True
        count = 0
        while changed:
            changed = False
            for a in range(self.arcs.size()):
                if a in self.detached:
                    continue
                if self.present is not None and not self.present[a]:
                    continue
                # dangling if no OTHER live arc meets either endpoint
                if not self.connected(a) or not self.connected(~a):
                    self.detached.add(a)
                    changed = True
                    count += 1
        return count


def _simple_bounds(ids, arcs: RefArcs):
    x, y = path_coords(ids, arcs)
    return (float(x.min()), float(y.min()), float(x.max()), float(y.max()))


def _seg_test_point(ids, arcs: RefArcs):
    p0 = arcs.vertex(ids[0], 0)
    p1 = arcs.vertex(ids[0], 1)
    return ((p0[0] + p1[0]) / 2, (p0[1] + p1[1]) / 2)


def _find_smallest_enclosing(ring_ids, candidates, arcs: RefArcs):
    """findSmallestEnclosingPolygon over candidate rings
    [(ids, bounds)] — smallest-bbox candidate that strictly contains
    the ring's bbox and its test point (mapshaper-path-index.js:77-91).
    Returns candidate index or -1."""
    from ..geom.kernels import points_in_ring
    bb = _simple_bounds(ring_ids, arcs)
    p = _seg_test_point(ring_ids, arcs)
    best, best_area = -1, math.inf
    for idx, (ids, cbb) in enumerate(candidates):
        if cbb == bb:
            continue
        if cbb[0] > bb[0] or cbb[1] > bb[1] or cbb[2] < bb[2] or \
                cbb[3] < bb[3]:
            continue
        area = (cbb[2] - cbb[0]) * (cbb[3] - cbb[1])
        if best >= 0 and best_area < area:
            continue
        x, y = path_coords(ids, arcs)
        if points_in_ring(np.array([p[0]]), np.array([p[1]]),
                          x, y)[0] == 1:
            best, best_area = idx, area
    return best


def find_mosaic_rings(nodes: FilteredNodes):
    """findMosaicRings: walk every open directed arc into rightmost
    rings; classify by signed area."""
    arcs = nodes.arcs
    cw, ccw = [], []
    flags = np.zeros(arcs.size(), dtype=np.int64)

    def route_is_open(arc_id, close=False):
        a = ABS(arc_id)
        bit = 1 if a == arc_id else 2
        is_open = (int(flags[a]) & bit) == 0
        if close and is_open:
            flags[a] |= bit
        return is_open

    def use_route(arc_id):
        return route_is_open(arc_id, close=True)

    find_path = get_path_finder(nodes, use_route)

    def try_path(arc_id):
        if ABS(arc_id) in nodes.detached:
            return
        if nodes.present is not None and not nodes.present[ABS(arc_id)]:
            return
        if not route_is_open(arc_id):
            return
        ring = find_path(arc_id)
        if not ring:
            return  # dead-end arc
        area = path_area(ring, arcs)
        if area > 0:
            cw.append(ring)
        elif area < 0:
            ccw.append(ring)

    for i in range(arcs.size()):
        try_path(i)
        try_path(~i)
    return cw, ccw


def build_polygon_mosaic(nodes: FilteredNodes):
    """buildPolygonMosaic: CW rings are tile boundaries; enclosed CCW
    rings attach as holes, unenclosed ones are enclosures (dropped
    here, like dissolve2 does)."""
    nodes.detach_acyclic_arcs()
    cw, ccw = find_mosaic_rings(nodes)
    mosaic = [[ring] for ring in cw]
    cands = [(t[0], _simple_bounds(t[0], nodes.arcs)) for t in mosaic]
    for ring in ccw:
        idx = _find_smallest_enclosing(ring, cands, nodes.arcs)
        if idx > -1:
            mosaic[idx].append(ring)
    return mosaic


def calc_max_sliver_area(arcs: RefArcs):
    """calcMaxSliverArea: mean segment length (ignoring very long
    segments) squared."""
    if not len(arcs.xx):
        return 0.0
    dx_max = (float(arcs.xx.max()) - float(arcs.xx.min())) / 2
    dy_max = (float(arcs.yy.max()) - float(arcs.yy.min())) / 2
    mean = 0.0
    count = 0
    for a in range(arcs.size()):
        i0 = int(arcs.ii[a])
        n = int(arcs.nn[a])
        x = arcs.xx[i0:i0 + n]
        y = arcs.yy[i0:i0 + n]
        dx = np.abs(np.diff(x))
        dy = np.abs(np.diff(y))
        for k in range(len(dx)):
            if dx[k] < dx_max and dy[k] < dy_max:
                count += 1
                mean += (math.sqrt(dx[k] * dx[k] + dy[k] * dy[k]) -
                         mean) / count
    return mean * mean


def dissolve_polygons2(groups, arcs: RefArcs, min_gap_area=None):
    """dissolvePolygons2 (mapshaper-polygon-dissolve3.js:37-190):
    mosaic tiles assigned to the highest-weight group indexing each
    boundary arc; unassigned (gap) tiles adopt the highest-priority
    NEIGHBOR when they pass the gap-fill test (default: the sliver
    threshold; 0 disables fill)."""
    present = np.zeros(arcs.size(), dtype=bool)
    for shape in groups:
        for ids in (shape or []):
            for sid in ids:
                present[ABS(sid)] = True
    nodes = FilteredNodes(arcs, present)
    divide = get_hole_divider(nodes)
    dissolve = get_ring_intersector(nodes, "dissolve")
    if min_gap_area == 0:
        def gap_test(ring):
            return False
    elif min_gap_area is not None:
        def gap_test(ring):
            return abs(path_area(ring, arcs)) < min_gap_area
    else:
        max_sliver = calc_max_sliver_area(arcs)

        def gap_test(ring):
            return abs(path_area(ring, arcs)) <= max_sliver

    mosaic = build_polygon_mosaic(nodes)
    fwd_index = np.full(arcs.size(), -1, dtype=np.int64)
    rev_index = np.full(arcs.size(), -1, dtype=np.int64)
    weights = []
    tile_groups = [[] for _ in groups]
    unassigned = []

    def get_shape_id(sid):
        a = ABS(sid)
        return int((fwd_index if a == sid else rev_index)[a])

    def set_shape_id(sid, shp_id):
        a = ABS(sid)
        (fwd_index if a == sid else rev_index)[a] = shp_id

    def choose(a, b):
        if a == -1 or (b > -1 and weights[a] < weights[b]):
            return b
        return a

    for shape_id, shape in enumerate(groups):
        weights.append(sum(path_area(ids, arcs)
                           for ids in (shape or [])))
        cw, ccw = [], []
        divide(shape or [], cw, ccw)
        rings = cw + ccw
        if ccw:
            # fixNestingErrors2: un-contained CCW rings flip to CW
            cands = [(ids, _simple_bounds(ids, arcs)) for ids in rings]
            for ids in rings:
                if path_area(ids, arcs) < 0:
                    others = [c for c in cands if c[0] is not ids]
                    if _find_smallest_enclosing(ids, others, arcs) == -1:
                        reverse_path(ids)
        for ids in rings:
            for sid in ids:
                stored = get_shape_id(sid)
                if stored == -1 or choose(shape_id, stored) == shape_id:
                    set_shape_id(sid, shape_id)

    for tile_id, tile in enumerate(mosaic):
        ring = tile[0]
        shape_id = -1
        for sid in ring:
            shape_id = choose(shape_id, get_shape_id(sid))
        if shape_id == -1:
            unassigned.append(tile_id)
        else:
            tile_groups[shape_id].append(tile_id)

    for tile_id in unassigned:
        ring = mosaic[tile_id][0]
        shape_id = -1
        for sid in ring:
            shape_id = choose(shape_id, get_shape_id(~sid))
        if shape_id > -1 and gap_test(ring):
            tile_groups[shape_id].append(tile_id)

    out = []
    for group in tile_groups:
        rings, holes = [], []
        for tile_id in group:
            tile = mosaic[tile_id]
            rings.append(tile[0])
            holes.extend(tile[1:])
        dissolved = dissolve(rings + holes)
        out.append(dissolved if dissolved else None)
    return out


def dissolve2_features(features, keys, min_gap_area=None,
                       per_feature=False):
    """Top-level -dissolve2 / -clean over ring-coordinate features.
    Returns {key: [(x, y) rings]} (``per_feature=True`` keeps one group
    per feature — the -clean semantics)."""
    arcs, shapes = _features_to_arcs(features)
    arcs, shapes, _ = add_intersection_cuts(arcs, shapes)
    order = []
    groups: dict = {}
    for shape, key in zip(shapes, keys):
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].extend(shape or [])
    shapes2 = dissolve_polygons2([groups[k] for k in order], arcs,
                                 min_gap_area=min_gap_area)
    out = {}
    for key, shp in zip(order, shapes2):
        rings = []
        for ids in (shp or []):
            x, y = path_coords(ids, arcs)
            if len(x) and (x[0] != x[-1] or y[0] != y[-1]):
                x = np.append(x, x[0])
                y = np.append(y, y[0])
            rings.append((x, y))
        out[key] = rings
    return out
