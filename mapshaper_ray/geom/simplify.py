"""Visvalingam + Douglas-Peucker vertex-threshold computation.

Re-implements the reference's non-destructive simplification model
(``src/simplify/mapshaper-visvalingam.js``, ``src/simplify/mapshaper-dp.js``,
``src/simplify/mapshaper-heap.js``, threshold/percentage rank semantics of
``src/paths/mapshaper-arcs.js:488-558``): every vertex of an arc gets a
removal threshold ``z``; endpoints get ``inf``; display/export at retained
interval ``zlimit`` keeps vertices with ``z >= zlimit``.

Each arc is an independent unit of work → the distributed driver runs
these kernels inside ``map_batches`` over the arcs table (one batch =
many arcs); per-arc results are bit-reproducible regardless of
partitioning.
"""

from __future__ import annotations

import math

import numpy as np

from .kernels import (
    cosine,
    cosine3d,
    lnglat_to_xyz,
    point_seg_dist_sq,
    point_seg_dist_sq_3d,
    triangle_area,
    triangle_area_3d,
)

INF = math.inf


class _Heap:
    """Min-heap with updateValue, tie-broken by larger index first.

    Port of the reference heap (src/simplify/mapshaper-heap.js:5-160)
    including the equal-value comparison by array index, which the
    reference keeps for parity with Visvalingam's own implementation.
    """

    __slots__ = ("data", "heap", "index", "n")

    def init(self, values):
        n = len(values)
        self.data = values
        self.n = n
        self.heap = list(range(n))
        self.index = list(range(n))
        for i in range((n - 2) >> 1, -1, -1):
            self._down(i)

    def size(self):
        return self.n

    def update(self, val_idx, val):
        heap_idx = self.index[val_idx]
        self.data[val_idx] = val
        self._down(self._up(heap_idx))

    def pop(self):
        heap = self.heap
        pop_idx = heap[0]
        self.n -= 1
        self._insert(0, heap[self.n])
        self._down(0)
        return pop_idx

    def _insert(self, heap_idx, val_id):
        self.index[val_id] = heap_idx
        self.heap[heap_idx] = val_id

    def _greater(self, a, b):
        heap = self.heap
        i1, i2 = heap[a], heap[b]
        v1, v2 = self.data[i1], self.data[i2]
        return v1 > v2 or (v1 == v2 and i1 > i2)

    def _up(self, idx):
        while idx > 0:
            parent = (idx - 1) >> 1
            if self._greater(idx, parent):
                break
            self._swap(idx, parent)
            idx = parent
        return idx

    def _down(self, idx):
        while True:
            a = 2 * idx + 1
            b = a + 1
            m = idx
            if a < self.n and self._greater(m, a):
                m = a
            if b < self.n and self._greater(m, b):
                m = b
            if m == idx:
                return
            self._swap(idx, m)
            idx = m

    def _swap(self, a, b):
        heap = self.heap
        i = heap[a]
        self._insert(a, heap[b])
        self._insert(b, i)


def _vw_metric_2d(weighting=None):
    if weighting is None:
        return lambda b, c, d, xx, yy, zz: triangle_area(
            xx[b], yy[b], xx[c], yy[c], xx[d], yy[d])
    k = weighting

    def metric(b, c, d, xx, yy, zz):
        area = triangle_area(xx[b], yy[b], xx[c], yy[c], xx[d], yy[d])
        cos = cosine(xx[b], yy[b], xx[c], yy[c], xx[d], yy[d])
        return (-cos * k + 1) * area
    return metric


def _vw_metric_3d(weighting=None):
    if weighting is None:
        return lambda b, c, d, xx, yy, zz: triangle_area_3d(
            xx[b], yy[b], zz[b], xx[c], yy[c], zz[c], xx[d], yy[d], zz[d])
    k = weighting

    def metric(b, c, d, xx, yy, zz):
        area = triangle_area_3d(xx[b], yy[b], zz[b], xx[c], yy[c], zz[c],
                                xx[d], yy[d], zz[d])
        cos = cosine3d(xx[b], yy[b], zz[b], xx[c], yy[c], zz[c],
                       xx[d], yy[d], zz[d])
        return (-cos * k + 1) * area
    return metric


def visvalingam_thresholds(xx, yy, zz=None, weighting=None, scaled=True):
    """Per-vertex VW removal thresholds for one arc.

    Port of Visvalingam.getArcCalculator
    (src/simplify/mapshaper-visvalingam.js:20-80) with the monotonic
    max-propagation rule, and the sqrt(area)*0.65 linearization of
    scaledSimplify (:138-146).  ``zz`` given → 3D metric (spherical via
    lnglat_to_xyz).  ``weighting`` float → weighted metric
    (reference default weight 0.7).
    """
    xx = np.asarray(xx, dtype=np.float64)
    yy = np.asarray(yy, dtype=np.float64)
    is3d = zz is not None
    if is3d:
        zz = np.asarray(zz, dtype=np.float64)
    metric = (_vw_metric_3d(weighting) if is3d else _vw_metric_2d(weighting))
    n = len(xx)
    kk = [0.0] * n
    nxt = list(range(1, n + 1))
    prv = list(range(-1, n - 1))
    for c in range(n):
        if c == 0 or c == n - 1:
            kk[c] = INF
        else:
            kk[c] = float(metric(c - 1, c, c + 1, xx, yy, zz))
    heap = _Heap()
    heap.init(kk)
    max_val = -INF
    while heap.size() > 0:
        c = heap.pop()
        val = kk[c]
        if val == INF:
            break
        if val < max_val:
            # don't assign a lesser value than the last removed vertex
            kk[c] = max_val
        else:
            max_val = val
        b = prv[c]
        d = nxt[c]
        if b > 0:
            heap.update(b, float(metric(prv[b], b, d, xx, yy, zz)))
        if d < n - 1:
            heap.update(d, float(metric(b, d, nxt[d], xx, yy, zz)))
        nxt[b] = d
        prv[d] = b
    out = np.array(kk, dtype=np.float64)
    if scaled:
        inner = out[1:-1]
        finite = np.isfinite(inner)
        inner[finite] = np.sqrt(inner[finite]) * 0.65
        out[1:-1] = inner
    return out


def dp_thresholds(xx, yy, zz=None):
    """Douglas-Peucker thresholds with the parent clamp + island rule.

    Port of DouglasPeucker.calcArcData (src/simplify/mapshaper-dp.js:12-77):
    children never get a larger threshold than their parent; the max point
    of a closed ring at depth 1 inherits max(child thresholds) to avoid a
    3-vertex degenerate ring.
    """
    xx = np.asarray(xx, dtype=np.float64)
    yy = np.asarray(yy, dtype=np.float64)
    use_z = zz is not None
    if use_z:
        zz = np.asarray(zz, dtype=np.float64)
    n = len(xx)
    dest = np.zeros(n, dtype=np.float64)
    dest[0] = dest[n - 1] = INF
    if n <= 2:
        return dest

    import sys
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, n + 100))
    try:
        def proc(start, end, depth, dist_sq_prev):
            ax, ay = xx[start], yy[start]
            cx, cy = xx[end], yy[end]
            if use_z:
                az, cz = zz[start], zz[end]
            max_dist_sq = 0.0
            max_idx = 0
            if end - start > 1:
                i = np.arange(start + 1, end)
                if use_z:
                    d = point_seg_dist_sq_3d(xx[i], yy[i], zz[i],
                                             ax, ay, az, cx, cy, cz)
                else:
                    d = point_seg_dist_sq(xx[i], yy[i], ax, ay, cx, cy)
                # reference keeps the LAST max (>=), np.argmax keeps first
                rel = len(d) - 1 - int(np.argmax(d[::-1]))
                max_dist_sq = float(d[rel])
                max_idx = start + 1 + rel
            if dist_sq_prev < max_dist_sq:
                max_dist_sq = dist_sq_prev
            dl = dr = 0.0
            if max_idx - start > 1:
                dl = proc(start, max_idx, depth + 1, max_dist_sq)
            if end - max_idx > 1:
                dr = proc(max_idx, end, depth + 1, max_dist_sq)
            if depth == 1 and ax == cx and ay == cy:
                max_dist_sq = max(dl, dr)
            dest[max_idx] = math.sqrt(max_dist_sq)
            return max_dist_sq

        proc(0, n - 1, 1, np.finfo(np.float64).max)
    finally:
        sys.setrecursionlimit(old_limit)
    return dest


def spherical_thresholds(lng, lat, method="visvalingam", weighting=None):
    """Thresholds for lat-lon arcs on the unit sphere (reference default
    for unprojected data, src/simplify/mapshaper-simplify.js:57-89)."""
    x3, y3, z3 = lnglat_to_xyz(lng, lat)
    if method == "dp":
        return dp_thresholds(x3, y3, z3)
    return visvalingam_thresholds(x3, y3, z3, weighting=weighting)


# ---------------------------------------------------------------------------
# percentage <-> interval rank semantics (src/paths/mapshaper-arcs.js:488-558)

def removable_thresholds(zz_concat):
    """All non-infinite thresholds (removable vertices)."""
    zz = np.asarray(zz_concat, dtype=np.float64)
    return zz[np.isfinite(zz)]


def threshold_by_pct(zz_concat, pct):
    """Retained-percentage → interval.  Exact rank, not an approximate
    quantile (getThresholdByPct, src/paths/mapshaper-arcs.js:541-558)."""
    if pct >= 1:
        return 0.0
    tmp = removable_thresholds(zz_concat)
    if len(tmp) == 0:
        rank = 0
    else:
        rank = math.floor((1 - pct) * (len(tmp) + 2))
    if rank <= 0:
        return 0.0
    if rank > len(tmp):
        return INF
    # findValueByRank: rank-th smallest, 1-based
    return float(np.partition(tmp, rank - 1)[rank - 1])


def pct_by_threshold(zz_concat, val):
    """Interval → retained percentage (getPctByThreshold,
    src/paths/mapshaper-arcs.js:528-538)."""
    if val <= 0:
        return 1.0
    arr = removable_thresholds(zz_concat)
    if len(arr) == 0:
        return 1.0
    # findRankByValue (lib/mbloch-utils.js:894-901): 1 + count of values < val
    rank = 1 + int(np.count_nonzero(arr < val))
    return 1 - (rank - 1) / len(arr)


def filter_arc_by_interval(xx, yy, zz, zlimit):
    """Vertices retained at a display interval (FilteredArcIter semantics,
    src/paths/mapshaper-arcs.js:423-431): keep where z >= zlimit; endpoints
    are inf so always kept."""
    keep = np.asarray(zz, dtype=np.float64) >= zlimit
    return np.asarray(xx)[keep], np.asarray(yy)[keep]
