"""keep-shapes protection + post-simplify repair (SURVEY.md §2.6
-simplify row, reference src/simplify/mapshaper-keep-shapes.js:3-40 and
mapshaper-post-simplify-repair.js:10-36).

- ``protect_shapes``: per feature, find the ring with the largest bbox;
  while that ring's area at infinite simplification is ~zero, lock
  (z := inf) the vertex with the LARGEST remaining threshold — exactly
  ``protectPolygonRing``/``lockMaxThreshold``.  Embarrassingly parallel
  per feature → runs inside map_batches.
- ``repair_intersections``: after thresholding, find crossings between
  retained segments and unwind them by re-inserting the removed vertex
  with the higher threshold (simplified unwind: raise the z of the
  vertex whose removal caused the crossing), iterating until no
  fixable crossings remain.
"""

from __future__ import annotations

import numpy as np

from .kernels import planar_ring_area, segment_intersection


def _ring_coords_at(xs_parts, ys_parts, zz_parts, zlimit):
    """Concatenated retained ring coords at a threshold (z >= zlimit;
    endpoints always retained by construction: their z is inf)."""
    xs, ys = [], []
    for x, y, z in zip(xs_parts, ys_parts, zz_parts):
        m = np.asarray(z) >= zlimit
        xs.append(np.asarray(x)[m])
        ys.append(np.asarray(y)[m])
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    return x, y


def protect_ring(xs_parts, ys_parts, zz_parts, min_area=1e-10):
    """Mutates zz_parts (lists of numpy arrays) so the ring retains a
    positive area even at infinite simplification."""
    while True:
        x, y = _ring_coords_at(xs_parts, ys_parts, zz_parts, np.inf)
        if len(x) >= 3 and abs(planar_ring_area(
                np.append(x, x[0]), np.append(y, y[0]))) > min_area:
            return
        # lock the largest finite threshold across the ring's arcs
        best = (-1.0, None, None)
        for pi, z in enumerate(zz_parts):
            z = np.asarray(z)
            finite = np.isfinite(z)
            if not finite.any():
                continue
            i = int(np.argmax(np.where(finite, z, -np.inf)))
            if z[i] > best[0]:
                best = (float(z[i]), pi, i)
        if best[1] is None:
            return  # nothing left to lock
        zz_parts[best[1]][best[2]] = np.inf


def protect_shapes(features):
    """features: list of shapes, each a list of ring dicts
    {'x','y','z'} (z mutated in place).  Protects the largest-bbox ring
    of each shape (protectShape semantics)."""
    for rings in features:
        if not rings:
            continue
        best = None
        best_area = -1.0
        for r in rings:
            x = np.asarray(r["x"])
            y = np.asarray(r["y"])
            if len(x) == 0:
                continue
            a = (x.max() - x.min()) * (y.max() - y.min())
            if a > best_area:
                best_area = a
                best = r
        if best is not None:
            zz = [np.asarray(best["z"], dtype=np.float64)]
            xs = [np.asarray(best["x"])]
            ys = [np.asarray(best["y"])]
            protect_ring(xs, ys, zz)
            best["z"] = zz[0]
    return features


def post_simplify_repair(nn, xx, yy, arc_zs, zlim):
    """Exact port of the reference's postSimplifyRepair
    (src/simplify/mapshaper-post-simplify-repair.js:10-143): find
    crossings among the RETAINED segments of the whole arc collection,
    then unwind simplification along intersecting segments — re-adding
    removed vertices (z := zlim) from a max-z-first queue, redetecting
    each target locally before unwinding.  ``arc_zs``: dict arc_id →
    per-vertex threshold array, MUTATED in place (endpoints treated as
    unremovable).  Returns the number of unrepairable crossings."""
    from ..topo.refclip import (RefArcs, _format_intersection,
                                find_segment_intersections,
                                ref_segment_intersection)

    nn = np.asarray(nn, dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(nn)])
    zz = np.empty(int(offs[-1]), dtype=np.float64)
    for a in range(len(nn)):
        z = np.asarray(arc_zs[a], dtype=np.float64)
        zz[offs[a]:offs[a + 1]] = z
        zz[offs[a]] = np.inf          # arc endpoints are unremovable
        zz[offs[a + 1] - 1] = np.inf
    arcs = RefArcs(nn, np.asarray(xx, float), np.asarray(yy, float))
    xx = arcs.xx
    yy = arcs.yy

    def retained_segments():
        segs = []
        for a in range(len(nn)):
            idx = np.nonzero(zz[offs[a]:offs[a + 1]] >= zlim)[0] + offs[a]
            for k in range(len(idx) - 1):
                i, j = int(idx[k]), int(idx[k + 1])
                segs.append((i, j) if xx[i] <= xx[j] else (j, i))
        return segs

    def find_next_removable(start, end):
        # max-z removed vertex strictly between (first max wins)
        if start > end:
            start, end = end, start
        j, jz = -1, 0.0
        for i in range(start + 1, end):
            z = zz[i]
            if z < zlim and z > jz:
                j, jz = i, z
        return j

    def get_unwind_target(o):
        ai = find_next_removable(o["a"][0], o["a"][1])
        bi = find_next_removable(o["b"][0], o["b"][1])
        if ai == -1 and bi == -1:
            return None
        if bi == -1 or (ai != -1 and zz[ai] > zz[bi]):
            return {"a": o["a"], "b": o["b"], "z": zz[ai]}
        return {"a": o["b"], "b": o["a"], "z": zz[bi]}

    def segment_vertices(seg):
        start, end = (seg[0], seg[1]) if seg[0] <= seg[1] else \
            (seg[1], seg[0])
        ids = []
        prev = start
        for i in range(start + 1, end + 1):
            if zz[i] >= zlim:
                ids.append((prev, i) if xx[prev] < xx[i] else (i, prev))
                prev = i
        return ids

    def intersect_segments(segs):
        # reference intersectSegments: x-sorted scan over candidates
        segs = sorted(segs, key=lambda ij: xx[ij[0]])
        out = []
        for i_ in range(len(segs) - 1):
            p1, p2 = segs[i_]
            for j_ in range(i_ + 1, len(segs)):
                q1, q2 = segs[j_]
                if xx[p2] < xx[q1]:
                    break
                if p1 in (q1, q2) or p2 in (q1, q2):
                    continue
                hit = ref_segment_intersection(
                    xx[p1], yy[p1], xx[p2], yy[p2],
                    xx[q1], yy[q1], xx[q2], yy[q2])
                if hit is None:
                    continue
                for off in range(0, len(hit), 2):
                    out.append(_format_intersection(
                        hit[off], hit[off + 1], (p1, p2), (q1, q2),
                        xx, yy))
        return out

    def redetect(target):
        cands = segment_vertices(target["a"]) + \
            segment_vertices(target["b"])
        return [t for t in (get_unwind_target(o)
                            for o in intersect_segments(cands))
                if t is not None]

    def unwind(target):
        reps = []
        start, end = target["a"]
        z = target["z"]
        for i in range(start + 1, end + 1):
            if zz[i] == z or i == end:
                reps.append({"a": (start, i), "b": target["b"],
                             "z": z})
                if i != end:
                    zz[i] = zlim
                start = i
        return reps

    def insert_target(queue, obj):
        ins = len(queue)
        queue.append(obj)
        while ins > 0 and queue[ins - 1]["z"] > obj["z"]:
            queue[ins] = queue[ins - 1]
            ins -= 1
        queue[ins] = obj

    def unwind_round(intersections):
        changes = 0
        loops = 0
        queue = [t for t in (get_unwind_target(o)
                             for o in intersections) if t is not None]
        queue.sort(key=lambda t: t["z"])
        while queue:
            target = queue.pop()
            reps = redetect(target)
            if len(reps) == 1:
                reps = unwind(reps[0])
                changes += 1
            for r in reps:
                insert_target(queue, r)
            loops += 1
            if loops > 500000:
                return 0
        return changes

    intersections = find_segment_intersections(arcs,
                                               retained_segments())
    while unwind_round(intersections) > 0:
        intersections = find_segment_intersections(arcs,
                                                   retained_segments())
    # write repaired thresholds back (endpoints untouched: callers
    # force-retain them anyway)
    for a in range(len(nn)):
        z = np.asarray(arc_zs[a], dtype=np.float64)
        seg = zz[offs[a]:offs[a + 1]].copy()
        seg[0] = z[0]
        seg[-1] = z[-1]
        arc_zs[a] = seg
    return len(intersections)


def find_retained_crossings(x, y, z, zlimit):
    """Crossings among the retained segments of one arc/ring."""
    m = np.asarray(z) >= zlimit
    rx = np.asarray(x)[m]
    ry = np.asarray(y)[m]
    hits = []
    n = len(rx) - 1
    closed = n > 0 and rx[0] == rx[-1] and ry[0] == ry[-1]
    for i in range(n):
        for j in range(i + 2, n):
            if closed and i == 0 and j == n - 1:
                continue  # closing segments share a vertex
            p = segment_intersection(rx[i], ry[i], rx[i + 1], ry[i + 1],
                                     rx[j], ry[j], rx[j + 1], ry[j + 1])
            if p is not None:
                hits.append((i, j, p))
    return hits


def repair_intersections(x, y, z, zlimit, max_rounds=10):
    """Unwind crossings introduced by simplification: re-add (lock) the
    highest-threshold REMOVED vertex between each crossing pair until no
    crossings remain or nothing can be re-added.  Returns number of
    remaining crossings (0 = fully repaired)."""
    z = np.asarray(z, dtype=np.float64)
    for _ in range(max_rounds):
        hits = find_retained_crossings(x, y, z, zlimit)
        if not hits:
            return 0, z
        fixed_any = False
        retained_idx = np.nonzero(np.asarray(z) >= zlimit)[0]
        for i, j, _ in hits:
            # removed vertices between the two retained endpoints of
            # each crossing segment; lock the largest-threshold one
            for a, b in ((retained_idx[i], retained_idx[i + 1]),
                         (retained_idx[j], retained_idx[j + 1])):
                seg = np.arange(a + 1, b)
                if len(seg) == 0:
                    continue
                k = seg[int(np.argmax(z[seg]))]
                if z[k] < zlimit:
                    z[k] = zlimit
                    fixed_any = True
                    break
            if fixed_any:
                break
        if not fixed_any:
            return len(hits), z
    return len(find_retained_crossings(x, y, z, zlimit)), z
