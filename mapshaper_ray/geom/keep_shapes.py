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
