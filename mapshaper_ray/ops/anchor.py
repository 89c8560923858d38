"""Inner ("anchor") point placement + antimeridian stitch
(SURVEY.md §2.2 -points inner row, -stitch row).

- ``anchor_points``: reference strategy
  (src/points/mapshaper-anchor-points.js:17-52): take the largest ring,
  pre-simplify it (fast threshold = sqrt(bbox area) * 0.01), then probe
  a centroid-weighted candidate grid and keep the point that maximizes
  distance-to-boundary x closeness-to-centroid — a label/anchor point
  guaranteed inside the polygon (unlike the centroid).
- ``stitch_antimeridian``: the common supported case of the reference's
  -stitch (src/commands/mapshaper-stitch.js:11-60): polygons split at
  the ±180 seam (parts touching both edges) are unwrapped — western
  parts shifted +360, seam edges at x=180 cancel via dissolve, output
  re-normalized to [-180, 180] with the wrapped part marked.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..geom.kernels import planar_ring_area, points_in_shape, ring_centroid
from ..geom.simplify import visvalingam_thresholds


def _simplify_polygon_fast(rings, dist):
    """simplifyPolygonFast (src/simplify/mapshaper-simplify-fast.js:21-66):
    keep vertices farther than ``dist`` from the previously kept vertex
    (always keeping the first, re-adding the final point if dropped);
    paths reduced below 4 points are discarded."""
    out = []
    for x, y in rings:
        xs, ys = [], []
        prev_x = prev_y = None
        lx = ly = None
        for xi, yi in zip(x, y):
            lx, ly = float(xi), float(yi)
            if prev_x is None or \
                    np.sqrt((lx - prev_x) ** 2 + (ly - prev_y) ** 2) > dist:  # distance2D
                xs.append(lx)
                ys.append(ly)
                prev_x, prev_y = lx, ly
        if lx is not None and (lx != prev_x or ly != prev_y):
            xs.append(lx)
            ys.append(ly)
        while 0 < len(xs) < 4:
            xs.pop()
            ys.pop()
        if xs:
            out.append((np.asarray(xs), np.asarray(ys)))
    return out or None


def _max_path(rings):
    """getMaxPath: ring with the largest BOUNDING-BOX area
    (src/geom/mapshaper-shape-geom.js:28-38)."""
    best, best_a = None, 0.0
    for x, y in rings:
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        if not len(x):
            continue
        a = (x.max() - x.min()) * (y.max() - y.min())
        if a > best_a:
            best, best_a = (x, y), a
    return best


def _path_centroid(x, y):
    """getPathCentroid streaming form (mapshaper-polygon-centroid.js:
    11-35); zero-area path falls back to the vertex average."""
    s = sx = sy = 0.0
    ax, ay = float(x[0]), float(y[0])
    for i in range(1, len(x)):
        t = ax * float(y[i]) - ay * float(x[i])
        s += t
        sx += t * (float(x[i]) + ax)
        sy += t * (float(y[i]) + ay)
        ax, ay = float(x[i]), float(y[i])
    area = s / 2.0
    if area == 0:
        return float(np.mean(x)), float(np.mean(y))
    return sx / (6 * area), sy / (6 * area)


def _pt_shape_dist(px, py, rings):
    """getPointToShapeDistance: min point-to-segment distance over
    every ring (same apexDistSq arithmetic as the reference)."""
    from ..geom.kernels import point_seg_dist_sq
    best = np.inf
    for x, y in rings:
        if len(x) < 2:
            continue
        d = point_seg_dist_sq(px, py, x[:-1], y[:-1], x[1:], y[1:])
        m = float(np.min(d))
        if m < best:
            best = m
    return float(np.sqrt(best)) if np.isfinite(best) else np.inf


def _pt_in_polygon(px, py, rings):
    """testPointInPolygon: even-odd across rings; boundary counts in."""
    from ..geom.kernels import points_in_ring
    is_in = False
    for x, y in rings:
        r = points_in_ring(np.array([px]), np.array([py]), x, y)[0]
        if r == 1:
            is_in = not is_in
        elif r == -1:
            return True
    return is_in


def _ray_ring_hits(x, y0, rx, ry):
    """findRayRingIntersections: y-intercepts of the upward vertical
    ray at (x, y0) with one ring (getRayIntersection per segment,
    src/geom/mapshaper-shape-geom.js:177-222); an odd count (ray
    touches without crossing) discards the ring\'s hits."""
    hits = []
    for i in range(len(rx) - 1):
        ax, ay = float(rx[i]), float(ry[i])
        bx, by = float(rx[i + 1]), float(ry[i + 1])
        hit = -np.inf
        if (x < ax and x < bx) or (x > ax and x > bx) or \
                (y0 > ay and y0 > by):
            pass
        elif x == ax or x == bx:
            if x == ax and x == bx:
                if y0 == ay or y0 == by or (y0 > ay) != (y0 > by):
                    hit = np.nan
            elif x == ax:
                if y0 == ay:
                    hit = np.nan
                elif bx < ax and y0 < ay:
                    hit = ay
            else:
                if y0 == by:
                    hit = np.nan
                elif ax < bx and y0 < by:
                    hit = by
        else:
            y_int = ay + (x - ax) * (by - ay) / (bx - ax)
            if y_int > y0:
                hit = y_int
            elif y_int == y0:
                hit = np.nan
        if hit > -np.inf:       # NaN fails this test, like the JS
            hits.append(hit)
    if len(hits) % 2 == 1:
        return []
    return hits


def _hit_candidates(x, y0, rings):
    """findHitCandidates: midpoints of the interior segments formed by
    a vertical ray at ``x`` (per-ring hits concatenated, sorted,
    paired)."""
    yy = []
    for rx, ry in rings:
        yy.extend(_ray_ring_hits(x, y0, rx, ry))
    yy.sort()
    cands = []
    for i in range(0, len(yy) - 1, 2):
        interval = (yy[i + 1] - yy[i]) / 2
        if interval > 0:
            cands.append({"x": x, "y": (yy[i] + yy[i + 1]) / 2,
                          "interval": interval})
    return cands


def _probe_best(rings, lbound, rbound, htics, weight):
    """probeForBestAnchorPoint (mapshaper-anchor-points.js:96-125)."""
    step = (rbound - lbound) / (htics + 1)
    tics = [lbound + step * i for i in range(1, htics + 1)]
    interval = (rbound - lbound) / htics
    ymin = min(float(np.min(ry)) for _, ry in rings) - 1
    cands = []
    for x in tics:
        cands.extend(_hit_candidates(x, ymin, rings))
    for p in cands:
        p["interval"] *= weight(p["x"], p["y"])
    cands.sort(key=lambda p: -p["interval"])   # stable, like ES2019
    best = None
    for cand in cands:
        if best is not None and best["distance"] > cand["interval"]:
            break
        adj = _adjusted_point(cand["x"], cand["y"], rings, interval,
                              weight)
        if best is None or adj["distance"] > best["distance"]:
            best = adj
    return best


def _adjusted_point(x, y, rings, vstep, weight):
    p = {"x": x, "y": y,
         "distance": _pt_shape_dist(x, y, rings) * weight(x, y)}
    for step in (vstep, -vstep):
        _scan_better(p, rings, step, weight)
    return p


def _scan_better(p, rings, vstep, weight):
    x, y = p["x"], p["y"]
    dmax = p["distance"]
    while True:
        y += vstep
        d = _pt_shape_dist(x, y, rings) * weight(x, y)
        # overcome very small local minima (reference 0.90 rule)
        if d > dmax * 0.90 and _pt_in_polygon(x, y, rings):
            if d > dmax:
                p["distance"] = dmax = d
                p["y"] = y
        else:
            break


def anchor_point(rings):
    """Faithful port of the reference inner-point placement
    (findAnchorPoint, src/points/mapshaper-anchor-points.js:17-77):
    pre-simplify at sqrt(bbox area) * 0.01, probe vertical-ray segment
    midpoints across a centroid-focused x-range, adjust vertically,
    keep the candidate with max centroid-weighted edge distance, then
    refine around it.  Returns (x, y) or None for degenerate input."""
    rings = [(np.asarray(x, dtype=np.float64),
              np.asarray(y, dtype=np.float64)) for x, y in rings
             if len(np.asarray(x))]
    mp = _max_path(rings)
    if mp is None:
        return None
    bw = float(mp[0].max() - mp[0].min())
    bh = float(mp[1].max() - mp[1].min())
    if bw * bh == 0:
        return None
    thresh = np.sqrt(bw * bh) * 0.01
    simple = _simplify_polygon_fast(rings, thresh)
    if simple is None:
        return None
    return _find_anchor2(simple)


def _find_anchor2(rings):
    """findAnchorPoint2 (mapshaper-anchor-points.js:38-77)."""
    mp = _max_path(rings)
    bw = float(mp[0].max() - mp[0].min())
    bh = float(mp[1].max() - mp[1].min())
    cx, cy = _path_centroid(mp[0], mp[1])
    ref_dist = max(bw, bh) / 2
    if ref_dist == 0:
        return (cx, cy)

    def weight(x, y):
        off = np.sqrt((cx - x) ** 2 + (cy - y) ** 2)  # distance2D
        return 1 - min(0.6 * off / ref_dist, 0.25)

    area = planar_ring_area(mp[0], mp[1])
    if len(rings) == 1 and area * 1.2 > bw * bh:
        htics, focus = 5, 0.2
    elif len(rings) == 1 and area * 1.7 > bw * bh:
        htics, focus = 7, 0.4
    else:
        htics, focus = 11, 0.5
    hrange = bw * focus
    lbound = cx - hrange / 2
    rbound = lbound + hrange
    hstep = hrange / htics

    p = _probe_best(rings, lbound, rbound, htics, weight)
    if p is None:
        return (cx, cy)
    p2 = _probe_best(rings, p["x"] - hstep / 2, p["x"] + hstep / 2, 2,
                     weight)
    if p2 is not None and p2["distance"] > p["distance"]:
        p = p2
    return (p["x"], p["y"])


def anchor_points(ds, x_col="ax", y_col="ay"):
    """Layer-model polygon Dataset → anchor point columns."""
    def go(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        axs, ays = [], []
        for row in df.to_dict("records"):
            rx = row["rings_x"] if row["rings_x"] is not None else []
            ry = row["rings_y"] if row["rings_y"] is not None else []
            rings = [(np.asarray(x, float), np.asarray(y, float))
                     for x, y in zip(rx, ry)]
            p = anchor_point(rings)
            axs.append(p[0] if p else np.nan)
            ays.append(p[1] if p else np.nan)
        df[x_col] = axs
        df[y_col] = ays
        return df
    return ds.map_batches(go, batch_format="pandas")


# ---------------------------------------------------------------------------
# antimeridian stitch

def _touches_meridian(x, lon, tol=1e-6):
    return bool(np.any(np.abs(np.asarray(x) - lon) < tol))


def stitch_antimeridian(ds, tol=1e-6):
    """Unwrap polygon features split at ±180: western (-180-touching)
    rings shift +360, the seam edges at x=180 coincide and cancel via
    the dissolve arc-cancellation kernel; output stays in the unwrapped
    frame with a ``wrapped`` marker column (re-normalize downstream if
    a -180..180 frame is required)."""
    from ..topo.build import build_topology
    from ..topo.dissolve import dissolve_shapes

    def go(df: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        for row in df.to_dict("records"):
            rx = row["rings_x"] if row["rings_x"] is not None else []
            ry = row["rings_y"] if row["rings_y"] is not None else []
            east = [i for i, x in enumerate(rx)
                    if _touches_meridian(x, 180.0, tol)]
            west = [i for i, x in enumerate(rx)
                    if _touches_meridian(x, -180.0, tol)]
            row = dict(row)
            if not east or not west:
                row["wrapped"] = False
                out_rows.append(row)
                continue
            feats = []
            for i, (x, y) in enumerate(zip(rx, ry)):
                x = np.asarray(x, dtype=np.float64)
                if i in west:
                    x = x + 360.0
                feats.append([np.stack([x, np.asarray(y, float)], axis=1)])
            arcs, shapes = build_topology(feats)
            rings = dissolve_shapes(shapes, ["s"] * len(shapes),
                                    arcs)["s"] or []
            coords = [arcs.path_coords(r) for r in rings]
            row["rings_x"] = [list(map(float, c[0])) for c in coords]
            row["rings_y"] = [list(map(float, c[1])) for c in coords]
            row["ring_poly"] = [0] * len(coords)
            row["wrapped"] = True
            out_rows.append(row)
        return pd.DataFrame(out_rows)
    return ds.map_batches(go, batch_format="pandas")


def snap_edge_vertices(x, y, e=1e-10):
    """Snap vertices at the antimeridian / poles to lng=-180 (reference
    snapEdgeArcs, src/commands/mapshaper-stitch.js:53-88): lng within e
    of +-180 -> -180; lat within e of a pole -> the pole with
    lng=-180.  Returns (x, y, touched)."""
    x = np.asarray(x, dtype=np.float64).copy()
    y = np.asarray(y, dtype=np.float64).copy()
    on_lng = (x <= -180 + e) | (x >= 180 - e)
    x[on_lng] = -180.0
    at_s = y <= -90 + e
    at_n = y >= 90 - e
    y[at_s] = -90.0
    x[at_s] = -180.0
    y[at_n] = 90.0
    x[at_n] = -180.0
    return x, y, bool(on_lng.any() or at_s.any() or at_n.any())


def stitch_spherical(ds, e=1e-10):
    """Spherical -stitch (reference api.stitch, src/commands/
    mapshaper-stitch.js:11-33): snap edge vertices onto lng=-180 /
    the poles, then re-dissolve each edge-touching feature's rings so
    the coincident edge arcs cancel — removing the antimeridian/pole
    'cuts' of an unprojected (rotated-projection) dataset.  Non-edge
    features pass through untouched."""
    from ..pipelines.overlay import _node_axis_edges
    from ..topo.build import build_topology
    from ..topo.dissolve import dissolve_shapes

    def go(df: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        for row in df.to_dict("records"):
            rx = row["rings_x"] if row["rings_x"] is not None else []
            ry = row["rings_y"] if row["rings_y"] is not None else []
            snapped = [snap_edge_vertices(x, y, e)
                       for x, y in zip(rx, ry)]
            row = dict(row)
            if not any(t for _, _, t in snapped):
                row["stitched"] = False
                out_rows.append(row)
                continue
            feats = [[np.stack([x, y], axis=1)] for x, y, _ in snapped]
            # node the shared -180 edge so both sides' subdivisions
            # match, then melt: coincident opposite edges cancel
            feats = _node_axis_edges(feats)
            arcs, shapes = build_topology(feats)
            rings = dissolve_shapes(shapes, ["s"] * len(shapes),
                                    arcs)["s"] or []
            coords = [arcs.path_coords(r) for r in rings]
            row["rings_x"] = [list(map(float, c[0])) for c in coords]
            row["rings_y"] = [list(map(float, c[1])) for c in coords]
            row["ring_poly"] = [0] * len(coords)
            row["stitched"] = True
            out_rows.append(row)
        return pd.DataFrame(out_rows)
    return ds.map_batches(go, batch_format="pandas")


# ---------------------------------------------------------------------------
# ring-nesting repair

def fix_ring_nesting(ds, drop_same_winding=True):
    """Per-feature ring-nesting repair (reference fixNestingErrors /
    fixNestingErrors2, src/paths/mapshaper-ring-nesting.js:1-50):
    delete rings nested directly inside an enclosing ring with the SAME
    winding direction; flip un-contained CCW (hole-wound) rings to
    outer winding.  Containment = smallest enclosing ring by interior
    point; assumes non-overlapping boundaries (post-dissolve)."""
    from ..geom.kernels import planar_ring_area, points_in_ring

    def fix_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        nx, ny, npl = [], [], []
        for row in df.to_dict("records"):
            rx = [np.asarray(v, float) for v in (row["rings_x"]
                  if row["rings_x"] is not None else [])]
            ry = [np.asarray(v, float) for v in (row["rings_y"]
                  if row["rings_y"] is not None else [])]
            rp = list(row["ring_poly"]) if row["ring_poly"] is not None \
                else [0] * len(rx)
            areas = [planar_ring_area(x, y) for x, y in zip(rx, ry)]

            def container_of(i):
                # smallest |area| ring strictly containing ring i
                px, py = rx[i][0], ry[i][0]
                best, best_a = -1, np.inf
                for j in range(len(rx)):
                    if j == i or abs(areas[j]) <= abs(areas[i]):
                        continue
                    if points_in_ring(np.array([px]), np.array([py]),
                                      rx[j], ry[j])[0]:
                        if abs(areas[j]) < best_a:
                            best, best_a = j, abs(areas[j])
                return best

            keep = []
            for i in range(len(rx)):
                c = container_of(i)
                if drop_same_winding and c >= 0 and \
                        (areas[c] > 0) == (areas[i] > 0):
                    continue  # same chirality as container: invalid
                if areas[i] < 0 and c == -1:
                    # un-contained hole-wound ring: flip to outer
                    rx[i] = rx[i][::-1]
                    ry[i] = ry[i][::-1]
                keep.append(i)
            nx.append([rx[i].tolist() for i in keep])
            ny.append([ry[i].tolist() for i in keep])
            npl.append([rp[i] for i in keep] if len(rp) >= len(rx)
                       else [0] * len(keep))
        df["rings_x"] = nx
        df["rings_y"] = ny
        df["ring_poly"] = npl
        return df
    return ds.map_batches(fix_rows, batch_format="pandas")
