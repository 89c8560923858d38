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


def _presimplify_ring(x, y, thresh):
    z = visvalingam_thresholds(x, y, scaled=True)
    m = z >= thresh * thresh * 0.65 * 0.65  # scaled VW: sqrt(area)*0.65
    m[0] = m[-1] = True
    if m.sum() < 4:
        return x, y
    return x[m], y[m]


def _seg_dist(px, py, x, y):
    """Min distance from point to ring boundary (vectorized over segs)."""
    ax, ay = x[:-1], y[:-1]
    bx, by = x[1:], y[1:]
    dx, dy = bx - ax, by - ay
    ln2 = dx * dx + dy * dy
    t = np.clip(((px - ax) * dx + (py - ay) * dy) /
                np.where(ln2 == 0, 1, ln2), 0, 1)
    cx = ax + t * dx
    cy = ay + t * dy
    return float(np.min(np.hypot(px - cx, py - cy)))


def anchor_point(rings, htics=12):
    """rings: [(x, y), ...] of one polygon (outer first).  Returns
    (x, y) inside, maximizing boundary distance weighted toward the
    centroid."""
    if not rings:
        return None
    # largest |area| ring is the anchor host
    areas = [abs(planar_ring_area(np.asarray(x), np.asarray(y)))
             for x, y in rings]
    ox, oy = rings[int(np.argmax(areas))]
    ox = np.asarray(ox, dtype=np.float64)
    oy = np.asarray(oy, dtype=np.float64)
    bw = ox.max() - ox.min()
    bh = oy.max() - oy.min()
    thresh = np.sqrt(max(bw * bh, 1e-30)) * 0.01
    sx, sy = _presimplify_ring(ox, oy, thresh)
    cx, cy = ring_centroid(sx, sy)
    half_diag = np.hypot(bw, bh) / 2 or 1.0

    best = None
    best_score = -np.inf
    xs = np.linspace(ox.min(), ox.max(), htics + 2)[1:-1]
    ys = np.linspace(oy.min(), oy.max(), htics + 2)[1:-1]
    gx, gy = np.meshgrid(xs, ys)
    gx = gx.ravel()
    gy = gy.ravel()
    ring_list = [(np.asarray(x), np.asarray(y)) for x, y in rings]
    inside = points_in_shape(gx, gy, ring_list)
    for px, py, ok in zip(gx, gy, inside):
        if not ok:
            continue
        d = _seg_dist(px, py, sx, sy)
        w = 1.0 - 0.5 * np.hypot(px - cx, py - cy) / half_diag
        score = d * w
        if score > best_score:
            best_score = score
            best = (float(px), float(py))
    if best is None:  # tiny/degenerate: fall back to centroid of ring
        best = (float(cx), float(cy))
    return best


def anchor_points(ds, x_col="ax", y_col="ay"):
    """Layer-model polygon Dataset → anchor point columns."""
    def go(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        axs, ays = [], []
        for _, row in df.iterrows():
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
        for _, row in df.iterrows():
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
        for _, row in df.iterrows():
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
        for _, row in df.iterrows():
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
